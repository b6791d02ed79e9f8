"""Hungarian matcher (reference modeling/matcher.py:70-189).

Costs are computed on device as MXU matmuls over 12544 shared random points
(reference :120-132). The LSAP solve is batched over (layers x batch) and
runs either fully on device (epsilon-scaling auction, ops/auction_lsa.py —
required on this TPU runtime, which rejects host callbacks) or as one scipy
host callback on CPU backends (the reference's own device->host hop,
:149-151). Static shapes: targets are padded to N slots with a validity
mask; invalid columns cost just above the worst real cost, and the returned
assignment is a permutation so valid/invalid rows never collide.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ..structures import Targets
from ..utils.interp import point_sample

_INVALID_COST = 1e6
_POOL = None  # created lazily: only the CPU scipy path ever uses it
_POOL_LOCK = threading.Lock()


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """cost: (M, Q, N) -> src_of_tgt (M, N) int32: query index assigned to
    each target column."""
    global _POOL
    if _POOL is None:
        # shard_map pure_callbacks can hit this concurrently from several
        # device threads; without the lock two pools get built, one leaked
        with _POOL_LOCK:
            if _POOL is None:
                _POOL = ThreadPoolExecutor(max_workers=8)
    cost = np.asarray(cost, dtype=np.float64)
    m, q, n = cost.shape
    out = np.zeros((m, n), dtype=np.int32)

    def solve(i):
        rows, cols = scipy.optimize.linear_sum_assignment(cost[i])
        res = np.zeros((n,), dtype=np.int32)
        res[cols] = rows
        return i, res

    for i, res in _POOL.map(solve, range(m)):
        out[i] = res
    return out


def fill_invalid_columns(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Replace non-finite entries and invalid target columns with a cost just
    ABOVE the worst real cost. A huge sentinel (1e6) would blow up the cost
    range and compress real cost differences below the on-device auction's
    epsilon/tie-break noise, making assignments effectively random.
    cost: (B, Q, N); valid: (B, N)."""
    cost = jnp.where(jnp.isfinite(cost), cost, _INVALID_COST)
    ceiling = jnp.max(jnp.where(valid[:, None, :], cost, -jnp.inf),
                      axis=(1, 2), keepdims=True)
    ceiling = jnp.where(jnp.isfinite(ceiling), ceiling, 0.0) + 1.0
    return jnp.where(valid[:, None, :], cost, ceiling)


def hungarian_assign(cost: jax.Array, impl: str = "auto",
                     col_valid: jax.Array | None = None) -> jax.Array:
    """cost: (..., Q, N) -> (..., N) int32 assignment.

    impl='scipy': host callback (exact, mirrors the reference's CPU hop) —
    only usable on backends with host-callback support (CPU; NOT this TPU
    runtime, axon_pjrt rejects send/recv). impl='auction': on-device
    epsilon-scaling auction (ops/auction_lsa.py). 'auto' picks scipy on the
    CPU backend and auction elsewhere."""
    import os

    if impl == "auto":
        impl = os.environ.get("MPFORMER_LSA", "")
        if not impl:
            impl = "scipy" if jax.default_backend() == "cpu" else "auction"
    if impl not in ("auction", "scipy"):
        raise ValueError(
            f"unknown LSA impl {impl!r} (MPFORMER_LSA): use 'auction' or "
            "'scipy' — silently falling through to the scipy host callback "
            "would crash on TPU runtimes without host-callback support")
    if impl == "auction":
        from ..ops.auction_lsa import auction_assign

        return auction_assign(jax.lax.stop_gradient(cost), col_valid=col_valid)
    cost = jax.lax.stop_gradient(cost)
    q, n = cost.shape[-2:]

    def _solve(c):
        lead = c.shape[:-2]
        flat = c.reshape((-1, q, n))
        out = jax.pure_callback(
            _lsa_host,
            jax.ShapeDtypeStruct((flat.shape[0], n), jnp.int32),
            flat,
        )
        return out.reshape(lead + (n,))

    # A bare pure_callback materializes its result on device 0
    # ({maximal device=0}); under a data-parallel mesh the partitioner then
    # involuntarily replicates it (SPMD "full rematerialization" warning).
    # Run the callback per shard instead: each device solves its local batch
    # slab and the result is born with the batch sharding. Dim -3 is the
    # batch dim both for (B, Q, N) and for the criterion's stacked
    # (L, B, Q, N) call.
    mesh = jax.sharding.get_abstract_mesh()
    if (not mesh.empty and "data" in mesh.axis_names and cost.ndim >= 3
            and cost.shape[-3] % mesh.shape["data"] == 0):
        P = jax.sharding.PartitionSpec
        pad = [None] * (cost.ndim - 3)
        return jax.shard_map(
            _solve, mesh=mesh,
            in_specs=P(*(pad + ["data", None, None])),
            out_specs=P(*(pad + ["data", None])),
            check_vma=False,
        )(cost)
    return _solve(cost)


def batch_dice_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """(Q, P) logits x (N, P) binary -> (Q, N) (reference batch_dice_loss :17-31)."""
    inputs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.einsum("...qp,...np->...qn", inputs, targets)
    denominator = inputs.sum(-1)[..., :, None] + targets.sum(-1)[..., None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def batch_sigmoid_ce_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """(Q, P) logits x (N, P) binary -> (Q, N) (reference :39-62)."""
    p = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)  # BCE(x, 1)
    neg = jax.nn.softplus(inputs)   # BCE(x, 0)
    loss = jnp.einsum("...qp,...np->...qn", pos, targets) + jnp.einsum(
        "...qp,...np->...qn", neg, 1 - targets)
    return loss / p


def match_cost_matrix(
    pred_logits: jax.Array,   # (B, Q, K+1)
    pred_masks: jax.Array,    # (B, Q, h, w) logits
    targets: Targets,
    num_points: int,
    cost_class: float,
    cost_mask: float,
    cost_dice: float,
    rng: jax.Array,
) -> jax.Array:
    """(B, Q, N) matching cost; invalid target columns = large constant."""
    b, q = pred_logits.shape[:2]
    n = targets.labels.shape[1]

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    # cost_class[b, :, j] = -prob[b, :, labels[b, j]]
    cc = -jnp.take_along_axis(prob, targets.labels[:, None, :], axis=-1)  # (B, Q, N)

    # shared random points per image (reference :120)
    coords = jax.random.uniform(rng, (b, num_points, 2))
    # sample pred masks: (B, h, w, Q) channels-last -> (B, P, Q)
    out_pts = point_sample(
        jnp.moveaxis(pred_masks.astype(jnp.float32), 1, -1), coords)
    out_pts = jnp.moveaxis(out_pts, -1, 1)  # (B, Q, P)
    tgt_pts = point_sample(
        jnp.moveaxis(targets.masks.astype(jnp.float32), 1, -1), coords)
    tgt_pts = jnp.moveaxis(tgt_pts, -1, 1)  # (B, N, P)

    cm = batch_sigmoid_ce_cost(out_pts, tgt_pts)
    cd = batch_dice_cost(out_pts, tgt_pts)
    cost = cost_mask * cm + cost_class * cc + cost_dice * cd
    return fill_invalid_columns(cost, targets.valid)


class HungarianMatcher:
    """Config-holding wrapper (reference HungarianMatcher :70-110)."""

    def __init__(self, cost_class=1.0, cost_mask=1.0, cost_dice=1.0, num_points=0):
        assert cost_class != 0 or cost_mask != 0 or cost_dice != 0
        self.cost_class = cost_class
        self.cost_mask = cost_mask
        self.cost_dice = cost_dice
        self.num_points = num_points

    def cost(self, pred_logits, pred_masks, targets: Targets, rng) -> jax.Array:
        return match_cost_matrix(
            pred_logits, pred_masks, targets, self.num_points,
            self.cost_class, self.cost_mask, self.cost_dice, rng)

    def __call__(self, pred_logits, pred_masks, targets: Targets, rng) -> jax.Array:
        """Returns (B, N) int32: query index matched to each target slot."""
        return hungarian_assign(
            self.cost(pred_logits, pred_masks, targets, rng),
            col_valid=targets.valid)
