"""Device mesh + sharding helpers.

The reference's distribution story is data parallelism via torch DDP/NCCL
(SURVEY.md §2.8). TPU-native equivalent: one `data` mesh axis over ICI/DCN,
params replicated, batch sharded on axis 0, gradients reduced by GSPMD.
`psum(num_masks)` replaces the reference's all_reduce (criterion.py:235-237);
eval prediction gathering uses jax.experimental.multihost_utils when
multi-process.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(cfg=None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(cfg.TPU.MESH_SHAPE) if cfg is not None else [-1]
    axes = list(cfg.TPU.MESH_AXES) if cfg is not None else ["data"]
    n = len(devices)
    if shape.count(-1) == 1:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    want = int(np.prod(shape))
    if want > n:
        raise ValueError(
            f"TPU.MESH_SHAPE {shape} needs {want} devices but only {n} are "
            f"visible ({[str(d) for d in devices]}). On CPU, set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N to create "
            "virtual devices.")
    if want < n:
        devices = devices[:want]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def maybe_constrain(x: jax.Array, *spec) -> jax.Array:
    """`with_sharding_constraint(x, P(*spec))` when traced under an active
    mesh whose named axes cover every non-None entry of `spec` with size > 1;
    identity otherwise (single device, no mesh context, or axis absent).

    Lets modules annotate SPMD layouts (e.g. the token-sharded encoder,
    TPU.SHARD_TOKENS) without threading a mesh handle through flax — the
    ambient `jax.set_mesh` context decides whether the annotation is live."""
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 — older/newer API drift: act as identity
        return x
    if m is None or getattr(m, "empty", False):
        return x
    shape = dict(m.shape)
    axes = [s for s in spec if s is not None]
    if not axes or any(shape.get(a, 1) <= 1 for a in axes):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def constrain_replicated(x: jax.Array) -> jax.Array:
    """Pin `x` fully replicated when traced under an active multi-device
    mesh; identity otherwise.

    Used where a small producer feeds a sharded consumer through a
    shape-changing op (e.g. the pixel decoder's input projections ahead of
    the token-sharded encoder flatten): without the pin, GSPMD back-propagates
    the consumer's sharding through the reshape, picks a conflicting tiling
    for the producer, and resolves the mismatch with an involuntary full
    rematerialization (replicate-then-repartition). Pinning the producer
    replicated makes the forward reshard an explicit cheap slice."""
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 — API drift: act as identity
        return x
    if m is None or getattr(m, "empty", False):
        return x
    if all(v <= 1 for v in dict(m.shape).values()):
        return x
    return jax.lax.with_sharding_constraint(x, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
