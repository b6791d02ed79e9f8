"""SetCriterion — point-sampled mask classification losses
(reference modeling/criterion.py:90-320).

Static-shape design: targets come padded to N slots with a validity mask; the
matcher returns, per image, the query index assigned to every slot. Matched
pairs are processed as dense (B, N, P) tensors and invalid pairs are masked
out of every sum, reproducing the reference's variable-length concatenation
semantics exactly. DN losses use fixed identity indices per group (reference
:248-266) and are normalized by num_masks * scalar (:263).

All matchings of a step (final + 9 aux layers, main and DN share targets)
are solved in ONE batched LSA call (see matcher.hungarian_assign: on-device
auction on TPU, scipy callback on CPU).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..structures import Targets
from .matcher import HungarianMatcher, hungarian_assign


def sample_mask_points(
    masks: jax.Array,          # (B, M, h, w) float
    qidx: Optional[jax.Array],  # (B, N) int32 or None for identity (M == N)
    coords: jax.Array,         # (B, N, P, 2) in [0, 1], (x, y)
) -> jax.Array:
    """Bilinear point_sample of per-pair masks without materializing the
    gathered (B, N, h, w) intermediate. grid_sample semantics
    (align_corners=False, zero padding), numerically exact.

    TPU gathers are row-count-bound (~7 ns/row regardless of row width,
    PERFORMANCE.md), so the four bilinear taps are packed into ONE 4-wide
    row of a zero-padded 2x2-patch table (same formulation as the MSDA
    packed2x2 engine, ops/ms_deform_attn.py:60-95): 4x fewer gather rows
    forward and 4x fewer scatter rows in the backward. This is what makes
    the reference-exact 'random' point-loss mode trainable at full batch
    (4x1-wide taps measured 22.6 s/step at B=8/512px)."""
    b, m, h, w = masks.shape
    n, p = coords.shape[1], coords.shape[2]

    # the 2x2-patch table is 4x the mask tensor; full-res GT masks at large
    # batch would blow HBM (B=8 x 40 slots x 513^2 x 4 x 4B = 1.3 GB), so
    # tables over ~1 GB keep the 4-separate-taps form (GT rows are a
    # minority of the step's gather volume). Byte-based: a bf16 GT table
    # (EXACT for 0/1 masks — tent weights below stay fp32) halves the size
    # and keeps the 4-wide packed rows.
    if b * m * (h + 1) * (w + 1) * 4 * masks.dtype.itemsize > 2 ** 30:
        return _sample_mask_points_taps(masks, qidx, coords)

    # patch[o, y, x] = [v(y-1,x-1), v(y-1,x), v(y,x-1), v(y,x)] on the
    # zero-padded map: row (y0+1)*(w+1)+(x0+1) holds the taps of base (y0,x0)
    vpad = jnp.pad(masks, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patch = jnp.stack(
        [vpad[:, :, :-1, :-1], vpad[:, :, :-1, 1:],
         vpad[:, :, 1:, :-1], vpad[:, :, 1:, 1:]], axis=-1)
    patch = patch.reshape(b, m * (h + 1) * (w + 1), 4)

    fx = coords[..., 0] * w - 0.5  # (B, N, P)
    fy = coords[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    if qidx is None:
        pair = jnp.arange(m, dtype=jnp.int32)[None, :, None]
    else:
        pair = qidx[:, :, None].astype(jnp.int32)

    bx = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    by = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    idx = (pair * (h + 1) + by) * (w + 1) + bx  # (B, N, P)
    taps = jnp.take_along_axis(
        patch, idx.reshape(b, n * p)[..., None], axis=1,
        mode="promise_in_bounds").reshape(b, n, p, 4)

    # an unclipped base (x0 in [-1, w-1], y0 in [-1, h-1]) reads real pixels
    # or the zero border — exactly grid_sample zero padding; a clipped base
    # (coords outside [0, 1]) would alias, so zero the point instead.
    # Weights stay in the coords dtype (fp32): with an fp32 table this is
    # unchanged, with a bf16 table of 0/1 masks the result is still exact.
    pvalid = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
    pvalid = pvalid.astype(tx.dtype)
    w00 = (1 - tx) * (1 - ty) * pvalid
    w01 = tx * (1 - ty) * pvalid
    w10 = (1 - tx) * ty * pvalid
    w11 = tx * ty * pvalid
    taps = taps.astype(w00.dtype)
    return (taps[..., 0] * w00 + taps[..., 1] * w01
            + taps[..., 2] * w10 + taps[..., 3] * w11)


def _sample_mask_points_taps(masks, qidx, coords):
    """4-separate-1-wide-taps form of sample_mask_points (identical math);
    used when the 2x2-patch table would be too large to materialize."""
    b, m, h, w = masks.shape
    n, p = coords.shape[1], coords.shape[2]
    flat = masks.reshape(b, m * h * w)

    fx = coords[..., 0] * w - 0.5  # (B, N, P)
    fy = coords[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    if qidx is None:
        base = jnp.arange(m, dtype=jnp.int32)[None, :, None] * (h * w)
    else:
        base = qidx[:, :, None].astype(jnp.int32) * (h * w)

    def tap(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        idx = base + iyc * w + ixc  # (B, N, P)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, n * p), axis=1).reshape(b, n, p)
        return jnp.where(valid, vals, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


def sample_points_matmul(masks: jax.Array, coords: jax.Array,
                         pair_chunk: int = 0,
                         dtype=jnp.float32,
                         precision=None) -> jax.Array:
    """Bilinear point_sample of per-pair masks as two tent-matrix
    contractions instead of per-point gathers.

    masks: (P, h, w); coords: (P, pts, 2) in [0, 1] -> (P, pts).

    point[i] = sum_{y,x} Ay[i,y] * mask[y,x] * Ax[i,x], where the tent
    Ax[i,x] = max(0, 1 - |fx_i - x|) is EXACTLY the bilinear weight pair
    (1-tx at x0, tx at x0+1) with grid_sample zero padding (out-of-range
    taps fall off the grid). TPU rationale: XLA's gather moves ~1 row per
    7 ns and its scatter-add transpose ~1 row per 80 ns regardless of width
    (PERFORMANCE.md), so the reference's random-point losses spend seconds
    per step in gathers + scatters; as matmuls both directions run on the
    MXU and the autodiff backward is just the transposed contraction — no
    scatter exists in the program. fp32 HIGHEST precision keeps it
    numerically equivalent to the 4-tap form (~1e-6).

    pair_chunk bounds the materialized tent matrices ((chunk, pts, h+w)
    floats) via lax.map over pair blocks; 0 = no chunking.

    dtype/precision control the tent+contraction arithmetic: the default
    (fp32, HIGHEST) is numerically equivalent to the 4-tap gather form; the
    uncertainty-SELECTION pass may use (bfloat16, default) — ~0.4% value
    error only perturbs the top-k ranking among near-tied uncertainties,
    no worse than the reference's own fp16 AMP forward (SOLVER.AMP
    ENABLED, torch autocast around point_sample/topk).
    """
    p, h, w = masks.shape
    pts = coords.shape[1]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    def block(args):
        m, c = args  # (pc, h, w), (pc, pts, 2)
        m = m.astype(dtype)
        fx = c[..., 0] * w - 0.5
        fy = c[..., 1] * h - 0.5
        ax = jnp.maximum(
            0.0, 1.0 - jnp.abs(fx[..., None] - jnp.arange(w, dtype=jnp.float32))
        ).astype(dtype)
        ay = jnp.maximum(
            0.0, 1.0 - jnp.abs(fy[..., None] - jnp.arange(h, dtype=jnp.float32))
        ).astype(dtype)
        t = jnp.einsum("pyx,pix->piy", m, ax, precision=precision,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("piy,piy->pi", t.astype(dtype), ay,
                          precision=precision,
                          preferred_element_type=jnp.float32)

    if pair_chunk <= 0 or pair_chunk >= p:
        return block((masks, coords))
    nc = -(-p // pair_chunk)
    pad = nc * pair_chunk - p
    mp = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
    cp = jnp.pad(coords, ((0, pad), (0, 0), (0, 0)))
    # checkpoint: lax.map's backward would otherwise SAVE each block's tent
    # matrices (the full (P, pts, h+w) we are chunking to avoid); recompute
    # them instead
    out = jax.lax.map(jax.checkpoint(block),
                      (mp.reshape(nc, pair_chunk, h, w),
                       cp.reshape(nc, pair_chunk, pts, 2)))
    return out.reshape(nc * pair_chunk, pts)[:p]


def dice_loss(point_logits, point_labels, pair_valid, num_masks):
    """Reference dice_loss :21-44 over (B, N, P) pairs with validity mask."""
    inputs = jax.nn.sigmoid(point_logits)
    numerator = 2 * (inputs * point_labels).sum(-1)
    denominator = inputs.sum(-1) + point_labels.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)  # (B, N)
    return jnp.where(pair_valid, loss, 0.0).sum() / num_masks


def sigmoid_ce_loss(point_logits, point_labels, pair_valid, num_masks):
    """Reference sigmoid_ce_loss :47-66."""
    loss = optax_sigmoid_ce(point_logits, point_labels).mean(-1)  # (B, N)
    return jnp.where(pair_valid, loss, 0.0).sum() / num_masks


def optax_sigmoid_ce(logits, labels):
    """binary_cross_entropy_with_logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class SetCriterion:
    def __init__(
        self,
        num_classes: int,
        matcher: HungarianMatcher,
        weight_dict: Dict[str, float],
        eos_coef: float,
        losses: List[str],
        num_points: int,
        oversample_ratio: float,
        importance_sample_ratio: float,
        dn_no_lb: bool = False,
        max_pairs: int = 0,
        point_sample_mode: str = "random",
        point_matmul: bool = True,
    ):
        self.num_classes = num_classes
        self.matcher = matcher
        self.weight_dict = weight_dict
        self.eos_coef = eos_coef
        self.losses = losses
        self.num_points = num_points
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio
        self.dn_no_lb = dn_no_lb
        # Static pair budget for mask losses. The padded-target design makes
        # the dense path sample points for every (image, slot) pair — B*N
        # pairs where the reference samples only the real GTs (~8/image).
        # With max_pairs > 0, valid pairs across the batch are compacted to
        # this many slots before point sampling (exact as long as the batch's
        # valid-pair count fits the budget; overflow pairs are dropped).
        self.max_pairs = max_pairs
        # 'random' = reference-exact continuous points with bilinear taps
        # (per-element gathers; slow on TPU). 'grid' = uncertainty top-k over
        # the prediction grid itself + bernoulli random extras, GT bilinearly
        # resized to the prediction grid once per step — all dense ops, no
        # gathers. Statistically equivalent (the reference's 3x oversampling
        # already exceeds the 1/4-res grid density) but not bit-identical.
        self.point_sample_mode = point_sample_mode
        # pred-side point sampling via tent-matrix matmuls (exact; kills the
        # gather/scatter row costs on TPU — see sample_points_matmul). GT
        # sampling stays on gathers (full-res GT makes the contraction
        # h*w-quadratic).
        self.point_matmul = point_matmul
        self._gt_grid_cache = None

    # ------------------------------------------------------------------
    def loss_labels(self, pred_logits, qidx, labels, valid):
        """Weighted CE with no-object weight eos_coef (reference :127-144).
        qidx: (B, N) matched query per slot; invalid slots dropped."""
        b, q, _ = pred_logits.shape
        target = jnp.full((b, q), self.num_classes, dtype=jnp.int32)
        qsafe = jnp.where(valid, qidx, q)  # out-of-range -> dropped
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], qidx.shape)
        target = target.at[bidx, qsafe].set(labels, mode="drop")

        logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        w = jnp.where(target == self.num_classes, self.eos_coef, 1.0)
        return {"loss_ce": (nll * w).sum() / w.sum()}

    def loss_masks(self, pred_masks, qidx, gt_masks, valid, num_masks, rng):
        """Point-sampled CE + dice with uncertainty-based oversampling
        (reference :146-191, point_rend
        get_uncertain_point_coords_with_randomness). Single-layer view of
        loss_masks_stacked — the __call__ driver batches all layers; this
        stays as the per-layer API (video T-fold override, tests)."""
        return self._loss_masks_compact(
            pred_masks, qidx, gt_masks, valid, num_masks, rng)

    def _loss_masks_compact(self, pred_masks, qidx, gt_masks, valid,
                            num_masks, rng):
        """Single-layer view of the stacked compact loss (L=1).

        Calls SetCriterion.loss_masks_stacked explicitly (not through
        dynamic dispatch): callers such as VideoSetCriterion.loss_masks
        hand in masks ALREADY folded to the 4D image layout, and the
        video loss_masks_stacked override would try to unfold T again."""
        out = SetCriterion.loss_masks_stacked(
            self, pred_masks[None], qidx[None], gt_masks, valid,
            num_masks, rng)
        return {k: v[0] for k, v in out.items()}

    def loss_masks_stacked(self, pred_masks, qidx, gt_masks, valid,
                           num_masks, rng):
        """ALL deep-supervision layers' random-point mask losses in one
        batched program (reference loss_masks :146-191 runs per layer; the
        GT side and the pair compaction are layer-independent, so batching
        the L layers shares them and collapses ~20 chunked sampling loops
        into 3 — the unrolled form executed ~98k HLO events/step, which
        dominated the step on this backend).

        pred_masks: (L, B, Q, h, w); qidx: (L, B, N); gt_masks: (B, M, H, W)
        (M == N or N % M == 0 — DN passes untiled GT); valid: (B, N).
        Returns {"loss_mask": (L,), "loss_dice": (L,)}.

        Stages, all exact w.r.t. the reference's point_rend sampling except
        where noted:
          1. shared compaction of valid (image, slot) pairs into P slots;
          2. uncertainty SELECTION pass over 3x-oversampled random points —
             tent-matmul in bf16 (ranking only; see sample_points_matmul);
          3. exact top-k + random extras (reference
             get_uncertain_point_coords_with_randomness);
          4. GT labels: one shared per-pair 2x2-patch gather table (bf16,
             exact for 0/1 masks), all L layers' coords folded into the
             point dim;
          5. final pred logits: tent-matmul fp32/HIGHEST (exact, and its
             autodiff backward is a matmul — no scatter)."""
        l, b, q, h, w = pred_masks.shape
        n = qidx.shape[2]
        gh, gw = gt_masks.shape[2], gt_masks.shape[3]
        gt_n = gt_masks.shape[1]
        p = min(self.max_pairs, b * n) if self.max_pairs else b * n

        flat_valid = valid.reshape(-1)                        # (B*N,)
        order = jnp.argsort(~flat_valid, stable=True)         # valid first
        sel = order[:p]
        sel_b = (sel // n).astype(jnp.int32)
        sel_n = (sel % n).astype(jnp.int32)
        pair_valid = flat_valid[sel]                          # (P,)
        sel_q = jnp.take_along_axis(
            qidx.reshape(l, b * n), sel[None], axis=1).astype(jnp.int32)
        pred_idx = sel_b[None] * q + sel_q                    # (L, P)

        k1, k2 = jax.random.split(rng)
        num_sampled = int(self.num_points * self.oversample_ratio)
        num_uncertain = int(self.importance_sample_ratio * self.num_points)
        num_random = self.num_points - num_uncertain

        pred_rows = jnp.take_along_axis(
            pred_masks.reshape(l, b * q, h * w), pred_idx[..., None], axis=1)
        pred_rows = pred_rows.reshape(l * p, h, w).astype(jnp.float32)

        coords1 = jax.random.uniform(k1, (l, p, num_sampled, 2))
        if self.point_matmul:
            # ~256 MB of bf16 tents per block
            chunk = max(1, 2 ** 27 // max(1, num_sampled * (h + w)))
            logits1 = sample_points_matmul(
                jax.lax.stop_gradient(pred_rows),
                coords1.reshape(l * p, num_sampled, 2),
                pair_chunk=chunk, dtype=jnp.bfloat16)
        else:
            logits1 = sample_mask_points(
                jax.lax.stop_gradient(pred_rows)[None], None,
                coords1.reshape(1, l * p, num_sampled, 2))[0]
        uncertainty = -jnp.abs(logits1).reshape(l, p, num_sampled)
        _, top = jax.lax.top_k(uncertainty, num_uncertain)
        uncertain_coords = jnp.take_along_axis(coords1, top[..., None], axis=2)
        if num_random > 0:
            rand_coords = jax.random.uniform(k2, (l, p, num_random, 2))
            coords = jnp.concatenate([uncertain_coords, rand_coords], axis=2)
        else:
            coords = uncertain_coords
        coords = jax.lax.stop_gradient(coords)                # (L, P, pts, 2)
        pts = coords.shape[2]

        # GT rows are layer-independent: gather once, sample all L layers'
        # coords against the shared bf16 patch table
        gt_rows = gt_masks.reshape(b * gt_n, gh, gw)[
            sel_b * gt_n + sel_n % gt_n]                      # (P, gh, gw)
        coords_gt = jnp.moveaxis(coords, 0, 1).reshape(1, p, l * pts, 2)
        point_labels = jax.lax.stop_gradient(sample_mask_points(
            gt_rows[None].astype(jnp.bfloat16), None, coords_gt))
        point_labels = jnp.moveaxis(
            point_labels.reshape(p, l, pts), 1, 0)            # (L, P, pts)

        if self.point_matmul:
            chunk2 = max(1, 2 ** 26 // max(1, pts * (h + w)))
            point_logits = sample_points_matmul(
                pred_rows, coords.reshape(l * p, pts, 2),
                pair_chunk=chunk2).reshape(l, p, pts)
        else:
            point_logits = sample_mask_points(
                pred_rows[None], None,
                coords.reshape(1, l * p, pts, 2)).reshape(l, p, pts)

        # per-layer reductions (dice_loss / sigmoid_ce_loss semantics)
        pv = jnp.broadcast_to(pair_valid[None], (l, p))
        inputs = jax.nn.sigmoid(point_logits)
        numer = 2 * (inputs * point_labels).sum(-1)
        denom = inputs.sum(-1) + point_labels.sum(-1)
        dice = 1 - (numer + 1) / (denom + 1)                  # (L, P)
        ce = optax_sigmoid_ce(point_logits, point_labels).mean(-1)
        return {
            "loss_mask": jnp.where(pv, ce, 0.0).sum(-1) / num_masks,
            "loss_dice": jnp.where(pv, dice, 0.0).sum(-1) / num_masks,
        }

    # ------------------------------------------------------------------
    def _make_grid_ctx(self, gt_masks, valid, hw):
        """Compaction + GT resized to the prediction grid, shared across all
        deep-supervision layers (GT side of a pair is layer-independent)."""
        b, n = valid.shape
        h, w = hw
        p = min(self.max_pairs, b * n)
        flat_valid = valid.reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)
        sel = order[:p]
        sel_b = (sel // n).astype(jnp.int32)
        sel_n = (sel % n).astype(jnp.int32)
        pair_valid = flat_valid[sel][None]
        gt_n = gt_masks.shape[1]
        gt_rows = gt_masks.reshape(b * gt_n, *gt_masks.shape[2:])[
            sel_b * gt_n + sel_n % gt_n]                      # (P, H, W)
        from ..utils.interp import resize

        gt_grid = resize(gt_rows.astype(jnp.float32), (h, w), "bilinear")
        return {"sel": sel, "sel_b": sel_b, "pair_valid": pair_valid,
                "gt_grid": gt_grid.reshape(p, h * w)}

    def _loss_masks_grid(self, pred_masks, qidx, ctx, num_masks, rng):
        """Dense grid-point mask losses: uncertainty top-k over the 1/4-res
        prediction grid + bernoulli random extras. No per-point gathers —
        the reference's 3x random oversampling (37632 points) already
        exceeds this grid's density (h*w points), so grid top-k selects from
        strictly finer coverage."""
        b, q, h, w = pred_masks.shape
        p = ctx["sel"].shape[0]
        sel_q = qidx.reshape(-1)[ctx["sel"]].astype(jnp.int32)
        pred_pair = pred_masks.reshape(b * q, h, w)[
            ctx["sel_b"] * q + sel_q]                          # (P, h, w)
        logits = pred_pair.reshape(p, h * w).astype(jnp.float32)

        s = h * w
        num_uncertain = min(int(self.importance_sample_ratio * self.num_points), s)
        num_random = self.num_points - num_uncertain

        unc = -jnp.abs(jax.lax.stop_gradient(logits))
        # only the k-th VALUE is needed (a threshold), not the sorted set; an
        # exact top_k sorts all h*w entries per pair and costs ~170 ms/step
        # at B=8 (TPU profile). Estimate the threshold on a strided subsample
        # instead — the sampler is already stochastic (bernoulli extras), so
        # a threshold within sampling noise of the exact kth is equivalent.
        m = 1024
        if s > 2 * m:
            stride = s // m
            sub = unc[:, :: stride][:, :m]
            ksub = max(1, (num_uncertain * m) // s)
            kth = jax.lax.top_k(sub, ksub)[0][:, -1:]
        else:
            kth = jax.lax.top_k(unc, num_uncertain)[0][:, -1:]
        sel_top = unc >= kth
        rand = jax.random.uniform(rng, logits.shape) < (num_random / s)
        sel_mask = (sel_top | rand).astype(jnp.float32)
        cnt = jnp.maximum(sel_mask.sum(-1), 1.0)               # (P,)

        labels = ctx["gt_grid"]
        bce = optax_sigmoid_ce(logits, labels)
        loss_mask = (bce * sel_mask).sum(-1) / cnt
        sig = jax.nn.sigmoid(logits) * sel_mask
        lab = labels * sel_mask
        dice = 1 - (2 * (sig * lab).sum(-1) + 1) / (sig.sum(-1) + lab.sum(-1) + 1)

        pv = ctx["pair_valid"][0]
        return {
            "loss_mask": jnp.where(pv, loss_mask, 0.0).sum() / num_masks,
            "loss_dice": jnp.where(pv, dice, 0.0).sum() / num_masks,
        }

    # ------------------------------------------------------------------
    def layer_costs(self, outputs: Dict, targets: Targets, rng: jax.Array):
        """(L, B, Q, N) matcher cost stack for all deep-supervision layers —
        one batched LSA input (matcher rngs differ per layer, mirroring the
        reference's independent rand draws per matcher call). Shared by
        __call__ and the host-exact two-phase step (engine/train_step.py
        make_cost_step), which MUST consume rng identically."""
        layer_outputs = outputs["aux_outputs"] + [outputs]
        rng, *mrngs = jax.random.split(rng, len(layer_outputs) + 1)
        costs = jnp.stack([
            self.matcher.cost(o["pred_logits"], o["pred_masks"], targets, r)
            for o, r in zip(layer_outputs, mrngs)
        ])  # (L, B, Q, N)
        return costs, rng

    def __call__(
        self,
        outputs: Dict,
        targets: Targets,
        rng: jax.Array,
        num_masks: Optional[jax.Array] = None,
        assignments: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Returns the full (unweighted) loss dict with reference key names.
        `num_masks` may be supplied pre-psummed by the trainer (reference
        all-reduces it, :235-237). `assignments` (L, B, N) skips the
        in-program matcher — the host-exact two-phase step solves the LSA
        with scipy between the cost and grad passes (the reference's own
        CPU hop; this TPU runtime rejects host callbacks inside jit)."""
        if num_masks is None:
            num_masks = jnp.maximum(targets.valid.sum().astype(jnp.float32), 1.0)

        dn_out = outputs.get("dn_out")
        layer_outputs = outputs["aux_outputs"] + [outputs]

        if assignments is None:
            costs, rng = self.layer_costs(outputs, targets, rng)
            col_valid = jnp.broadcast_to(
                targets.valid[None], (len(layer_outputs),) + targets.valid.shape)
            assignments = hungarian_assign(costs, col_valid=col_valid)  # (L, B, N)
        else:
            # consume rng exactly as layer_costs would, so the downstream
            # point-sampling draws match the single-phase step
            rng = jax.random.split(rng, len(layer_outputs) + 1)[0]

        # DN tiled targets + identity indices (reference :248-258). The
        # decoder may compact the DN block to TPU.DN_MAX_GT slots (targets
        # are valid-prefix); mirror that slice here via dn_args["max_num"].
        if dn_out is not None:
            scalar = dn_out["dn_args"]["scalar"]
            n = dn_out["dn_args"]["max_num"]
            dn_targets = targets
            if n < targets.labels.shape[1]:
                dn_targets = Targets(
                    labels=targets.labels[:, :n], masks=targets.masks[:, :n],
                    boxes=targets.boxes[:, :n], valid=targets.valid[:, :n])
            pad = scalar * n
            b = targets.labels.shape[0]
            dn_labels = jnp.tile(dn_targets.labels, (1, scalar))
            dn_valid = jnp.tile(dn_targets.valid, (1, scalar))
            # compact path indexes GT modulo N — avoid materializing the
            # scalar-times tile of full-res GT masks
            if self.max_pairs and self.max_pairs < b * pad:
                dn_gt_masks = dn_targets.masks
            else:
                dn_gt_masks = jnp.tile(dn_targets.masks, (1, scalar, 1, 1))
            dn_qidx = jnp.broadcast_to(jnp.arange(pad, dtype=jnp.int32)[None], (b, pad))
            dn_num_masks = num_masks * scalar
            dn_layers = dn_out["aux_outputs"] + [dn_out]

        losses: Dict[str, jax.Array] = {}

        use_grid = self.point_sample_mode == "grid" and self.max_pairs > 0
        if use_grid:
            hw = outputs["pred_masks"].shape[-2:]
            main_ctx = self._make_grid_ctx(targets.masks, targets.valid, hw)
            if dn_out is not None:
                # dn_valid slots are groups of n=max_num: sel_n % gt_n must
                # map slot -> GT within the CAPPED set (width n), not the
                # uncapped targets.masks (width MAX_INSTANCES) — with
                # scalar>1 the latter reads padding rows for groups >= 1
                dn_ctx = self._make_grid_ctx(dn_targets.masks, dn_valid, hw)

        num_layers = len(layer_outputs)

        # random mode: ALL layers' mask losses in one stacked batched call
        # (see loss_masks_stacked); grid mode keeps its dense per-layer form
        stacked_main = stacked_dn = None
        if "masks" in self.losses and not use_grid:
            rng, rk, rk_dn = jax.random.split(rng, 3)
            pred_l = jnp.stack([o["pred_masks"] for o in layer_outputs])
            stacked_main = self.loss_masks_stacked(
                pred_l, assignments, targets.masks, targets.valid,
                num_masks, rk)
            if dn_out is not None:
                dn_pred_l = jnp.stack([o["pred_masks"] for o in dn_layers])
                dn_qidx_l = jnp.broadcast_to(
                    dn_qidx[None], (num_layers,) + dn_qidx.shape)
                stacked_dn = self.loss_masks_stacked(
                    dn_pred_l, dn_qidx_l, dn_gt_masks, dn_valid,
                    dn_num_masks, rk_dn)

        def compute(out, qidx, suffix, rng_l, li):
            d = {}
            if "labels" in self.losses:
                d.update(self.loss_labels(
                    out["pred_logits"], qidx, targets.labels, targets.valid))
            if "masks" in self.losses:
                if use_grid:
                    d.update(self._loss_masks_grid(
                        out["pred_masks"], qidx, main_ctx, num_masks, rng_l))
                else:
                    d.update({k: v[li] for k, v in stacked_main.items()})
            return {k + suffix: v for k, v in d.items()}

        def compute_dn(out, suffix, rng_l, li):
            d = {}
            if "labels" in self.losses:
                d.update(self.loss_labels(out["pred_logits"], dn_qidx, dn_labels, dn_valid))
            if "masks" in self.losses:
                if use_grid:
                    d.update(self._loss_masks_grid(
                        out["pred_masks"], dn_qidx, dn_ctx, dn_num_masks, rng_l))
                else:
                    d.update({k: v[li] for k, v in stacked_dn.items()})
            return {k + "_dn" + suffix: v for k, v in d.items()}

        rngs = jax.random.split(rng, 2 * num_layers)
        for li, out in enumerate(layer_outputs):
            last = li == num_layers - 1
            suffix = "" if last else f"_{li}"
            losses.update(compute(out, assignments[li], suffix, rngs[2 * li], li))
            if dn_out is not None:
                losses.update(compute_dn(dn_layers[li], suffix, rngs[2 * li + 1], li))
            else:
                zero = jnp.zeros((), jnp.float32)
                for k in ("loss_mask_dn", "loss_dice_dn", "loss_ce_dn"):
                    losses[k + suffix] = zero

        if self.dn_no_lb:
            losses = {k: v for k, v in losses.items() if not k.startswith("loss_ce_dn")}
        return losses

    def weighted_total(self, losses: Dict[str, jax.Array]) -> jax.Array:
        """Apply weight_dict and sum (reference maskformer_model.py:226-231)."""
        total = jnp.zeros((), jnp.float32)
        for k, v in losses.items():
            if k in self.weight_dict:
                total = total + v * self.weight_dict[k]
        return total


def build_criterion(cfg) -> SetCriterion:
    """Reference MaskFormer.from_config :116-146."""
    class_weight = cfg.MODEL.MASK_FORMER.CLASS_WEIGHT
    dice_weight = cfg.MODEL.MASK_FORMER.DICE_WEIGHT
    mask_weight = cfg.MODEL.MASK_FORMER.MASK_WEIGHT
    matcher = HungarianMatcher(
        cost_class=class_weight, cost_mask=mask_weight, cost_dice=dice_weight,
        num_points=cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS)
    weight_dict = {"loss_ce": class_weight, "loss_mask": mask_weight,
                   "loss_dice": dice_weight,
                   "loss_ce_dn": class_weight, "loss_mask_dn": mask_weight,
                   "loss_dice_dn": dice_weight}
    if cfg.MODEL.MASK_FORMER.DEEP_SUPERVISION:
        aux = {}
        for i in range(cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1):
            aux.update({k + f"_{i}": v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    return SetCriterion(
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        matcher=matcher,
        weight_dict=weight_dict,
        eos_coef=cfg.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT,
        losses=["labels", "masks"],
        num_points=cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS,
        oversample_ratio=cfg.MODEL.MASK_FORMER.OVERSAMPLE_RATIO,
        importance_sample_ratio=cfg.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO,
        dn_no_lb=cfg.MODEL.MASK_FORMER.DN_NO_LB,
        max_pairs=cfg.TPU.MAX_PAIRS,
        point_sample_mode=cfg.TPU.POINT_SAMPLE_MODE,
        point_matmul=cfg.TPU.POINT_MATMUL_SAMPLING,
    )
