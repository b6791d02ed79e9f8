"""Core data structures.

The reference passes per-image python dicts with variable-length tensors
(`targets[i]['labels'/'masks'/'boxes']`, reference maskformer_model.py:281-299).
Under jit everything must be static-shape, so targets are padded to a fixed
instance cap with a validity mask (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Targets(NamedTuple):
    """Padded ground-truth for a batch.

    labels: (B, N) int32          class ids (junk where invalid)
    masks:  (B, N, H, W) bool     GT bitmasks at padded-image resolution
    boxes:  (B, N, 4) float32     cxcywh, normalized (reference :295)
    valid:  (B, N) bool           which instance slots are real
    """

    labels: jax.Array
    masks: jax.Array
    boxes: jax.Array
    valid: jax.Array

    @property
    def num_instances(self) -> int:
        return self.labels.shape[1]


class DNArgs(NamedTuple):
    """Mask-piloted (DN) training inputs (reference maskformer_model.py:221,
    dn_args={'tgt', 'scalar', 'noise_scale'}). scalar/noise_scale are static.

    groups: pre-divided DN group count for the NUM_DN >= 100 convention
    (reference mask2former_transformer_decoder.py:973-974 divides the query
    budget by the BATCH max GT count — a host-side value under jit; see
    engine.train_step.compute_dn_groups). None = decoder falls back to
    dividing by its static instance cap.

    batch_max: the batch max GT count itself (same host-side source); under
    the budget convention the decoder compacts the DN block to
    groups * batch_max (~the budget) instead of groups * static-cap."""

    targets: Targets
    scalar: int
    noise_scale: float
    groups: Optional[int] = None
    batch_max: Optional[int] = None


# -- compact host->device transfer of GT masks ------------------------------
# On this TPU runtime every host->device transfer's staging buffer is
# retained by the client for the process lifetime (measured: trainer RSS
# grows by exactly the per-step transfer volume — 130 GB host OOM on a
# 3000-iter full-res-GT run). Shipping bool bitmasks 8-packed (and images
# as uint8) cuts the leak and the host-link bytes 4-8x; the jitted step
# unpacks on device (a few VPU ops). numpy packbits/unpack here are
# bit-order 'big' (bit 7 of byte 0 = first mask column).


def pack_bool_masks(arr):
    """Host-side: bool (..., W) -> uint8 (..., W//8) when W % 8 == 0,
    otherwise returned unchanged (the unpack rule reconstructs W = 8 *
    packed_W, so ragged widths must not be packed)."""
    import numpy as np

    if arr.dtype == bool and arr.shape[-1] % 8 == 0:
        return np.packbits(arr, axis=-1)
    return arr


def unpack_bitmask(m: jax.Array) -> jax.Array:
    """Device-side inverse of pack_bool_masks: uint8 (..., P) -> bool
    (..., 8P)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (m[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(m.shape[:-1] + (m.shape[-1] * 8,)).astype(bool)


def pack_bitmask_device(b: jax.Array) -> jax.Array:
    """Device-side inverse-direction packer: bool (..., W) -> uint8
    (..., ceil(W/8)), zero-padded, bit-order 'big' — the exact layout
    `np.unpackbits(..., axis=-1, count=W)` restores on host. Used to ship
    eval predictions device->host 8x smaller (the d2h twin of
    pack_bool_masks; this runtime also retains d2h staging buffers)."""
    pad = (-b.shape[-1]) % 8
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    bits = b.reshape(b.shape[:-1] + (b.shape[-1] // 8, 8)).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_batch_masks(batch):
    """If the batch ships bit-packed GT masks (uint8), restore the bool
    layout the model/criterion expect. Bool masks pass through untouched,
    so manually built batches (tests, dryrun) are unaffected."""
    m = batch.targets.masks
    if m.dtype == jnp.uint8:
        return batch._replace(
            targets=batch.targets._replace(masks=unpack_bitmask(m)))
    return batch
