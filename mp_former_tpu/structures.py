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
