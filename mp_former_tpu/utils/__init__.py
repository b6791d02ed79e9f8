from .registry import (
    Registry,
    META_ARCH_REGISTRY,
    BACKBONE_REGISTRY,
    SEM_SEG_HEADS_REGISTRY,
    PIXEL_DECODER_REGISTRY,
    TRANSFORMER_DECODER_REGISTRY,
    DATASET_MAPPER_REGISTRY,
)
from .shape_spec import ShapeSpec
from .interp import resize, resize_nhwc, grid_sample, point_sample
from .boxes import box_xyxy_to_cxcywh, box_cxcywh_to_xyxy, masks_to_boxes


def compute_dtype(cfg):
    """cfg.TPU.COMPUTE_DTYPE -> jnp dtype (bf16 AMP-equivalent switch)."""
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
