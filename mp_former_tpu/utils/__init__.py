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
