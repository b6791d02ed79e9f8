from .cfg import CfgNode
from .defaults import (
    get_cfg,
    add_deeplab_config,
    add_maskformer2_config,
    add_maskformer2_video_config,
)

__all__ = [
    "CfgNode",
    "get_cfg",
    "add_deeplab_config",
    "add_maskformer2_config",
    "add_maskformer2_video_config",
]
