"""Model components. Importing this package registers every component
(reference mask2former/modeling/__init__.py:2-6 equivalent)."""

from .backbone import resnet, swin  # noqa: F401
from .pixel_decoder import msdeformattn, fpn  # noqa: F401
from .transformer_decoder import mask2former_decoder  # noqa: F401
from .transformer_decoder import maskformer_transformer_decoder  # noqa: F401
from .meta_arch import mask_former_head, maskformer, per_pixel_baseline  # noqa: F401

from ..utils.registry import META_ARCH_REGISTRY


def build_model(cfg):
    """Registry-driven model construction (d2 build_model equivalent)."""
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE).from_config(cfg)
