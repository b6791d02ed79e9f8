"""MP-Former TPU — a TPU-native JAX segmentation framework with the full
capabilities of IDEA-Research/MP-Former (Mask2Former + mask-piloted training).

Public API mirrors the reference's import surface
(reference mask2former/__init__.py):

    from mp_former_tpu.config import get_cfg, add_maskformer2_config
    from mp_former_tpu.models import build_model
    from mp_former_tpu import data  # registers mappers + datasets
"""

__version__ = "0.1.0"

from .structures import DNArgs, Targets  # noqa: F401
