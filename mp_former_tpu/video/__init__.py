"""Video instance segmentation stack (reference mask2former_video/).

Importing registers VideoMaskFormer and the temporal decoder."""

from . import video_decoder, video_maskformer  # noqa: F401
from .video_maskformer import VideoTargets  # noqa: F401
