"""Data layer. Importing registers dataset mappers and builtin datasets
(reference mask2former/__init__.py:2,9-19)."""

from .dataset_mappers import coco_instance_new_baseline  # noqa: F401
from .dataset_mappers import mask_former_mappers  # noqa: F401
from . import catalog  # noqa: F401
