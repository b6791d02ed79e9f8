"""Builtin dataset registrations (reference data/datasets/__init__.py:2-10).

Registers the standard d2 dataset layout rooted at $DETECTRON2_DATASETS.
Heavier per-dataset class tables live in their own modules.
"""

import os

from .coco import register_all_coco
from .register_all import register_all, register_more

_root = os.environ.get("DETECTRON2_DATASETS", "datasets")
register_all_coco(_root)
register_all(_root)
register_more(_root)
