"""YouTubeVIS dataset loading + clip mapper (reference
mask2former_video/data_video/{datasets/ytvis.py,dataset_mapper.py}).

No pycocotools/ytvos API in the image: the COCO-style YTVIS json is parsed
directly. The clip mapper samples SAMPLING_FRAME_NUM frames within
+-SAMPLING_FRAME_RANGE of a random reference frame (dataset_mapper.py:114)
and applies per-clip consistent flip/resize.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.transforms import (apply_record_to_image, polygons_to_bitmask,
                               resize_shortest_edge)


def load_ytvis_json(json_file: str, image_root: str, dataset_name=None) -> List[dict]:
    with open(json_file) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    if dataset_name:
        MetadataCatalog.get(dataset_name).set(
            thing_classes=[c["name"] for c in cats],
            thing_dataset_id_to_contiguous_id=id_map)
    anns_by_vid: Dict[int, List[dict]] = {}
    for a in data.get("annotations", []):
        anns_by_vid.setdefault(a["video_id"], []).append(a)
    records = []
    for v in data["videos"]:
        rec = {
            "video_id": v["id"],
            "file_names": [os.path.join(image_root, f) for f in v["file_names"]],
            "height": v["height"],
            "width": v["width"],
            "length": v["length"],
            "annotations": [
                {
                    "id": a["id"],
                    "category_id": id_map[a["category_id"]],
                    "segmentations": a.get("segmentations"),
                    "iscrowd": a.get("iscrowd", 0),
                    "areas": a.get("areas"),
                }
                for a in anns_by_vid.get(v["id"], [])
            ],
        }
        records.append(rec)
    return records


def register_ytvis_instances(name: str, json_file: str, image_root: str):
    DatasetCatalog.register(name, lambda: load_ytvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="ytvis")


def register_all_ytvis(root: Optional[str] = None):
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    for name, (json_rel, img_rel) in {
        "ytvis_2019_train": ("ytvis_2019/train.json", "ytvis_2019/train/JPEGImages"),
        "ytvis_2019_val": ("ytvis_2019/valid.json", "ytvis_2019/valid/JPEGImages"),
        "ytvis_2021_train": ("ytvis_2021/train.json", "ytvis_2021/train/JPEGImages"),
        "ytvis_2021_val": ("ytvis_2021/valid.json", "ytvis_2021/valid/JPEGImages"),
    }.items():
        if name not in DatasetCatalog:
            register_ytvis_instances(
                name, os.path.join(root, json_rel), os.path.join(root, img_rel))


def _decode_compressed_counts(s) -> List[int]:
    """pycocotools rleFrString: 6-bit chunks (ASCII offset 48), sign
    extension on the 0x10 bit, counts delta-coded against counts[i-2]
    from the 4th element on."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _seg_to_mask(seg, h, w) -> Optional[np.ndarray]:
    if seg is None:
        return None
    if isinstance(seg, list):
        return polygons_to_bitmask([np.asarray(p) for p in seg], h, w)
    if isinstance(seg, dict) and seg.get("counts") is not None:
        counts = seg["counts"]
        if isinstance(counts, (str, bytes)):  # compressed RLE
            counts = _decode_compressed_counts(counts)
        mh, mw = seg["size"]
        flat = np.zeros(mh * mw, np.uint8)
        pos, val = 0, 0
        for c in counts:
            flat[pos:pos + c] = val
            pos += c
            val = 1 - val
        return flat.reshape(mw, mh).T.astype(bool)
    return None


class YTVISDatasetMapper:
    """Train-time clip mapper -> static-shape video sample."""

    def __init__(self, cfg, is_train=True, max_instances: int = 40):
        self.is_train = is_train
        self.num_frames = cfg.INPUT.SAMPLING_FRAME_NUM
        self.frame_range = cfg.INPUT.SAMPLING_FRAME_RANGE
        self.shuffle = cfg.INPUT.SAMPLING_FRAME_SHUFFLE
        self.min_sizes = list(cfg.INPUT.MIN_SIZE_TRAIN)
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        self.max_instances = max_instances
        self.size_div = 32

    def __call__(self, record: dict, rng: np.random.RandomState) -> Optional[dict]:
        length = record["length"]
        ref = rng.randint(length)
        lo = max(0, ref - self.frame_range)
        hi = min(length, ref + self.frame_range + 1)
        pool = [i for i in range(lo, hi) if i != ref]
        if not pool:  # length-1 video: duplicate the only frame
            pool = [ref]
        picks = sorted([ref] + list(rng.choice(
            pool, self.num_frames - 1, replace=len(pool) < self.num_frames - 1)))
        if self.shuffle:
            rng.shuffle(picks)

        h, w = record["height"], record["width"]
        rec = resize_shortest_edge(rng, h, w, self.min_sizes, self.max_size,
                                   flip=True)
        # static canvas across the dataset so clips batch without recompiles
        d = self.size_div
        cap_short = (max(self.min_sizes) + d - 1) // d * d
        cap_long = (self.max_size + d - 1) // d * d
        if w >= h:
            ph, pw = cap_short, cap_long
        else:
            ph, pw = cap_long, cap_short
        ph = max(ph, (rec.out_h + d - 1) // d * d)
        pw = max(pw, (rec.out_w + d - 1) // d * d)

        frames = np.zeros((self.num_frames, ph, pw, 3), np.uint8)
        n_cap = self.max_instances
        masks = np.zeros((n_cap, self.num_frames, ph, pw), bool)
        labels = np.zeros((n_cap,), np.int32)
        valid = np.zeros((n_cap,), bool)

        annos = [a for a in record["annotations"] if not a.get("iscrowd", 0)]
        for fi, frame_idx in enumerate(picks):
            img = cv2.imread(record["file_names"][frame_idx], cv2.IMREAD_COLOR)
            if img is None:
                return None
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            out = apply_record_to_image(img, rec, pad_value=128.0)
            frames[fi, : out.shape[0], : out.shape[1]] = out
            for ai, a in enumerate(annos[:n_cap]):
                seg = a["segmentations"][frame_idx] if a.get("segmentations") else None
                m = _seg_to_mask(seg, h, w)
                if m is None:
                    continue
                from ..data.dataset_mappers.coco_instance_new_baseline import \
                    _transform_bitmask
                tm = _transform_bitmask(m, rec)
                masks[ai, fi, : tm.shape[0], : tm.shape[1]] = tm
                labels[ai] = a["category_id"]
        valid[: min(len(annos), n_cap)] = [
            masks[i].any() for i in range(min(len(annos), n_cap))]
        return {
            "image": frames,
            "labels": labels,
            "masks": masks,
            "valid": valid,
            "video_id": record["video_id"],
            "height": h,
            "width": w,
        }


class CocoClipDatasetMapper:
    """COCO image -> pseudo video clip for VIS pretraining (reference
    data_video/dataset_mapper.py:272 CocoClipDatasetMapper): the image is
    repeated SAMPLING_FRAME_NUM times with a per-clip consistent transform."""

    def __init__(self, cfg, is_train=True, max_instances: int = 40):
        from ..data.dataset_mappers.coco_instance_new_baseline import \
            COCOInstanceNewBaselineDatasetMapper

        self.num_frames = cfg.INPUT.SAMPLING_FRAME_NUM
        self._image_mapper = COCOInstanceNewBaselineDatasetMapper(
            cfg, is_train=is_train, max_instances=max_instances)

    def __call__(self, record: dict, rng: np.random.RandomState):
        s = self._image_mapper(record, rng)
        if s is None:
            return None
        t = self.num_frames
        return {
            "image": np.repeat(s["image"][None], t, axis=0),
            "labels": s["labels"],
            "masks": np.repeat(s["masks"][:, None], t, axis=1),
            "valid": s["valid"],
            "video_id": record.get("image_id", -1),
            "height": s["height"],
            "width": s["width"],
        }
