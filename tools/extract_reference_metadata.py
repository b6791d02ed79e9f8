#!/usr/bin/env python
"""Extract dataset category tables (names / ids / isthing / colors) from the
reference registration modules into JSON data files.

These tables are dataset facts (ADE20K-full 847 names, Mapillary Vistas 65
classes, COCO-stuff 171, ...), not code: the reference inlines them as Python
literals (e.g. register_ade20k_full.py), we carry them as data under
mp_former_tpu/data/datasets/metadata/ and load them at registration time.

Usage: python tools/extract_reference_metadata.py [--reference /root/reference]
"""

import argparse
import ast
import json
import os

TABLES = {
    # output json: (reference file, variable name)
    "ade20k_full_categories.json": (
        "mask2former/data/datasets/register_ade20k_full.py",
        "ADE20K_SEM_SEG_FULL_CATEGORIES"),
    "ade20k_150_categories.json": (
        "mask2former/data/datasets/register_ade20k_panoptic.py",
        "ADE20K_150_CATEGORIES"),
    "ade20k_instance_categories.json": (
        "mask2former/data/datasets/register_ade20k_instance.py",
        "ADE_CATEGORIES"),
    "coco_stuff_171_categories.json": (
        "mask2former/data/datasets/register_coco_stuff_10k.py",
        "COCO_CATEGORIES"),
    "mapillary_vistas_sem_seg_categories.json": (
        "mask2former/data/datasets/register_mapillary_vistas.py",
        "MAPILLARY_VISTAS_SEM_SEG_CATEGORIES"),
    "mapillary_vistas_panoptic_categories.json": (
        "mask2former/data/datasets/register_mapillary_vistas_panoptic.py",
        "MAPILLARY_VISTAS_SEM_SEG_CATEGORIES"),
}


def extract_assignment(path: str, var: str):
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == var:
                    return ast.literal_eval(node.value)
    raise KeyError(f"{var} not found in {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..",
                             "mp_former_tpu/data/datasets/metadata"))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for out_name, (rel, var) in TABLES.items():
        data = extract_assignment(os.path.join(args.reference, rel), var)
        out_path = os.path.join(args.out, out_name)
        with open(out_path, "w") as f:
            json.dump(data, f, separators=(",", ":"))
        print(f"{out_path}: {len(data)} entries")


if __name__ == "__main__":
    main()
