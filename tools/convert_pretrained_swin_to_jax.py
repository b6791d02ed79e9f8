#!/usr/bin/env python
"""Convert an official Swin checkpoint to our flax param layout
(reference tools/convert-pretrained-swin-model-to-d2.py role).

Usage: python tools/convert_pretrained_swin_to_jax.py swin.pth out.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()

    from mp_former_tpu.engine.checkpoint_import import load_state_dict
    from mp_former_tpu.engine.convert import swin_params_from_torch

    sd = load_state_dict(args.src)
    params = swin_params_from_torch(sd)
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(params)
    np.savez(args.dst, **flat)
    print(f"wrote {len(flat)} arrays -> {args.dst}")


if __name__ == "__main__":
    main()
