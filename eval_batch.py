#!/usr/bin/env python
"""Evaluate every checkpoint in a directory (reference eval_batch.py:1-12)."""

import argparse
import os
import subprocess
import sys

p = argparse.ArgumentParser()
p.add_argument("ckpt_dir")
p.add_argument("--config-file",
               default="configs/coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml")
args, extra = p.parse_known_args()

for name in sorted(os.listdir(args.ckpt_dir)):
    if not (name.endswith(".pth") or name.endswith(".pkl")):
        continue
    path = os.path.join(args.ckpt_dir, name)
    print(f"=== evaluating {path} ===", flush=True)
    subprocess.run(
        [sys.executable, "train_net.py", "--config-file", args.config_file,
         "--eval-only", "MODEL.WEIGHTS", path] + extra, check=False)
