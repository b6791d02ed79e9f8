#!/usr/bin/env python
"""Model analysis: parameter counts and XLA-estimated FLOPs
(reference tools/analyze_model.py via fvcore; here via jax cost analysis).

Usage: python tools/analyze_model.py --config-file <yaml> [--tasks flop param] \
    [--image-size 1024] [opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--tasks", nargs="+", default=["flop", "param", "structure"])
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                      get_cfg)
    from mp_former_tpu.models import build_model

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    model = build_model(cfg)

    s = args.image_size
    img = jnp.zeros((1, s, s, 3), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, img, None,
                           train=False))

    if "param" in args.tasks:
        leaves = jax.tree.leaves(params)
        total = sum(np.prod(l.shape) for l in leaves)
        print(f"#parameters: {total / 1e6:.3f} M ({len(leaves)} tensors)")

    if "structure" in args.tasks:
        def walk(tree, prefix=""):
            n = 0
            for k, v in sorted(tree.items()):
                if hasattr(v, "items"):
                    sub = walk(v, prefix + k + ".")
                    if prefix.count(".") < 2:
                        print(f"  {prefix + k}: {sub / 1e6:.3f} M")
                    n += sub
                else:
                    n += int(np.prod(v.shape))
            return n
        walk(params["params"])

    if "flop" in args.tasks:
        lowered = jax.jit(
            lambda p, im: model.apply(p, im, None, train=False)
        ).lower(params, img)
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan")) if cost else float("nan")
        print(f"XLA-estimated FLOPs per image @{s}px: {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
