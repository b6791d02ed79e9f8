#!/usr/bin/env python
"""On-chip re-run of the uint8-image forward-exactness check.

tests/test_maskformer_forward.py::test_uint8_images_match_float32 pins, on
the CPU backend, that shipping uint8 images (compact host transfers) and
upcasting on device is bit-identical to shipping float32. VERDICT round-3
weak #7 asked for the same check ON the TPU backend (a stale pytest-cache
entry suggested it may once have failed there); the test suite itself pins
JAX_PLATFORMS=cpu, so this standalone probe replicates it against the real
chip and prints a JSON verdict.

Usage: python tools/probe_uint8_chip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from mp_former_tpu.config import (add_deeplab_config,
                                      add_maskformer2_config, get_cfg)
    from mp_former_tpu.models import build_model

    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    ref = ("/root/reference/configs/coco/instance-segmentation/"
           "maskformer2_R50_bs16_12ep_DN_query.yaml")
    if os.path.exists(ref):
        cfg.merge_from_file(ref)
    cfg.merge_from_list([
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
        "MODEL.MASK_FORMER.DN_MODE", "points",
        "MODEL.DN.NUM_DN", "1",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "10",
    ])
    model = build_model(cfg)

    img_u8 = (np.random.RandomState(0).rand(1, 128, 128, 3) * 255).astype(
        np.uint8)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k, im: model.init({"params": k}, im, None, train=False)
    )(jax.random.PRNGKey(0), small)

    fwd = jax.jit(lambda p, im: model.apply(p, im, None, train=False))
    out_f = fwd(params, jnp.asarray(img_u8, jnp.float32))
    out_u = fwd(params, jnp.asarray(img_u8))
    lg_f, lg_u = np.asarray(out_f["pred_logits"]), np.asarray(out_u["pred_logits"])
    pm_f, pm_u = np.asarray(out_f["pred_masks"]), np.asarray(out_u["pred_masks"])

    verdict = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "logits_bit_identical": bool((lg_f == lg_u).all()),
        "masks_bit_identical": bool((pm_f == pm_u).all()),
        "logits_max_abs_diff": float(np.abs(lg_f - lg_u).max()),
        "masks_max_abs_diff": float(np.abs(pm_f - pm_u).max()),
    }
    print(json.dumps(verdict))
    if not (verdict["logits_bit_identical"] and
            verdict["masks_bit_identical"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
