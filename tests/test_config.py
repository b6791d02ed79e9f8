"""Config system tests: yacs semantics + loading the real reference YAMLs."""

import os

import pytest

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config

REF_CONFIGS = "/root/reference/configs"


def _setup(yaml_path, opts=()):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    cfg.merge_from_file(yaml_path)
    cfg.merge_from_list(list(opts))
    cfg.freeze()
    return cfg


def test_defaults_match_reference_schema():
    cfg = get_cfg()
    add_maskformer2_config(cfg)
    assert cfg.MODEL.MASK_FORMER.NHEADS == 8
    assert cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS == 112 * 112
    assert cfg.MODEL.DN.NUM_DN == 5
    assert cfg.MODEL.DN.NOISE_SCALE == 0.2
    assert cfg.MODEL.MASK_FORMER.DN_MODE == "base"
    assert cfg.MODEL.MASK_FORMER.LB_NOISE_RATIO == -1.0


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference configs not present")
def test_load_reference_instance_yaml_with_base_inheritance():
    cfg = _setup(
        os.path.join(
            REF_CONFIGS, "coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml"
        )
    )
    # from Base-COCO-InstanceSegmentation.yaml
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.INPUT.DATASET_MAPPER_NAME == "coco_instance_lsj"
    # from the leaf yaml
    assert cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME == "MSDeformAttnPixelDecoder"
    assert cfg.MODEL.MASK_FORMER.DEC_LAYERS == 10
    assert cfg.MODEL.MASK_FORMER.TEST.INSTANCE_ON is True
    assert cfg.SOLVER.MAX_ITER == 88500
    assert tuple(cfg.SOLVER.STEPS) == (73750, 81125)


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference configs not present")
def test_released_recipe_cli_overrides():
    # the exact override list from run_50ep_no_noise_all_ly.sh:9-23
    opts = [
        "MODEL.DN.NUM_DN", "1",
        "MODEL.DN.NOISE_SCALE", "0.0",
        "MODEL.MASK_FORMER.DN_MODE", "points",
        "MODEL.MASK_FORMER.ALL_LY_DN", "True",
        "MODEL.MASK_FORMER.LB_NOISE_RATIO", "0.2",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "MultiScaleMaskedTransformerDecoderMaskDN",
    ]
    cfg = _setup(
        os.path.join(
            REF_CONFIGS, "coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml"
        ),
        opts,
    )
    assert cfg.MODEL.DN.NUM_DN == 1
    assert cfg.MODEL.DN.NOISE_SCALE == 0.0
    assert cfg.MODEL.MASK_FORMER.DN_MODE == "points"
    assert cfg.MODEL.MASK_FORMER.ALL_LY_DN is True
    assert cfg.MODEL.MASK_FORMER.LB_NOISE_RATIO == 0.2


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference configs not present")
def test_load_every_reference_yaml():
    """All 97 reference configs must parse against our schema."""
    from mp_former_tpu.config import add_maskformer2_video_config

    n = 0
    for root, _, files in os.walk(REF_CONFIGS):
        for f in files:
            if not f.endswith(".yaml"):
                continue
            cfg = get_cfg()
            add_deeplab_config(cfg)
            add_maskformer2_config(cfg)
            if "youtubevis" in root:
                add_maskformer2_video_config(cfg)
            cfg.merge_from_file(os.path.join(root, f))
            n += 1
    assert n >= 90


def test_freeze_and_clone():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.WEIGHTS = "x"
    c2 = cfg.clone()
    c2.defrost()
    c2.MODEL.WEIGHTS = "y"
    assert cfg.MODEL.WEIGHTS == ""
