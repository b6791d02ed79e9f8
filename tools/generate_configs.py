#!/usr/bin/env python
"""Generate the full training-config tree under configs/.

The reference ships ~97 YAMLs (configs/ in IDEA-Research/MP-Former); this
emits the same file set with the same semantics in this repo's house style:
explicit value tuples instead of the d2 eval tag, variant leaves chain off the
R50 leaf instead of duplicating the model block, and keys the reference marks
"not used" are left to defaults. Run from the repo root:

    python tools/generate_configs.py
"""

import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


def scales(size):
    return "(" + ", ".join(str(int(x * 0.1 * size)) for x in range(5, 21)) + ")"


def backbone_r50(norm=None):
    lines = [
        "MODEL:",
        "  BACKBONE:",
        '    NAME: "build_resnet_backbone"',
        "    FREEZE_AT: 0",
        '  WEIGHTS: "detectron2://ImageNetPretrained/torchvision/R-50.pkl"',
        "  PIXEL_MEAN: [123.675, 116.280, 103.530]",
        "  PIXEL_STD: [58.395, 57.120, 57.375]",
        "  RESNETS:",
        "    DEPTH: 50",
        "    STEM_OUT_CHANNELS: 64",
        "    STRIDE_IN_1X1: False",
        '    OUT_FEATURES: ["res2", "res3", "res4", "res5"]',
    ]
    if norm:
        lines.append(f'    NORM: "{norm}"')
    return lines


def solver_poly(max_iter):
    return [
        "SOLVER:",
        "  IMS_PER_BATCH: 16",
        "  BASE_LR: 0.0001",
        f"  MAX_ITER: {max_iter}",
        '  LR_SCHEDULER_NAME: "WarmupPolyLR"',
        "  WARMUP_FACTOR: 1.0",
        "  WARMUP_ITERS: 0",
        "  WEIGHT_DECAY: 0.05",
        '  OPTIMIZER: "ADAMW"',
        "  BACKBONE_MULTIPLIER: 0.1",
        "  CLIP_GRADIENTS:",
        "    ENABLED: True",
        '    CLIP_TYPE: "full_model"',
        "    CLIP_VALUE: 0.01",
        "    NORM_TYPE: 2.0",
        "  AMP:",
        "    ENABLED: True",
    ]


def solver_lsj(steps, max_iter):
    return [
        "SOLVER:",
        "  IMS_PER_BATCH: 16",
        "  BASE_LR: 0.0001",
        f"  STEPS: {steps}",
        f"  MAX_ITER: {max_iter}",
        "  WARMUP_FACTOR: 1.0",
        "  WARMUP_ITERS: 10",
        "  WEIGHT_DECAY: 0.05",
        '  OPTIMIZER: "ADAMW"',
        "  BACKBONE_MULTIPLIER: 0.1",
        "  CLIP_GRADIENTS:",
        "    ENABLED: True",
        '    CLIP_TYPE: "full_model"',
        "    CLIP_VALUE: 0.01",
        "    NORM_TYPE: 2.0",
        "  AMP:",
        "    ENABLED: True",
    ]


def input_crop(size, crop, divis, mapper, max_train=None, max_test=None,
               min_test=None):
    base = size if isinstance(size, int) else max(size)
    return [
        "INPUT:",
        f"  MIN_SIZE_TRAIN: {scales(base)}",
        '  MIN_SIZE_TRAIN_SAMPLING: "choice"',
        f"  MIN_SIZE_TEST: {min_test if min_test else base}",
        f"  MAX_SIZE_TRAIN: {max_train if max_train else base * 4}",
        f"  MAX_SIZE_TEST: {max_test if max_test else base * 4}",
        "  CROP:",
        "    ENABLED: True",
        '    TYPE: "absolute"',
        f"    SIZE: {crop}",
        "    SINGLE_CATEGORY_MAX_AREA: 1.0",
        "  COLOR_AUG_SSD: True",
        f"  SIZE_DIVISIBILITY: {divis}",
        '  FORMAT: "RGB"',
        f'  DATASET_MAPPER_NAME: "{mapper}"',
    ]


def input_lsj(mapper):
    return [
        "INPUT:",
        "  IMAGE_SIZE: 1024",
        "  MIN_SCALE: 0.1",
        "  MAX_SCALE: 2.0",
        '  FORMAT: "RGB"',
        f'  DATASET_MAPPER_NAME: "{mapper}"',
    ]


def test_aug(min_sizes, max_size, eval_period=5000):
    return [
        "TEST:",
        f"  EVAL_PERIOD: {eval_period}",
        "  AUG:",
        "    ENABLED: False",
        f"    MIN_SIZES: {list(min_sizes)}",
        f"    MAX_SIZE: {max_size}",
        "    FLIP: True",
    ]


def tail(workers=4, filter_empty=True):
    return [
        "DATALOADER:",
        f"  FILTER_EMPTY_ANNOTATIONS: {filter_empty}",
        f"  NUM_WORKERS: {workers}",
        "VERSION: 2",
    ]


def datasets(train, test):
    return ["DATASETS:", f'  TRAIN: ("{train}",)', f'  TEST: ("{test}",)']


def model_section(nc, sem, inst, pan, omt=0.8, decoder=None, meta="MaskFormer",
                  dn=False, weights=None, ignore=255):
    decoder = decoder or "MultiScaleMaskedTransformerDecoder"
    lines = ["MODEL:"]
    if weights is not None:
        lines.append(f'  WEIGHTS: "{weights}"')
    lines += [
        f'  META_ARCHITECTURE: "{meta}"',
        "  SEM_SEG_HEAD:",
        '    NAME: "MaskFormerHead"',
        '    IN_FEATURES: ["res2", "res3", "res4", "res5"]',
        f"    IGNORE_VALUE: {ignore}",
        f"    NUM_CLASSES: {nc}",
        "    LOSS_WEIGHT: 1.0",
        "    CONVS_DIM: 256",
        "    MASK_DIM: 256",
        '    NORM: "GN"',
        '    PIXEL_DECODER_NAME: "MSDeformAttnPixelDecoder"',
        '    DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES: ["res3", "res4", "res5"]',
        "    COMMON_STRIDE: 4",
        "    TRANSFORMER_ENC_LAYERS: 6",
        "  MASK_FORMER:",
        f'    TRANSFORMER_DECODER_NAME: "{decoder}"',
        '    TRANSFORMER_IN_FEATURE: "multi_scale_pixel_decoder"',
        "    DEEP_SUPERVISION: True",
        "    NO_OBJECT_WEIGHT: 0.1",
        "    CLASS_WEIGHT: 2.0",
        "    MASK_WEIGHT: 5.0",
        "    DICE_WEIGHT: 5.0",
        "    HIDDEN_DIM: 256",
        "    NUM_OBJECT_QUERIES: 100",
        "    NHEADS: 8",
        "    DROPOUT: 0.0",
        "    DIM_FEEDFORWARD: 2048",
        "    ENC_LAYERS: 0",
        "    PRE_NORM: False",
        "    ENFORCE_INPUT_PROJ: False",
        "    SIZE_DIVISIBILITY: 32",
        "    DEC_LAYERS: 10  # 9 decoder layers + 1 for the learnable-query loss",
        "    TRAIN_NUM_POINTS: 12544",
        "    OVERSAMPLE_RATIO: 3.0",
        "    IMPORTANCE_SAMPLE_RATIO: 0.75",
        "    TEST:",
        f"      SEMANTIC_ON: {sem}",
        f"      INSTANCE_ON: {inst}",
        f"      PANOPTIC_ON: {pan}",
        "      OVERLAP_THRESHOLD: 0.8",
        f"      OBJECT_MASK_THRESHOLD: {omt}",
    ]
    if dn:
        lines += ["  DN:", "    NUM_DN: 5", "    NOISE_SCALE: 0.2"]
    return lines


SWIN = {
    "tiny": (96, "[2, 2, 6, 2]", "[3, 6, 12, 24]", 7, None,
             "swin_tiny_patch4_window7_224.pkl"),
    "small": (96, "[2, 2, 18, 2]", "[3, 6, 12, 24]", 7, None,
              "swin_small_patch4_window7_224.pkl"),
    "base_384": (128, "[2, 2, 18, 2]", "[4, 8, 16, 32]", 12, 384,
                 "swin_base_patch4_window12_384.pkl"),
    "base_IN21k_384": (128, "[2, 2, 18, 2]", "[4, 8, 16, 32]", 12, 384,
                       "swin_base_patch4_window12_384_22k.pkl"),
    "large_IN21k_384": (192, "[2, 2, 18, 2]", "[6, 12, 24, 48]", 12, 384,
                        "swin_large_patch4_window12_384_22k.pkl"),
}


def swin_delta(kind, base_rel, queries=None, weights=None):
    dim, depths, heads, win, pre, pkl = SWIN[kind]
    lines = [
        f"_BASE_: {base_rel}",
        "MODEL:",
        "  BACKBONE:",
        '    NAME: "D2SwinTransformer"',
        "  SWIN:",
        f"    EMBED_DIM: {dim}",
        f"    DEPTHS: {depths}",
        f"    NUM_HEADS: {heads}",
        f"    WINDOW_SIZE: {win}",
        "    APE: False",
        "    DROP_PATH_RATE: 0.3",
        "    PATCH_NORM: True",
    ]
    if pre:
        lines.append(f"    PRETRAIN_IMG_SIZE: {pre}")
    lines.append(f'  WEIGHTS: "{weights or pkl}"')
    if queries:
        lines += ["  MASK_FORMER:", f"    NUM_OBJECT_QUERIES: {queries}"]
    return lines


def steplr_solver(steps, max_iter):
    return [
        "SOLVER:",
        '  LR_SCHEDULER_NAME: "WarmupMultiStepLR"',
        f"  STEPS: {steps}",
        f"  MAX_ITER: {max_iter}",
        "  WARMUP_ITERS: 10",
    ]


FILES = {}


def emit(path, comment, *blocks):
    lines = [f"# {comment}"]
    for b in blocks:
        lines += b if isinstance(b, list) else [b]
    FILES[path] = "\n".join(lines) + "\n"


def r101_delta(base_rel, norm=None):
    lines = [f"_BASE_: {base_rel}", "MODEL:", '  WEIGHTS: "R-101.pkl"',
             "  RESNETS:", "    DEPTH: 101"]
    if norm:
        lines.append(f'    NORM: "{norm}"')
    return lines


# --------------------------------------------------------------- ADE20K
for task, nc, mapper, flags in [
    ("instance-segmentation", 100, "mask_former_instance",
     (True, True, True)),
    ("panoptic-segmentation", 150, "mask_former_panoptic",
     (True, True, True)),
    ("semantic-segmentation", 150, "mask_former_semantic",
     (True, False, False)),
]:
    size = 512 if task == "semantic-segmentation" else 640
    base = f"Base-ADE20K-{task.split('-')[0].capitalize()}Segmentation.yaml"
    ds = {"instance-segmentation": ("ade20k_instance_train", "ade20k_instance_val"),
          "panoptic-segmentation": ("ade20k_panoptic_train", "ade20k_panoptic_val"),
          "semantic-segmentation": ("ade20k_sem_seg_train", "ade20k_sem_seg_val")}[task]
    emit(f"ade20k/{task}/{base}",
         f"ADE20K {task.split('-')[0]} base: R50, {size}px crops, poly LR.",
         backbone_r50(), datasets(*ds), solver_poly(160000),
         input_crop(size, f"({size}, {size})", size, mapper),
         test_aug([int(size * s) for s in (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)],
                  size * 7), tail())
    r50 = f"maskformer2_R50_bs16_160k.yaml"
    emit(f"ade20k/{task}/{r50}",
         f"ADE20K {task.split('-')[0]}: Mask2Former R50, 160k iters.",
         [f"_BASE_: {base}"], model_section(nc, *flags))
    emit(f"ade20k/{task}/maskformer2_R50_bs16_160k_steplr.yaml",
         "Step-LR twin of the 160k poly recipe.",
         [f"_BASE_: {r50}"], steplr_solver("(135000, 150000)", 160000))
    if task == "semantic-segmentation":
        emit(f"ade20k/{task}/maskformer2_R101_bs16_90k.yaml",
             "ADE20K semantic: R101 backbone (SyncBN, reference quirk).",
             r101_delta(r50, norm="SyncBN"))
        for kind in ("tiny", "small"):
            emit(f"ade20k/{task}/swin/maskformer2_swin_{kind}_bs16_160k.yaml",
                 f"ADE20K semantic: Swin-{kind} backbone.",
                 swin_delta(kind, f"../{r50}"))
        for kind in ("base_384", "base_IN21k_384", "large_IN21k_384"):
            res640 = (input_crop(640, "(640, 640)", 640, mapper) +
                      test_aug([320, 480, 640, 800, 960, 1120], 4480))
            emit(f"ade20k/{task}/swin/maskformer2_swin_{kind}_bs16_160k_res640.yaml",
                 f"ADE20K semantic: Swin-{kind}, 640px crops.",
                 swin_delta(kind, f"../{r50}"), res640)
        emit(f"ade20k/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_160k_res640_steplr.yaml",
             "Step-LR twin of the Swin-L 640px recipe.",
             ["_BASE_: maskformer2_swin_large_IN21k_384_bs16_160k_res640.yaml"],
             steplr_solver("(135000, 150000)", 160000))
    else:
        emit(f"ade20k/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_160k.yaml",
             f"ADE20K {task.split('-')[0]}: Swin-L, 200 queries.",
             swin_delta("large_IN21k_384", f"../{r50}", queries=200))
        emit(f"ade20k/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_160k_steplr.yaml",
             "Step-LR twin of the Swin-L recipe.",
             ["_BASE_: maskformer2_swin_large_IN21k_384_bs16_160k.yaml"],
             steplr_solver("(135000, 150000)", 160000))

# ----------------------------------------------------------- Cityscapes
for task, nc, mapper, flags in [
    ("instance-segmentation", 8, "mask_former_instance",
     (False, True, False)),
    ("panoptic-segmentation", 19, "mask_former_panoptic",
     (True, True, True)),
    ("semantic-segmentation", 19, "mask_former_semantic",
     (True, False, False)),
]:
    base = f"Base-Cityscapes-{task.split('-')[0].capitalize()}Segmentation.yaml"
    ds = {"instance-segmentation": ("cityscapes_fine_instance_seg_train",
                                    "cityscapes_fine_instance_seg_val"),
          "panoptic-segmentation": ("cityscapes_fine_panoptic_train",
                                    "cityscapes_fine_panoptic_val"),
          "semantic-segmentation": ("cityscapes_fine_sem_seg_train",
                                    "cityscapes_fine_sem_seg_val")}[task]
    emit(f"cityscapes/{task}/{base}",
         f"Cityscapes {task.split('-')[0]} base: R50 (SyncBN), 1024px, poly LR.",
         backbone_r50(norm="SyncBN"), datasets(*ds), solver_poly(90000),
         input_crop(1024, "(512, 1024)", -1, mapper, max_train=4096,
                    max_test=2048),
         test_aug([512, 768, 1024, 1280, 1536, 1792], 4096), tail())
    r50 = "maskformer2_R50_bs16_90k.yaml"
    # quirk kept: the reference panoptic "90k" leaf already carries the
    # step-LR solver (it is byte-identical to its _steplr twin)
    pan_solver = ([steplr_solver("(80000, 85000)", 90000)]
                  if task == "panoptic-segmentation" else [])
    emit(f"cityscapes/{task}/{r50}",
         f"Cityscapes {task.split('-')[0]}: Mask2Former R50, 90k iters.",
         [f"_BASE_: {base}"], model_section(nc, *flags), *pan_solver)
    emit(f"cityscapes/{task}/maskformer2_R50_bs16_90k_steplr.yaml",
         "Step-LR twin of the 90k poly recipe.",
         [f"_BASE_: {r50}"], steplr_solver("(80000, 85000)", 90000))
    if task != "panoptic-segmentation":
        emit(f"cityscapes/{task}/maskformer2_R101_bs16_90k_steplr.yaml",
             f"Cityscapes {task.split('-')[0]}: R101, step LR.",
             ["_BASE_: maskformer2_R101_bs16_90k.yaml"],
             steplr_solver("(80000, 85000)", 90000))
    emit(f"cityscapes/{task}/maskformer2_R101_bs16_90k.yaml",
         f"Cityscapes {task.split('-')[0]}: R101 backbone.", r101_delta(r50))
    for kind in ("tiny", "small", "base_IN21k_384"):
        emit(f"cityscapes/{task}/swin/maskformer2_swin_{kind}_bs16_90k.yaml",
             f"Cityscapes {task.split('-')[0]}: Swin-{kind} backbone.",
             swin_delta(kind, f"../{r50}"))
    q_large = None if task == "semantic-segmentation" else 200
    emit(f"cityscapes/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_90k.yaml",
         f"Cityscapes {task.split('-')[0]}: Swin-L backbone.",
         swin_delta("large_IN21k_384", f"../{r50}", queries=q_large))
    emit(f"cityscapes/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_90k_steplr.yaml",
         "Step-LR twin of the Swin-L recipe.",
         ["_BASE_: maskformer2_swin_large_IN21k_384_bs16_90k.yaml"],
         steplr_solver("(80000, 85000)", 90000))
if "cityscapes/semantic-segmentation/maskformer2_R50_bs16_150k_steplr.yaml" not in FILES:
    emit("cityscapes/semantic-segmentation/maskformer2_R50_bs16_150k_steplr.yaml",
         "Longer 150k step-LR semantic recipe.",
         ["_BASE_: maskformer2_R50_bs16_90k.yaml"],
         steplr_solver("(80000, 85000)", 150000))

# ------------------------------------------------------ Mapillary Vistas
for task, mapper, flags in [
    ("panoptic-segmentation", "mask_former_panoptic", (True, False, True)),
    ("semantic-segmentation", "mask_former_semantic", (True, False, False)),
]:
    base = f"Base-MapillaryVistas-{task.split('-')[0].capitalize()}Segmentation.yaml"
    ds = {"panoptic-segmentation": ("mapillary_vistas_panoptic_train",
                                    "mapillary_vistas_panoptic_val"),
          "semantic-segmentation": ("mapillary_vistas_sem_seg_train",
                                    "mapillary_vistas_sem_seg_val")}[task]
    emit(f"mapillary-vistas/{task}/{base}",
         f"Mapillary Vistas {task.split('-')[0]} base: R50, 2048px, poly LR.",
         backbone_r50(), datasets(*ds), solver_poly(300000),
         input_crop(2048, "(1024, 1024)", 1024, mapper, max_train=8192,
                    max_test=2048),
         ["TEST:", "  EVAL_PERIOD: 0"], tail(workers=10))
    name = ("maskformer_R50_bs16_300k.yaml" if task == "panoptic-segmentation"
            else "maskformer2_R50_bs16_300k.yaml")  # reference filename quirk
    emit(f"mapillary-vistas/{task}/{name}",
         f"Mapillary Vistas {task.split('-')[0]}: Mask2Former R50, 300k iters.",
         [f"_BASE_: {base}"], model_section(65, *flags, omt=0.0, ignore=65))
    emit(f"mapillary-vistas/{task}/swin/maskformer2_swin_large_IN21k_384_bs16_300k.yaml",
         f"Mapillary Vistas {task.split('-')[0]}: Swin-L, 200 queries.",
         swin_delta("large_IN21k_384", f"../{name}",
                    queries=200 if task == "panoptic-segmentation" else None))

# ----------------------------------------------------------------- COCO
coco_inst_base = "Base-COCO-InstanceSegmentation.yaml"
coco_pan_base = "Base-COCO-PanopticSegmentation.yaml"
emit(f"coco/instance-segmentation/{coco_inst_base}",
     "COCO instance base: R50, LSJ 1024, 50-epoch AdamW schedule.",
     backbone_r50(), datasets("coco_2017_train", "coco_2017_val"),
     solver_lsj("(327778, 355092)", 368750), input_lsj("coco_instance_lsj"),
     ["TEST:", "  EVAL_PERIOD: 5000"], tail())
emit(f"coco/panoptic-segmentation/{coco_pan_base}",
     "COCO panoptic base: R50, LSJ 1024, 50-epoch AdamW schedule.",
     backbone_r50(),
     ["DATASETS:", '  TRAIN: ("coco_2017_train_panoptic",)',
      '  TEST: ("coco_2017_val_panoptic_with_sem_seg",)  # also eval instance/semantic'],
     solver_lsj("(327778, 355092)", 368750), input_lsj("coco_panoptic_lsj"),
     ["TEST:", "  EVAL_PERIOD: 5000"], tail())

# panoptic leaves
emit("coco/panoptic-segmentation/maskformer2_R50_bs16_50ep.yaml",
     "COCO panoptic: Mask2Former R50, 50 epochs (PQ 51.9 in the model zoo).",
     [f"_BASE_: {coco_pan_base}"],
     model_section(133, True, True, True))
for name, steps, mi in [("12ep", "(73750, 81125)", 88500),
                        ("36ep", "(245000, 260000)", 265500)]:
    emit(f"coco/panoptic-segmentation/maskformer2_R50_bs16_{name}.yaml",
         f"COCO panoptic: {name} schedule.",
         ["_BASE_: maskformer2_R50_bs16_50ep.yaml"],
         ["SOLVER:", f"  STEPS: {steps}", f"  MAX_ITER: {mi}"])
emit("coco/panoptic-segmentation/maskformer2_R101_bs16_50ep.yaml",
     "COCO panoptic: R101 backbone.",
     r101_delta("maskformer2_R50_bs16_50ep.yaml"))
for kind in ("tiny", "small", "base_384", "base_IN21k_384"):
    emit(f"coco/panoptic-segmentation/swin/maskformer2_swin_{kind}_bs16_50ep.yaml",
         f"COCO panoptic: Swin-{kind} backbone.",
         swin_delta(kind, "../maskformer2_R50_bs16_50ep.yaml"))
emit("coco/panoptic-segmentation/swin/maskformer2_swin_large_IN21k_384_bs16_100ep.yaml",
     "COCO panoptic: Swin-L, 200 queries, 100 epochs (PQ 57.8).",
     swin_delta("large_IN21k_384", "../maskformer2_R50_bs16_50ep.yaml",
                queries=200),
     ["SOLVER:", "  STEPS: (655556, 710184)", "  MAX_ITER: 737500"])

# instance leaves
emit("coco/instance-segmentation/maskformer2_R50_bs16_50ep.yaml",
     "COCO instance: Mask2Former R50, 50 epochs (AP 43.7 in the model zoo).",
     [f"_BASE_: {coco_inst_base}"],
     model_section(80, False, True, False))
emit("coco/instance-segmentation/maskformer2_R50_bs16_50ep_dbg.yaml",
     "Debug twin: eval every 50 iters.",
     ["_BASE_: maskformer2_R50_bs16_50ep.yaml"],
     ["TEST:", "  EVAL_PERIOD: 50"])
emit("coco/instance-segmentation/maskformer2_R101_bs16_50ep.yaml",
     "COCO instance: R101 backbone.",
     r101_delta("maskformer2_R50_bs16_50ep.yaml"))
for name, steps, mi in [("24ep", "(162250, 169625)", 177000),
                        ("36ep", "(245000, 260000)", 265500)]:
    emit(f"coco/instance-segmentation/maskformer2_R50_bs16_{name}_DN_query.yaml",
         f"MP-Former mask-piloted recipe, {name} schedule.",
         ["_BASE_: maskformer2_R50_bs16_50ep.yaml"],
         ["MODEL:", "  DN:", "    NUM_DN: 5", "    NOISE_SCALE: 0.2"],
         ["SOLVER:", f"  STEPS: {steps}", f"  MAX_ITER: {mi}"])
emit("coco/instance-segmentation/maskformer2_R50_bs16_50ep_DN_query.yaml",
     "MP-Former mask-piloted recipe, 50-epoch schedule.",
     ["_BASE_: maskformer2_R50_bs16_50ep.yaml"],
     ["MODEL:", "  DN:", "    NUM_DN: 5", "    NOISE_SCALE: 0.2"])
for kind in ("tiny", "small", "base_384", "base_IN21k_384"):
    emit(f"coco/instance-segmentation/swin/maskformer2_swin_{kind}_bs16_50ep.yaml",
         f"COCO instance: Swin-{kind} backbone.",
         swin_delta(kind, "../maskformer2_R50_bs16_50ep.yaml"))
emit("coco/instance-segmentation/swin/maskformer2_swin_large_IN21k_384_bs16_100ep.yaml",
     "COCO instance: Swin-L, 200 queries, 100 epochs (AP 50.1).",
     swin_delta("large_IN21k_384", "../maskformer2_R50_bs16_50ep.yaml",
                queries=200),
     ["SOLVER:", "  STEPS: (655556, 710184)", "  MAX_ITER: 737500"])
for suffix, steps, mi in [("drop", "(145000, 175000)", 250000),
                          ("drop169999", "(170000, 200000)", 250000),
                          ("drop269999", "(270000, 300000)", 350000),
                          ("drop394999", "(395000, 425000)", 450000)]:
    emit(f"coco/instance-segmentation/swin/maskformer2_swin_large_IN21k_384_bs16_100ep_{suffix}.yaml",
         f"Swin-L LR-drop ablation ({suffix}).",
         ["_BASE_: maskformer2_swin_large_IN21k_384_bs16_100ep.yaml"],
         ["SOLVER:", f"  STEPS: {steps}", f"  MAX_ITER: {mi}"])

# ----------------------------------------------------------- YouTubeVIS
for year, steps, mi in [("2019", "(4000,)", 6000), ("2021", "(5500,)", 8000)]:
    base = "Base-YouTubeVIS-VideoInstanceSegmentation.yaml"
    emit(f"youtubevis_{year}/{base}",
         f"YouTubeVIS-{year} video instance base: R50, per-clip aug.",
         backbone_r50(), ["  MASK_ON: True"],
         datasets(f"ytvis_{year}_train", f"ytvis_{year}_val"),
         solver_lsj(steps, mi),
         ["INPUT:",
          '  MIN_SIZE_TRAIN_SAMPLING: "choice_by_clip"',
          '  RANDOM_FLIP: "flip_by_clip"',
          "  AUGMENTATIONS: []",
          "  MIN_SIZE_TRAIN: (360, 480)",
          "  MIN_SIZE_TEST: 360",
          "  CROP:",
          "    ENABLED: False",
          '    TYPE: "absolute_range"',
          "    SIZE: (600, 720)",
          '  FORMAT: "RGB"'],
         ["TEST:", "  EVAL_PERIOD: 0"], tail(filter_empty=False))
    r50 = "video_maskformer2_R50_bs16_8ep.yaml"
    emit(f"youtubevis_{year}/{r50}",
         f"YouTubeVIS-{year}: VideoMaskFormer R50 from the COCO checkpoint.",
         [f"_BASE_: {base}"],
         model_section(40, False, True, False, meta="VideoMaskFormer",
                       decoder="VideoMultiScaleMaskedTransformerDecoder",
                       weights="model_final_3c8ec9.pkl"))
    emit(f"youtubevis_{year}/video_maskformer2_R101_bs16_8ep.yaml",
         f"YouTubeVIS-{year}: R101 from the COCO R101 checkpoint.",
         [f"_BASE_: {r50}", "MODEL:",
          '  WEIGHTS: "model_final_eba159.pkl"',
          "  RESNETS:", "    DEPTH: 101"])
    vid_weights = {"tiny": "model_final_86143f.pkl",
                   "small": "model_final_1e7f22.pkl",
                   "base_IN21k_384": "model_final_83d103.pkl",
                   "large_IN21k_384": "model_final_e5f453.pkl"}
    for kind, w in vid_weights.items():
        q = 200 if kind == "large_IN21k_384" else None
        blocks = [swin_delta(kind, f"../{r50}", queries=q, weights=w)]
        if not (year == "2021" and kind == "large_IN21k_384"):
            blocks.append(["INPUT:", "  MIN_SIZE_TEST: 480"])
        emit(f"youtubevis_{year}/swin/video_maskformer2_swin_{kind}_bs16_8ep.yaml",
             f"YouTubeVIS-{year}: Swin-{kind} from the COCO Swin checkpoint.",
             *blocks)


def sort_blocks(text):
    """Alphabetize keys within every mapping block (YAML order is
    semantically irrelevant; house style sorts for scanability).
    File comments and _BASE_ stay on top."""
    lines = text.rstrip("\n").split("\n")
    head = []
    while lines and (lines[0].startswith("#") or lines[0].startswith("_BASE_")):
        head.append(lines.pop(0))

    def parse(i, indent):
        items = []
        while i < len(lines):
            line = lines[i]
            cur = len(line) - len(line.lstrip())
            if cur < indent:
                break
            key = line.strip().split(":")[0]
            i += 1
            child = []
            while i < len(lines):
                nxt = len(lines[i]) - len(lines[i].lstrip())
                if nxt <= cur:
                    break
                child, i = parse(i, nxt)
                break
            items.append((key, line, child))
        items.sort(key=lambda kv: kv[0])
        return items, i

    tree, _ = parse(0, 0)

    def emit_tree(items, out):
        for _, line, child in items:
            out.append(line)
            emit_tree(child, out)

    out = list(head)
    emit_tree(tree, out)
    return "\n".join(out) + "\n"


def main():
    skip = {  # hand-authored files kept as-is
        "coco/instance-segmentation/maskformer2_R50_bs16_12ep_DN_query.yaml",
    }
    written = 0
    for rel, content in sorted(FILES.items()):
        if rel in skip:
            continue
        path = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(sort_blocks(content).replace('"', "'"))
        written += 1
    print(f"wrote {written} configs under {os.path.abspath(ROOT)}")


if __name__ == "__main__":
    main()
