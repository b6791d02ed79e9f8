"""Default config tree.

`get_cfg()` reproduces the subset of the detectron2 base schema the reference's
97 YAML configs touch, and `add_maskformer2_config` / `add_maskformer2_video_config`
mirror reference `mask2former/config.py:6-126` and `mask2former_video/config.py:6-12`
key-for-key so the reference YAML tree loads unchanged.
"""

from .cfg import CfgNode as CN


def get_cfg() -> CN:
    """Base (detectron2-equivalent) schema used by the reference configs."""
    _C = CN()
    _C.VERSION = 2
    _C.OUTPUT_DIR = "./output"
    _C.SEED = -1
    _C.CUDNN_BENCHMARK = False

    _C.MODEL = CN()
    _C.MODEL.META_ARCHITECTURE = "MaskFormer"
    _C.MODEL.DEVICE = "tpu"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.MASK_ON = False
    _C.MODEL.KEYPOINT_ON = False
    _C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 2

    _C.MODEL.RESNETS = CN()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    _C.MODEL.RESNETS.NUM_GROUPS = 1
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES5_DILATION = 1
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    _C.MODEL.RESNETS.STEM_TYPE = "basic"
    _C.MODEL.RESNETS.RES5_MULTI_GRID = [1, 1, 1]
    _C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]

    _C.MODEL.SEM_SEG_HEAD = CN()
    _C.MODEL.SEM_SEG_HEAD.NAME = "SemSegFPNHead"
    _C.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    _C.MODEL.SEM_SEG_HEAD.IGNORE_VALUE = 255
    _C.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 54
    _C.MODEL.SEM_SEG_HEAD.CONVS_DIM = 128
    _C.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    _C.MODEL.SEM_SEG_HEAD.NORM = "GN"
    _C.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT = 1.0

    _C.INPUT = CN()
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.RANDOM_FLIP = "horizontal"
    _C.INPUT.CROP = CN()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "relative_range"
    _C.INPUT.CROP.SIZE = [0.9, 0.9]
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.MASK_FORMAT = "polygon"

    _C.DATASETS = CN()
    _C.DATASETS.TRAIN = ()
    _C.DATASETS.TEST = ()

    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.ASPECT_RATIO_GROUPING = True
    _C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    _C.DATALOADER.REPEAT_THRESHOLD = 0.0
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

    _C.SOLVER = CN()
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.BASE_LR = 0.001
    _C.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    _C.SOLVER.MAX_ITER = 40000
    _C.SOLVER.STEPS = (30000,)
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.BASE_LR_END = 0.0
    _C.SOLVER.BIAS_LR_FACTOR = 1.0
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.NESTEROV = False
    _C.SOLVER.WEIGHT_DECAY = 0.0001
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    _C.SOLVER.WEIGHT_DECAY_BIAS = None
    _C.SOLVER.CHECKPOINT_PERIOD = 5000
    _C.SOLVER.CLIP_GRADIENTS = CN()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    _C.SOLVER.AMP = CN()
    _C.SOLVER.AMP.ENABLED = False
    _C.SOLVER.POLY_LR_POWER = 0.9
    _C.SOLVER.POLY_LR_CONSTANT_ENDING = 0.0

    _C.TEST = CN()
    _C.TEST.EVAL_PERIOD = 0
    _C.TEST.AUG = CN()
    _C.TEST.AUG.ENABLED = False
    _C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
    _C.TEST.AUG.MAX_SIZE = 4000
    _C.TEST.AUG.FLIP = True
    # [[task, metric, expected, tolerance], ...] checked after --eval-only
    # (d2 verify_results, called at reference train_net.py:385)
    _C.TEST.EXPECTED_RESULTS = []
    _C.TEST.DETECTIONS_PER_IMAGE = 100

    return _C


def add_deeplab_config(cfg: CN) -> None:
    """Keys the reference pulls in via `add_deeplab_config` (train_net.py:358)."""
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES = ["res2"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [48]
    cfg.INPUT.SINGLE_CATEGORY_MAX_AREA = 1.0
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupPolyLR"


def add_maskformer2_config(cfg: CN) -> None:
    """Mirror of reference `mask2former/config.py:6-126` (all keys, same defaults)."""
    # data config
    cfg.INPUT.DATASET_MAPPER_NAME = "mask_former_semantic"
    cfg.INPUT.COLOR_AUG_SSD = False
    cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA = 1.0
    cfg.INPUT.SIZE_DIVISIBILITY = -1

    # solver config
    cfg.SOLVER.WEIGHT_DECAY_EMBED = 0.0
    cfg.SOLVER.OPTIMIZER = "ADAMW"
    cfg.SOLVER.BACKBONE_MULTIPLIER = 0.1
    cfg.SOLVER.INSTANT_DROP = False
    cfg.SOLVER.DROP_EP = 0

    # mask_former model config
    cfg.MODEL.MASK_FORMER = CN()
    cfg.MODEL.MASK_FORMER.DEEP_SUPERVISION = True
    cfg.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT = 0.1
    cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 1.0
    cfg.MODEL.MASK_FORMER.DICE_WEIGHT = 1.0
    cfg.MODEL.MASK_FORMER.MASK_WEIGHT = 20.0

    cfg.MODEL.MASK_FORMER.NHEADS = 8
    cfg.MODEL.MASK_FORMER.DROPOUT = 0.1
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 2048
    cfg.MODEL.MASK_FORMER.ENC_LAYERS = 0
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 6
    cfg.MODEL.MASK_FORMER.PRE_NORM = False
    cfg.MODEL.MASK_FORMER.LAST_Q_RATIO = 0.0

    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 256
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 100

    cfg.MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE = "res5"
    cfg.MODEL.MASK_FORMER.ENFORCE_INPUT_PROJ = False

    cfg.MODEL.MASK_FORMER.TEST = CN()
    cfg.MODEL.MASK_FORMER.TEST.SEMANTIC_ON = True
    cfg.MODEL.MASK_FORMER.TEST.INSTANCE_ON = False
    cfg.MODEL.MASK_FORMER.TEST.PANOPTIC_ON = False
    cfg.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD = 0.0
    cfg.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD = 0.0
    cfg.MODEL.MASK_FORMER.TEST.SEM_SEG_POSTPROCESSING_BEFORE_INFERENCE = False

    # mask-piloted (DN) training switches (reference config.py:64-69)
    cfg.MODEL.MASK_FORMER.DN_MODE = "base"
    cfg.MODEL.MASK_FORMER.HEAD_DN = False
    cfg.MODEL.MASK_FORMER.ALL_LY_DN = False
    cfg.MODEL.MASK_FORMER.DN_RATIO = 0.5
    cfg.MODEL.MASK_FORMER.DN_NO_LB = False
    cfg.MODEL.MASK_FORMER.LB_NOISE_RATIO = -1.0

    cfg.MODEL.MASK_FORMER.SIZE_DIVISIBILITY = 32

    # pixel decoder config
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 256
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 0
    cfg.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME = "BasePixelDecoder"

    # swin transformer backbone
    cfg.MODEL.SWIN = CN()
    cfg.MODEL.SWIN.PRETRAIN_IMG_SIZE = 224
    cfg.MODEL.SWIN.PATCH_SIZE = 4
    cfg.MODEL.SWIN.EMBED_DIM = 96
    cfg.MODEL.SWIN.DEPTHS = [2, 2, 6, 2]
    cfg.MODEL.SWIN.NUM_HEADS = [3, 6, 12, 24]
    cfg.MODEL.SWIN.WINDOW_SIZE = 7
    cfg.MODEL.SWIN.MLP_RATIO = 4.0
    cfg.MODEL.SWIN.QKV_BIAS = True
    cfg.MODEL.SWIN.QK_SCALE = None
    cfg.MODEL.SWIN.DROP_RATE = 0.0
    cfg.MODEL.SWIN.ATTN_DROP_RATE = 0.0
    cfg.MODEL.SWIN.DROP_PATH_RATE = 0.3
    cfg.MODEL.SWIN.APE = False
    cfg.MODEL.SWIN.PATCH_NORM = True
    cfg.MODEL.SWIN.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.SWIN.USE_CHECKPOINT = False

    cfg.MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME = "MultiScaleMaskedTransformerDecoder"

    # LSJ aug
    cfg.INPUT.IMAGE_SIZE = 1024
    cfg.INPUT.MIN_SCALE = 0.1
    cfg.INPUT.MAX_SCALE = 2.0

    # MSDeformAttn encoder configs
    cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_N_POINTS = 4
    cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_N_HEADS = 8

    # point loss configs
    cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 112 * 112
    cfg.MODEL.MASK_FORMER.OVERSAMPLE_RATIO = 3.0
    cfg.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO = 0.75

    cfg.MODEL.DN = CN()
    cfg.MODEL.DN.NUM_DN = 5
    cfg.MODEL.DN.NOISE_SCALE = 0.2

    # TPU-specific (new keys; do not exist in the reference)
    cfg.TPU = CN()
    cfg.TPU.MESH_SHAPE = [-1]          # data-parallel axis; -1 = all devices
    cfg.TPU.MESH_AXES = ["data"]
    cfg.TPU.COMPUTE_DTYPE = "float32"  # "bfloat16" for AMP-equivalent training
    cfg.TPU.MAX_INSTANCES = 100        # static GT padding cap per image
    cfg.TPU.DN_MAX_GT = 20             # static cap for DN group size
    # NUM_DN >= 100 budget configs recompile the step per distinct batch-max
    # GT count; DN_GROUP_BUCKET > 1 rounds the max up to a multiple of this,
    # bounding compiles to DN_MAX_GT/bucket programs (1 = reference-exact)
    cfg.TPU.DN_GROUP_BUCKET = 1
    # shard the encoder TOKEN axis over the mesh's `data` axis (SPMD): divides
    # the per-chip deformable-gather row count (the reference-exact engine's
    # floor) by the axis size. For B=1 serving latency on multi-chip meshes;
    # no-op on a single device. See PERFORMANCE.md round 4.
    cfg.TPU.SHARD_TOKENS = False
    cfg.TPU.PROFILE_DIR = ""           # capture a jax.profiler trace of steps 5-8
    cfg.TPU.MAX_PAIRS = 512            # static matched-pair budget for mask losses (0 = dense)
    cfg.TPU.POINT_SAMPLE_MODE = "grid"  # 'grid' (dense, fast) | 'random' (reference-exact points)
    # pallas flash-style masked cross-attention (ops/fused_masked_attention).
    # XLA's fused path measures within ~8% on v5e, so this stays opt-in.
    cfg.TPU.FUSED_MASKED_ATTN = False
    # rematerialize deformable encoder layers under autodiff. Required to fit
    # bs8/512px on a 16GB chip; turn off for small batches to skip the
    # recompute.
    cfg.TPU.REMAT_ENCODER = True
    # remat policy: 'full' recomputes everything; 'dots' saves matmul outputs
    # (jax dots_saveable) so the backward recompute redoes only the gathers
    # and elementwise ops (more memory, less recompute)
    cfg.TPU.REMAT_POLICY = "full"
    # deformable-attention sampling engine. 'packed2x2' = reference-exact
    # per-head sampling locations (one 4D-wide gather row per point).
    # 'pallas' = SAME semantics and parameter layout as packed2x2 (reference
    # checkpoints load unchanged) but the gather+tap-weighting runs as a
    # Mosaic kernel with the per-head patch table VMEM-resident
    # (ops/msda_pallas.py; falls back to packed2x2 per level when a table
    # exceeds the VMEM budget or off-TPU).
    # 'headshare' = one location set shared across heads (one 4*M*D-wide row
    # per point, M-fold fewer gather rows — the op is row-count-bound on TPU).
    # headshare is a trained-from-scratch deviation; checkpoints do not
    # interconvert with the reference.
    cfg.TPU.SAMPLING_ENGINE = "packed2x2"
    # fuse the headshare engine's tap weighting into a Pallas VPU kernel
    # (XLA relayouts the taps tensor otherwise; no-op for packed2x2 and on
    # non-TPU backends)
    cfg.TPU.PALLAS_TAP_WEIGHTING = False
    # streamed instance evaluation: when the eval tasks are instance-only,
    # group TPU.EVAL_STREAM same-shape images per jit invocation (lax.scan
    # over the stream — this backend charges ~30 ms per INVOCATION, see
    # PERFORMANCE.md) and fold the full post-processing chain
    # (upsample -> crop -> resize-to-original -> topk -> mask scoring ->
    # binarize) into the same program, returning bit-packed masks (8x
    # fewer d2h bytes). 1 restores per-image invocations + host-side
    # post-processing (round-2 behavior; semantic/panoptic always use it).
    cfg.TPU.EVAL_STREAM = 8
    # eval canvas bucketing: 0 pads every image to the full
    # (MIN_SIZE_TEST, MAX_SIZE_TEST) rectangle (2 compiles); a /32 multiple N
    # rounds each side up to N instead (more compiles — persistent-cached —
    # but no wasted pixels on near-square images of a gather-bound model)
    cfg.TPU.EVAL_BUCKET_STEP = 128
    # GT mask rasterization stride for the LSJ mapper. 0 = auto (4 when the
    # grid-mode loss is active — it resizes GT to the 1/4 prediction grid
    # anyway, so this is lossless there — else 1). Cuts host rasterization
    # and mask transfer 16x at stride 4 (the remote-TPU transfer of full-res
    # GT masks otherwise dominates data time at 1024px).
    cfg.TPU.GT_MASK_STRIDE = 0
    # pred-side random-point loss sampling via tent-matrix matmuls (MXU)
    # instead of per-point gathers whose backward is a scatter-add (~80
    # ns/row on TPU — 5.2 s/step at B=8/512px). Numerically equivalent to
    # the 4-tap form (fp32 HIGHEST matmuls, ~1e-6); False restores gathers.
    cfg.TPU.POINT_MATMUL_SAMPLING = True
    # gradient accumulation: split each batch into N micro-batches inside
    # the jitted step (lax.scan) and apply ONE optimizer update on the
    # accumulated gradients. Activation memory scales with B/N — the
    # published bs16@1024 recipe's fallback on a single 16GB chip.
    # Mask/dice losses stay exact (global num_masks normalization);
    # loss_ce* become the standard per-micro-mean approximation.
    cfg.TPU.GRAD_ACCUM_STEPS = 1
    # donate train-state buffers to the jitted step (halves state HBM).
    # False works around an axon-client abort at large buffer counts
    # (client.rs:2008 "index out of bounds"; see PERFORMANCE.md round 4)
    cfg.TPU.DONATE = True
    # compile the step as TWO programs (grad accumulation + optimizer
    # update) instead of one: identical math, one extra dispatch. Works
    # around the same client abort for programs that combine a huge body
    # with full-state I/O (the bs16@1024 recipe); see PERFORMANCE.md.
    cfg.TPU.SPLIT_STEP = False
    # with GRAD_ACCUM_STEPS > 1: drive the micro-batch loop from the host
    # (one compiled micro program invoked accum times + the update
    # program) instead of lax.scan — each invocation stays at a program
    # scale the runtime client sustains; identical math to the scan.
    cfg.TPU.HOST_ACCUM = False
    # exact Hungarian matching via a host scipy solve between a jitted cost
    # pass and the jitted grad pass (the reference's CPU hop,
    # matcher.py:84-107 under no_grad; axon rejects in-jit host callbacks).
    # Costs ~1 extra forward per step — an A/B tool for bounding the
    # on-device auction's 1-5% cost suboptimality, not a fast path.
    cfg.TPU.MATCHER_HOST_EXACT = False
    # roll the deformable encoder's identical layers into one lax.scan
    # (stacked params, one while-loop on device). Same math — the unrolled
    # form pays per-HLO dispatch overhead on this remote backend (~0.1 ms/op
    # of wall-vs-busy gap at 1024px, PERFORMANCE.md). Param layout differs
    # from the unrolled form (encoder_scan/layer/* with a leading layer
    # axis), so reference-checkpoint import keeps the unrolled default.
    cfg.TPU.SCAN_ENCODER = False


def add_maskformer2_video_config(cfg: CN) -> None:
    """Mirror of reference `mask2former_video/config.py:6-12`."""
    cfg.INPUT.SAMPLING_FRAME_NUM = 2
    cfg.INPUT.SAMPLING_FRAME_RANGE = 20
    cfg.INPUT.SAMPLING_FRAME_SHUFFLE = False
    cfg.INPUT.AUGMENTATIONS = []
