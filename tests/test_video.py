"""Video stack: forward shapes + tube criterion + YTVIS evaluator."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_former_tpu.config import get_cfg, add_deeplab_config, add_maskformer2_config, add_maskformer2_video_config
from mp_former_tpu.models import build_model
from mp_former_tpu.video import VideoTargets
from mp_former_tpu.video.criterion import build_video_criterion


def _video_cfg():
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    cfg.merge_from_list([
        "MODEL.META_ARCHITECTURE", "VideoMaskFormer",
        "MODEL.RESNETS.OUT_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.RESNETS.STRIDE_IN_1X1", "False",
        "MODEL.SEM_SEG_HEAD.NAME", "MaskFormerHead",
        "MODEL.SEM_SEG_HEAD.IN_FEATURES", "['res2','res3','res4','res5']",
        "MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder",
        "MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS", "1",
        "MODEL.SEM_SEG_HEAD.NUM_CLASSES", "5",
        "MODEL.SEM_SEG_HEAD.CONVS_DIM", "32",
        "MODEL.SEM_SEG_HEAD.MASK_DIM", "32",
        "MODEL.MASK_FORMER.TRANSFORMER_IN_FEATURE", "multi_scale_pixel_decoder",
        "MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME",
        "VideoMultiScaleMaskedTransformerDecoder",
        "MODEL.MASK_FORMER.HIDDEN_DIM", "32",
        "MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "6",
        "MODEL.MASK_FORMER.NHEADS", "4",
        "MODEL.MASK_FORMER.DIM_FEEDFORWARD", "64",
        "MODEL.MASK_FORMER.DEC_LAYERS", "4",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "128",
        "INPUT.SAMPLING_FRAME_NUM", "2",
    ])
    return cfg


def test_video_forward_and_loss():
    cfg = _video_cfg()
    model = build_model(cfg)
    b, t, h, w = 1, 2, 64, 64
    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(b, t, h, w, 3).astype(np.float32) * 255)
    params = model.init({"params": jax.random.PRNGKey(0)}, clips, None, train=False)
    out = model.apply(params, clips, None, train=True,
                      rngs={"dropout": jax.random.PRNGKey(5)})
    assert out["pred_logits"].shape == (b, 6, 6)
    assert out["pred_masks"].shape == (b, 6, t, 16, 16)
    assert len(out["aux_outputs"]) == 3

    n = 4
    masks = np.zeros((b, n, t, h, w), bool)
    masks[:, 0, :, 8:40, 8:40] = True
    masks[:, 1, 0, 30:60, 30:60] = True
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, 5, (b, n)), jnp.int32),
        masks=jnp.asarray(masks),
        valid=jnp.asarray([[True, True, False, False]]),
    )
    criterion = build_video_criterion(cfg)
    losses = criterion(out, targets, jax.random.PRNGKey(1))
    assert np.isfinite(float(criterion.weighted_total(losses)))
    for k in ("loss_ce", "loss_mask", "loss_dice", "loss_ce_2"):
        assert k in losses


def test_ytvis_evaluator_perfect():
    from mp_former_tpu.video.ytvis_eval import YTVISEvaluator

    t, h, w = 2, 32, 32
    tube = np.zeros((t, h, w), bool)
    tube[:, 4:16, 4:16] = True
    rec = {
        "video_id": 1, "height": h, "width": w, "length": t,
        "annotations": [{
            "id": 1, "category_id": 0, "iscrowd": 0,
            "segmentations": [[[4, 4, 16, 4, 16, 16, 4, 16]]] * t,
            "areas": [144, 144],
        }],
    }
    ev = YTVISEvaluator([rec])
    # predict exactly the GT rasterization
    from mp_former_tpu.video.ytvis import _seg_to_mask
    gt_m = _seg_to_mask([[4, 4, 16, 4, 16, 16, 4, 16]], h, w)
    pred = np.stack([gt_m, gt_m])
    ev.process(1, np.array([0.9]), np.array([0]), [pred])
    res = ev.evaluate()
    assert abs(res["segm"]["AP"] - 100.0) < 1e-6


def test_padded_clip_matches_unpadded():
    """Whole-clip eval pads T to a static bucket and masks padding frames
    out of cross-attention; real-frame outputs must EXACTLY match the
    unpadded forward (video/eval_loop.py make_clip_forward)."""
    cfg = _video_cfg()
    t_real, t_pad = 3, 5
    b, h, w = 1, 64, 64
    rng = np.random.RandomState(1)
    clip = rng.rand(b, t_real, h, w, 3).astype(np.float32) * 255

    cfg3 = cfg.clone(); cfg3.defrost()
    cfg3.INPUT.SAMPLING_FRAME_NUM = t_real; cfg3.freeze()
    model3 = build_model(cfg3)
    params = model3.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(clip), None, train=False)
    out3 = model3.apply(params, jnp.asarray(clip), None, train=False)

    cfg5 = cfg.clone(); cfg5.defrost()
    cfg5.INPUT.SAMPLING_FRAME_NUM = t_pad; cfg5.freeze()
    model5 = build_model(cfg5)
    padded = np.concatenate([clip, np.repeat(clip[:, -1:], t_pad - t_real,
                                             axis=1)], axis=1)
    fv = jnp.asarray(np.arange(t_pad)[None, :] < t_real)
    out5 = model5.apply(params, jnp.asarray(padded), None, train=False,
                        frame_valid=fv)

    np.testing.assert_allclose(np.asarray(out5["pred_logits"]),
                               np.asarray(out3["pred_logits"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out5["pred_masks"][:, :, :t_real]),
                               np.asarray(out3["pred_masks"]),
                               rtol=1e-5, atol=2e-5)


def test_whole_clip_eval_16_frames(tmp_path):
    """16-frame synthetic clip: the whole-clip eval loop must produce the
    same AP as a single-forward oracle at T=16 (VERDICT round-1 item #6;
    reference feeds whole clips, video_maskformer_model.py:255-287)."""
    import cv2

    from mp_former_tpu.video.eval_loop import (inference_on_video_dataset,
                                               inference_video, t_bucket)

    assert t_bucket(16) == 16  # single forward, no padding
    cfg = _video_cfg()
    cfg.defrost(); cfg.INPUT.MIN_SIZE_TEST = 64; cfg.freeze()
    t, h, w = 16, 64, 64
    rng = np.random.RandomState(2)
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    file_names = []
    for fi in range(t):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(frame_dir / f"{fi:05d}.jpg")
        cv2.imwrite(p, img)
        file_names.append(p)
    poly = [[8, 8, 40, 8, 40, 40, 8, 40]]
    rec = {
        "video_id": 1, "height": h, "width": w, "length": t,
        "file_names": file_names,
        "annotations": [{
            "id": 1, "category_id": 0, "iscrowd": 0,
            "segmentations": [poly] * t,
            "areas": [1024] * t,
        }],
    }

    cfg16 = cfg.clone(); cfg16.defrost()
    cfg16.INPUT.SAMPLING_FRAME_NUM = 16; cfg16.freeze()
    model16 = build_model(cfg16)
    params = model16.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 16, 64, 64, 3), jnp.float32),
                          None, train=False)

    results = inference_on_video_dataset(cfg, model16, params, [rec])
    # oracle: one direct forward at T=16 through the same params
    frames = [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
              for f in file_names]
    clip = jnp.asarray(np.stack(frames)[None].astype(np.float32))
    out = model16.apply(params, clip, None, train=False)
    scores, classes, tubes = inference_video(
        np.asarray(out["pred_logits"][0]), out["pred_masks"][0],
        (64, 64), h, w, 5)
    from mp_former_tpu.video.ytvis_eval import YTVISEvaluator

    ev = YTVISEvaluator([rec])
    ev.process(1, scores, classes, [tubes[i] for i in range(tubes.shape[0])])
    oracle = ev.evaluate()
    assert abs(results["segm"]["AP"] - oracle["segm"]["AP"]) < 1e-9


def test_video_matcher_invalid_columns_use_ceiling():
    """Invalid tube columns must cost just above the worst REAL cost, not a
    1e6 sentinel — the sentinel blows up the cost range and compresses real
    cost differences below the on-device auction's epsilon (regression)."""
    import jax

    from mp_former_tpu.video.criterion import VideoHungarianMatcher

    rng = np.random.RandomState(0)
    b, q, n, t, h, w = 1, 6, 5, 2, 8, 8
    matcher = VideoHungarianMatcher(2.0, 5.0, 5.0, num_points=32)
    logits = jnp.asarray(rng.randn(b, q, 4), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, t, h, w), jnp.float32)
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, 3, (b, n)), jnp.int32),
        masks=jnp.asarray(rng.rand(b, n, t, 4 * h, 4 * w) > 0.5),
        valid=jnp.asarray([[True, True, False, False, False]]))
    cost = np.asarray(matcher.cost(logits, masks, targets, jax.random.PRNGKey(0)))
    real_max = cost[:, :, :2].max()
    np.testing.assert_allclose(cost[:, :, 2:], real_max + 1.0, rtol=1e-5)


def test_compressed_rle_decode_roundtrip():
    """_seg_to_mask decodes compressed-string RLE counts (pycocotools
    rleFrString semantics); encoder here mirrors rleToString."""
    from mp_former_tpu.video.ytvis import _seg_to_mask

    def encode_counts(cnts):
        s = bytearray()
        for i, x in enumerate(cnts):
            if i > 2:
                x -= cnts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                s.append(c + 48)
        return bytes(s).decode("ascii")

    rng = np.random.RandomState(0)
    h, w = 23, 31
    m = rng.rand(h, w) > 0.6
    # column-major run lengths starting with a (possibly 0) run of 0s
    flat = m.T.reshape(-1).astype(np.uint8)
    counts, val, run = [], 0, 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            val, run = v, 1
    counts.append(run)
    seg = {"size": [h, w], "counts": encode_counts(counts)}
    got = _seg_to_mask(seg, h, w)
    np.testing.assert_array_equal(got, m)


def test_position_embedding_sine3d_matches_torch():
    """3D sine PE vs the reference PositionEmbeddingSine3D math
    (mask2former_video position_encoding.py:29-57, normalize=True)."""
    import math

    import torch

    from mp_former_tpu.models.transformer_decoder.position_encoding import (
        position_embedding_sine3d)

    t, h, w, f = 3, 5, 7, 16
    scale = 2 * math.pi
    mask = torch.zeros((1, t, h, w), dtype=torch.bool)
    not_mask = ~mask
    z = not_mask.cumsum(1, dtype=torch.float32)
    y = not_mask.cumsum(2, dtype=torch.float32)
    x = not_mask.cumsum(3, dtype=torch.float32)
    eps = 1e-6
    z = z / (z[:, -1:, :, :] + eps) * scale
    y = y / (y[:, :, -1:, :] + eps) * scale
    x = x / (x[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(f, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / f)
    dim_tz = torch.arange(2 * f, dtype=torch.float32)
    dim_tz = 10000 ** (2 * (dim_tz // 2) / (2 * f))
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    pz = z[..., None] / dim_tz
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=5).flatten(4)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=5).flatten(4)
    pz = torch.stack((pz[..., 0::2].sin(), pz[..., 1::2].cos()), dim=5).flatten(4)
    want = (torch.cat((py, px), dim=4) + pz).numpy()[0]  # (T, H, W, C)

    got = np.asarray(position_embedding_sine3d(t, h, w, f))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_video_eval_sharded_matches_single(tmp_path):
    """inference_on_video_dataset(mesh=...) batches clips across devices;
    results must equal the single-device loop (distributed video eval,
    mirror of engine/eval_loop.py device sharding)."""
    import cv2

    from mp_former_tpu.parallel.mesh import create_mesh
    from mp_former_tpu.video.eval_loop import inference_on_video_dataset

    cfg = _video_cfg()
    cfg.defrost()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.TPU.MESH_SHAPE = [2]
    cfg.freeze()
    t, h, w = 4, 64, 64
    rng = np.random.RandomState(5)
    recs = []
    for vi in range(3):  # 3 videos on 2 devices: one full + one padded group
        frame_dir = tmp_path / f"v{vi}"
        frame_dir.mkdir()
        file_names = []
        for fi in range(t):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            img[8:40, 8:40] = (250, 10, 10)
            p = str(frame_dir / f"{fi:05d}.jpg")
            cv2.imwrite(p, img)
            file_names.append(p)
        poly = [[8, 8, 40, 8, 40, 40, 8, 40]]
        recs.append({
            "video_id": vi + 1, "height": h, "width": w, "length": t,
            "file_names": file_names,
            "annotations": [{
                "id": vi + 1, "category_id": 0, "iscrowd": 0,
                "segmentations": [poly] * t, "areas": [1024] * t,
            }],
        })

    model = build_model(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, t, h, w, 3), jnp.float32),
                        None, train=False)

    single = inference_on_video_dataset(cfg, model, params, recs)
    mesh = create_mesh(cfg, jax.devices()[:2])
    sharded = inference_on_video_dataset(cfg, model, params, recs, mesh=mesh)
    for k, v in single["segm"].items():
        a, b = float(v), float(sharded["segm"][k])
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6, err_msg=k)


def test_video_criterion_accepts_external_assignments():
    """The unified Trainer always forwards assignments= (host-exact scipy
    matcher path, engine/trainer.py:146-157); the video criterion must
    accept it. Passing the same assignments the in-program matcher would
    compute must reproduce the default path exactly (rng is consumed
    identically on both sides, models/criterion.py:516-518)."""
    from mp_former_tpu.models.matcher import hungarian_assign

    cfg = _video_cfg()
    model = build_model(cfg)
    b, t, h, w = 1, 2, 64, 64
    rng = np.random.RandomState(3)
    clips = jnp.asarray(rng.rand(b, t, h, w, 3).astype(np.float32) * 255)
    params = model.init({"params": jax.random.PRNGKey(0)}, clips, None,
                        train=False)
    out = model.apply(params, clips, None, train=True,
                      rngs={"dropout": jax.random.PRNGKey(5)})

    n = 4
    masks = np.zeros((b, n, t, h, w), bool)
    masks[:, 0, :, 8:40, 8:40] = True
    masks[:, 1, 1, 16:48, 16:48] = True
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, 5, (b, n)), jnp.int32),
        masks=jnp.asarray(masks),
        valid=jnp.asarray([[True, True, False, False]]),
    )
    criterion = build_video_criterion(cfg)
    key = jax.random.PRNGKey(7)
    base = criterion(out, targets, key)

    # reproduce the in-program assignment externally (trainer cost pass)
    from mp_former_tpu.structures import Targets
    tgt = Targets(labels=targets.labels,
                  masks=targets.masks,
                  boxes=jnp.zeros(targets.labels.shape + (4,), jnp.float32),
                  valid=targets.valid)
    costs, _ = criterion.layer_costs(out, tgt, key)
    col_valid = jnp.broadcast_to(
        targets.valid[None], (costs.shape[0],) + targets.valid.shape)
    assignments = hungarian_assign(costs, col_valid=col_valid)

    ext = criterion(out, targets, key, assignments=assignments)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(ext[k]), rtol=1e-6,
            err_msg=f"loss {k} differs between in-program and external "
                    "assignments")


def test_video_per_layer_loss_masks_api():
    """Regression: VideoSetCriterion.loss_masks T-folds then must reach the
    BASE stacked loss — dynamic dispatch routed the folded 4D input back
    into the video loss_masks_stacked override, which unpacks 6 dims."""
    cfg = _video_cfg()
    criterion = build_video_criterion(cfg)
    b, q, n, t, h, w, hg, wg = 1, 6, 4, 2, 16, 16, 64, 64
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.randn(b, q, t, h, w).astype(np.float32))
    gt = np.zeros((b, n, t, hg, wg), bool)
    gt[:, 0, :, 8:40, 8:40] = True
    gt[:, 1, 1, 20:60, 20:60] = True
    qidx = jnp.asarray(rng.randint(0, q, (b, n)), jnp.int32)
    valid = jnp.asarray([[True, True, False, False]])
    out = criterion.loss_masks(pred, qidx, jnp.asarray(gt), valid,
                               num_masks=2.0, rng=jax.random.PRNGKey(7))
    assert set(out) == {"loss_mask", "loss_dice"}
    for v in out.values():
        assert v.shape == ()
        assert np.isfinite(float(v))
