"""Video training through the full Trainer engine (loader + GSPMD mesh +
checkpoints), mirroring the image path (reference train_net_video.py uses
the same d2 DefaultTrainer as images)."""

import json

import numpy as np
import pytest


@pytest.fixture
def ytvis_records(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    records = []
    for vid in range(3):
        frames = []
        for fi in range(4):
            p = str(tmp_path / f"v{vid}_f{fi}.jpg")
            cv2.imwrite(p, (rng.rand(64, 96, 3) * 255).astype(np.uint8))
            frames.append(p)
        records.append({
            "video_id": vid, "height": 64, "width": 96, "length": 4,
            "file_names": frames,
            "annotations": [{
                "id": 1, "category_id": 1, "iscrowd": 0,
                "segmentations": [[[8, 8, 40, 8, 40, 40, 8, 40]]] * 4,
                "areas": [1024] * 4,
            }],
        })
    return records


def test_video_trainer_two_steps(ytvis_records, tmp_path, monkeypatch):
    import jax.numpy as jnp

    import mp_former_tpu.video  # noqa: F401
    from mp_former_tpu.config import (add_deeplab_config,
                                      add_maskformer2_config,
                                      add_maskformer2_video_config, get_cfg)
    from mp_former_tpu.data.loader import TrainLoader
    from mp_former_tpu.engine.trainer import Trainer
    from mp_former_tpu.engine.train_step import Batch
    from mp_former_tpu.models import build_model
    from mp_former_tpu.video import VideoTargets
    from mp_former_tpu.video.criterion import build_video_criterion
    from mp_former_tpu.video.ytvis import YTVISDatasetMapper

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
        "MODEL.MASK_FORMER.DEC_LAYERS", "3",
        "MODEL.MASK_FORMER.DROPOUT", "0.0",
        "MODEL.MASK_FORMER.TRAIN_NUM_POINTS", "128",
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "INPUT.MAX_SIZE_TRAIN", "96",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "TPU.MAX_INSTANCES", "4",
        "TPU.MESH_SHAPE", "[1]",
        "INPUT.MIN_SIZE_TEST", "64",
        "DATASETS.TEST", "('synth_ytvis_val',)",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ])
    model = build_model(cfg)
    mapper = YTVISDatasetMapper(cfg, is_train=True,
                                max_instances=cfg.TPU.MAX_INSTANCES)

    def collate(samples):
        return Batch(
            images=jnp.asarray(np.stack([s["image"] for s in samples])),
            targets=VideoTargets(
                labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
                masks=jnp.asarray(np.stack([s["masks"] for s in samples])),
                valid=jnp.asarray(np.stack([s["valid"] for s in samples]))))

    loader = TrainLoader(ytvis_records, mapper, 2, collate_fn=collate,
                         filter_empty=True)
    trainer = Trainer(cfg, loader, model=model,
                      criterion=build_video_criterion(cfg))
    trainer.train(0)
    loader.close()
    # metrics written with the video loss schema, checkpoint saved
    metrics = [json.loads(l)
               for l in open(tmp_path / "out" / "metrics.json")]
    assert any("loss_dice" in m for m in metrics)
    assert (tmp_path / "out" / "checkpoints" / "2").is_dir()

    # Trainer.test routes video models to whole-clip YTVIS evaluation
    from mp_former_tpu.data.catalog import DatasetCatalog

    if "synth_ytvis_val" not in DatasetCatalog:
        DatasetCatalog.register("synth_ytvis_val", lambda: ytvis_records)
    results = trainer.test(max_images=2)
    assert results is not None and "AP" in results["segm"]
