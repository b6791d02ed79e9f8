"""Benchmark: single-chip segmentation inference throughput (images/sec).

Flagship config: R50 MaskFormer, COCO instance, 1024x1024 LSJ eval resolution
(reference Base-COCO-InstanceSegmentation.yaml INPUT.IMAGE_SIZE: 1024), in
the TPU-native inference configuration: bf16 compute, head-shared deformable
sampling (TPU.SAMPLING_ENGINE=headshare — 8x fewer gather rows; a gated,
trained-from-scratch deviation from the reference's per-head sampling
locations), and the Pallas tap-weighting kernel. The reference-exact
configuration (packed2x2/fp32) and the full measurement ladder are in
PERFORMANCE.md.

Throughput is measured as a STREAM: one jit invocation runs a lax.scan over
STREAM_LEN images (B=1 each — batching >1 was measured slower, the gather
rows dominate and scale linearly). This backend charges a fixed ~30 ms
per jit invocation regardless of program size (measured: an empty program
and a 2000-op scan both cost ~30 ms/call); the reference's GPU serving path
amortizes its launch overhead with CUDA-graph-style streams, and the scan
is the TPU-native equivalent. Device work per image is unchanged (~37 ms);
single-invocation latency stays reported in PERFORMANCE.md (60 ms/img).
The stream also collapses run-to-run variance (0.2% spread vs the +/-10%
that made the round-2 driver capture land 12% under the builder's number).

Each measurement runs in its OWN SUBPROCESS: the remote TPU runtime client
can panic (abort the whole process) when re-executing large novel train
programs (PERFORMANCE.md round 4, "anatomy of the runtime abort"); process
isolation means one crashed section degrades to null instead of destroying
the whole artifact, and the persistent compile cache keeps the per-section
cost to one program load.

Baseline: Mask2Former R50 reports 8.6 fps on V100 (paper, Table); the
north-star targets A100-class throughput — we take 2x V100 = 17.2 img/s as
the A100 estimate (BASELINE.json: no in-repo throughput number exists).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# make the CPU backend available for fast param init (eager init over the
# remote TPU tunnel pays per-op round trips; jitted init compiles for ~10 min)
_plat = os.environ.get("JAX_PLATFORMS")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

A100_BASELINE_IMG_PER_SEC = 17.2


V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16 (public spec: 197 TFLOP/s)

STREAM_LEN = 16  # images per jit invocation (per-image work is flat in
SIZE = 1024      # stream length; 16 amortizes the ~30 ms invocation floor)

# Engine override lists per bench section. Inference runs the Pallas
# tap-weighting kernel (measured faster in both engines); the train sections
# measure the Trainer's SHIPPED configuration (PALLAS_TAP_WEIGHTING defaults
# False — the configuration whose sustained multi-thousand-step runs are the
# PERFORMANCE.md evidence; the kernel-in-train-program variant trips the
# runtime client's re-execution abort).
SECTIONS = {
    "infer_headshare": ["TPU.COMPUTE_DTYPE", "bfloat16",
                        "TPU.SAMPLING_ENGINE", "headshare",
                        "TPU.PALLAS_TAP_WEIGHTING", "True"],
    "infer_ref": ["TPU.COMPUTE_DTYPE", "bfloat16",
                  "TPU.PALLAS_TAP_WEIGHTING", "True"],
    "train_headshare": ["TPU.COMPUTE_DTYPE", "bfloat16",
                        "TPU.SAMPLING_ENGINE", "headshare"],
    "train_ref": ["TPU.COMPUTE_DTYPE", "bfloat16"],
}


def _measure_engine(overrides):
    """Returns (img_per_sec, flops_per_img or None) for one engine config."""
    import statistics

    import jax
    import jax.numpy as jnp
    from mp_former_tpu.models import build_model
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    cfg.merge_from_list(list(overrides))
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    images_np = rng.rand(STREAM_LEN, 1, SIZE, SIZE, 3).astype(np.float32) * 255
    # jitted init at tiny size (param shapes are image-size independent)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(
        lambda k, im: model.init({"params": k}, im, None, train=False)
    )(jax.random.PRNGKey(0), small)
    images = jnp.asarray(images_np)

    @jax.jit
    def fwd_stream(p, ims):
        def body(_, im):
            out = model.apply(p, im, None, train=False)
            # tiny reductions: fetching these scalars forces full execution
            # on remote backends where block_until_ready returns early
            return (), (jnp.sum(out["pred_logits"]),
                        jnp.sum(out["pred_masks"][:, :, ::64, ::64]))
        _, (a, b) = jax.lax.scan(body, (), ims)
        return jnp.sum(a), jnp.sum(b)

    # warmup + compile (host fetch = true sync)
    a, b = fwd_stream(params, images)
    float(a), float(b)

    flops = None
    try:
        # XLA's cost analysis counts a lax.scan body ONCE regardless of
        # trip count (verified: scan16-of-matmul reports the same flops as
        # one matmul), so the stream program's count IS the per-image work
        ca = fwd_stream.lower(params, images).compile().cost_analysis()
        if ca and "flops" in ca:
            flops = float(ca["flops"])
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    # Keep timing loops until the best two agree within 3% (min 3, max 10
    # loops): the converged best is the least-contended measurement.
    dts = []
    for k in range(10):
        t0 = time.perf_counter()
        sums = [fwd_stream(params, images) for _ in range(2)]
        for a, b in sums:
            float(a), float(b)
        dts.append((time.perf_counter() - t0) / 2)
        s = sorted(dts)
        if k >= 2 and (s[1] - s[0]) / s[0] < 0.03:
            break
    best_dt = min(dts)
    print(f"# loops={len(dts)} best={STREAM_LEN / best_dt:.2f} "
          f"median={STREAM_LEN / statistics.median(dts):.2f} img/s",
          file=sys.stderr)
    return STREAM_LEN / best_dt, flops


TRAIN_BATCH = 8   # flagship train-step shape (PERFORMANCE.md round-2 ladder:
TRAIN_SIZE = 512  # B=8 @ 512px LSJ is the on-chip training evidence recipe)


def _measure_train(overrides):
    """(step_seconds, flops_per_step or None) for the flagship train step
    (fwd + DN + criterion + optimizer update) under one engine config
    (VERDICT round-4 #5: train-perf regressions must reach BENCH_r*.json)."""
    import statistics

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from mp_former_tpu.engine.optimizer import build_optimizer
    from mp_former_tpu.engine.train_step import (Batch, create_train_state,
                                                 make_train_step)
    from mp_former_tpu.models import build_model
    from mp_former_tpu.models.criterion import build_criterion
    from mp_former_tpu.structures import Targets

    cfg = _flagship_cfg()
    cfg.merge_from_list(list(overrides))
    model = build_model(cfg)
    criterion = build_criterion(cfg)

    # the exact layout the Trainer sustains for thousands of steps on this
    # runtime (PERFORMANCE.md round 4): uint8 images, bit-packed GT masks at
    # the grid-loss 1/4 stride, DONATED state. donate=False + full-res GT
    # masks builds a larger program that trips the client's re-execution bug
    # (dies on the 2nd call with INVALID_ARGUMENT).
    from mp_former_tpu.structures import pack_bool_masks

    b, s, n = TRAIN_BATCH, TRAIN_SIZE, 100
    ms = s // 4  # grid-mode GT stride (resolve_gt_mask_stride)
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, ms, ms), bool)
    masks[:, :10, ms // 8: ms // 2, ms // 8: ms // 2] = True
    batch = Batch(
        images=jnp.asarray((rng.rand(b, s, s, 3) * 255).astype(np.uint8)),
        targets=Targets(
            labels=jnp.asarray(rng.randint(0, 80, (b, n)), jnp.int32),
            masks=jnp.asarray(pack_bool_masks(masks)),
            boxes=jnp.asarray(rng.rand(b, n, 4), jnp.float32),
            valid=jnp.asarray(
                np.tile([True] * 10 + [False] * (n - 10), (b, 1)))))
    params = jax.jit(lambda k, i, t: model.init(
        {"params": k, "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, i, t, train=True))(
        jax.random.PRNGKey(0), batch.images, batch.targets)["params"]
    jax.tree.map(lambda x: x.block_until_ready(), params)
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, criterion, tx, donate=True)

    flops = None
    try:
        ca = step.lower(state, batch,
                        jax.random.PRNGKey(3)).compile().cost_analysis()
        if ca and "flops" in ca:
            flops = float(ca["flops"])
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        flops = None

    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    float(metrics["total_loss"])  # sync (compile + first exec)

    dts = []
    for k in range(8):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(4 + k))
        float(metrics["total_loss"])  # host fetch = true sync per step
        dts.append(time.perf_counter() - t0)
        sdts = sorted(dts)
        if k >= 2 and (sdts[1] - sdts[0]) / sdts[0] < 0.03:
            break
    best = min(dts)
    print(f"# train loops={len(dts)} best={best:.3f}s "
          f"median={statistics.median(dts):.3f}s", file=sys.stderr)
    return best, flops


def _run_section(name):
    """Run one measurement in this process; print {"value","flops"} JSON."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    fn = _measure_engine if name.startswith("infer") else _measure_train
    value, flops = fn(SECTIONS[name])
    print(json.dumps({"value": value, "flops": flops}))


def _section_subprocess(name, timeout=3600):
    """Run a section isolated in a child process; None-pair on any failure."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=timeout)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            print(f"# section {name} FAILED rc={r.returncode}",
                  file=sys.stderr)
            return None, None
        d = json.loads(r.stdout.strip().splitlines()[-1])
        return d["value"], d["flops"]
    except Exception as e:  # noqa: BLE001 — a dead section must not kill the artifact
        print(f"# section {name} FAILED {type(e).__name__}: {e}",
              file=sys.stderr)
        return None, None


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        _run_section(sys.argv[2])
        return

    # TPU-optimized engine (throughput headline; headshare trades ~4 AP at
    # convergence for 3.5x speed — see PERFORMANCE.md round-4 A/B)
    img_per_sec, flops = _section_subprocess("infer_headshare")
    # reference-exact engine (hosts reference checkpoints unchanged):
    # packed2x2 per-head sampling + Pallas tap weighting, bf16
    ref_img_per_sec, ref_flops = _section_subprocess("infer_ref")

    # flagship train step, both engines (VERDICT round-4 #5: train-perf
    # regressions must land in BENCH_r*.json, not prose)
    train_s, train_flops = _section_subprocess("train_headshare")
    ref_train_s, ref_train_flops = _section_subprocess("train_ref")

    def rnd(x):
        return round(x, 3) if x is not None else None

    def mfu(ips, fl):
        return (round(ips * fl / V5E_BF16_PEAK_FLOPS, 4)
                if ips and fl else None)

    def train_mfu(step_s, fl):
        return (round(fl / step_s / V5E_BF16_PEAK_FLOPS, 4)
                if step_s and fl else None)

    def vs_base(ips):
        return rnd(ips / A100_BASELINE_IMG_PER_SEC) if ips else None

    print(json.dumps({
        "metric": "coco_r50_1024_infer_images_per_sec",
        "value": rnd(img_per_sec),
        "unit": "img/s",
        "vs_baseline": vs_base(img_per_sec),
        "stream_len": STREAM_LEN,
        "mfu": mfu(img_per_sec, flops),
        "flops_per_img": flops,
        "ref_exact": {
            "metric": "coco_r50_1024_infer_ref_exact_images_per_sec",
            "value": rnd(ref_img_per_sec),
            "vs_baseline": vs_base(ref_img_per_sec),
            "mfu": mfu(ref_img_per_sec, ref_flops),
        },
        "train": {
            "metric": "coco_r50_train_step_seconds",
            "value": rnd(train_s),
            "unit": "s/step",
            "batch": TRAIN_BATCH,
            "size": TRAIN_SIZE,
            "mfu": train_mfu(train_s, train_flops),
            "ref_exact": {
                "value": rnd(ref_train_s),
                "mfu": train_mfu(ref_train_s, ref_train_flops),
            },
        },
    }))


if __name__ == "__main__":
    main()
