#!/usr/bin/env python3
"""Headline benchmark: SlowFast-R50 8x8 Kinetics-400 30-view eval throughput.

Default invocation prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": R,
   "second_north_star": {...}}

where second_north_star carries BASELINE.md's other headline model
(SlowFastShuffleNetV2 w2.0 16x2 112², the `--mode shufflenetv2` metric) so
the driver-recorded artifact covers both north stars in one invocation.

measuring the jitted eval forward (post-softmax multi-view scores,
TEST_CROP 256, 32-frame clips — the reference's standard 30-view test
configuration, reference: tools/test_net.py + configs/Kinetics/
SLOWFAST_8x8_R50.yaml) in bf16 through plain XLA (the fastest measured
path; the Pallas fused engine is a tested opt-in that LOSES end-to-end —
PERF.md, cfg.TPU.FUSED_EVAL default off).

Extra modes (each prints its own JSON line; `--mode all` prints all):
  --mode train         jitted train-step clips/s at the flagship config
  --mode shufflenetv2  second north-star model (BASELINE.md):
                       SlowFastShuffleNetV2 w2.0 16x2 112² eval throughput
                       (the published headline efficient variant,
                       configs/Kinetics/SLOWFAST_SHUFFLENETV2_16x2_112.yaml)
  --mode int8          TPU.INT8_EVAL flagship eval (calibrated int8
                       pointwise convs) + accuracy proxy vs the fp forward
  --mode int8_spatial  TPU.INT8_SPATIAL on top: the k>1 convs quantized
                       too (the whole conv stack int8)
  --mode detection     AVA detection path: SlowFast-R50 32x2 + RoIAlign
                       head (configs/AVA/SLOWFAST_32x2_R50_SHORT.yaml),
                       MAX_BOXES-padded boxes per clip
  --mode export        AOT serving artifact (engine/export.py): exported
                       StableHLO forward timed at the bench_eval operating
                       point — must match the live jit
  --mode pipeline      eval loop fed by the synthetic loader through
                       prefetch_to_device (host decode/collate overlap on)
  --mode mfu           TWO JSON lines: model FLOPs utilization of the eval
                       forward AND of the full train step (each from XLA
                       cost analysis vs the chip's nominal bf16 peak; the
                       train line runs a full train-step measurement)

vs_baseline compares against an A100 PyTorch estimate for the same model
(~135 clips/s for SlowFast-R50 eval fwd at 256², fp16, batch-optimal; no
official number is published — reference README/MODEL_ZOO publish accuracy
only, see BASELINE.md).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_CLIPS_PER_SEC = 135.0
V5E_BF16_PEAK_TFLOPS = 197.0

# Last-good-headline persistence (saturation fallback, eval mode). The
# shared dev chip sees multi-hour co-tenant saturation; if a whole retry
# budget expires without one quiet probe window, the headline invocation
# emits the most recent SUCCESSFUL measurement explicitly marked stale
# instead of producing no artifact for the round.
HEADLINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tmp",
    "bench_headline_cache.json")


def _persist_headline(headline, cache_path=HEADLINE_CACHE):
    """Write the just-measured headline dict (+ measured_at UTC stamp)."""
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        record = dict(headline)
        record["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(cache_path, "w") as f:
            json.dump(record, f)
    except OSError:
        pass


def _stale_headline(reason, cache_path=HEADLINE_CACHE, artifact_dir=None):
    """Load the persisted last-good headline, marked stale; None if absent.

    The returned line keeps the original metric/value/measured_at and adds
    ``stale: true`` + the saturation error as ``stale_reason`` so the
    artifact can never be mistaken for a fresh measurement.

    The tmp/ cache is untracked and does not survive the driver's
    between-round cleanup (or a VM migration), so when it is absent the
    newest COMMITTED driver artifact ``BENCH_r*.json`` (whose ``parsed``
    field is the verbatim headline of that round) serves as the last-good
    source — marked stale the same way, with its round of origin."""
    cached = None
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
    else:
        repo = artifact_dir or os.path.dirname(os.path.abspath(__file__))
        rounds = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
        for art_path in reversed(rounds):
            try:
                with open(art_path) as f:
                    art = json.load(f)
                parsed = art.get("parsed")
                if art.get("rc") == 0 and isinstance(parsed, dict) \
                        and "value" in parsed and not parsed.get("stale"):
                    cached = dict(parsed)
                    cached["measured_at"] = os.path.basename(art_path)
                    break
            except (OSError, ValueError):
                continue
    if cached is None:
        return None
    cached["stale"] = True
    cached["stale_reason"] = str(reason)[:200]
    return cached


def _flagship_cfg():
    import jax

    from efficient_slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 7
    cfg.MODEL.NUM_CLASSES = 400
    cfg.DATA.NUM_FRAMES = 32
    cfg.DATA.CROP_SIZE = 224       # head pool table (training crop)
    cfg.DATA.TEST_CROP_SIZE = 256  # eval resolution (fully-conv head)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    if jax.default_backend() == "cpu":  # keep the smoke path cheap
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 64
        cfg.DATA.TEST_CROP_SIZE = 64
    return cfg


def _is_transient_oom(e: Exception) -> bool:
    """True for allocation failures worth retrying/downsizing (co-tenant
    HBM pressure on the shared dev chip, or a genuinely too-big footprint);
    everything else is a real error and must surface immediately."""
    return ("RESOURCE_EXHAUSTED" in str(e)
            or "Out of memory" in str(e)
            # compile-time permanent HBM OOM (surfaces via the remote
            # compile helper as "Ran out of memory in memory space hbm");
            # a smaller batch is the right response, same as runtime OOM
            or "Ran out of memory" in str(e)
            or "ResourceExhausted" in type(e).__name__)


def _sync(o):
    """block_until_ready is unreliable on tunneled platforms; a host fetch
    of a reduction is an unambiguous execution barrier."""
    import jax.numpy as jnp

    return float(jnp.asarray(o).astype(jnp.float32).sum())


def _eval_inputs(cfg, batch):
    import jax
    import jax.numpy as jnp

    s = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    key = jax.random.PRNGKey(1)
    return [
        jax.random.normal(key, (batch, t // cfg.SLOWFAST.ALPHA, s, s, 3),
                          jnp.bfloat16),
        jax.random.normal(key, (batch, t, s, s, 3), jnp.bfloat16),
    ]


def bench_eval(cfg, emit):
    import functools

    import jax

    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(cfg, model, rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = 2 if on_cpu else 256  # measured best on v5e (515 vs 497 @128)
    inputs = _eval_inputs(cfg, batch)
    fwd = make_forward(cfg, model)

    _sync(fwd(variables, inputs))  # compile + warmup
    _sync(fwd(variables, inputs))
    iters = 3 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, inputs)
    _sync(out)  # dispatch is pipelined; the final fetch drains the stream
    dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        "metric": "SlowFast-R50 8x8 K400 30-view eval fwd throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / A100_BASELINE_CLIPS_PER_SEC, 3),
    })
    return value


def bench_train(cfg, emit):
    import jax
    import jax.numpy as jnp

    from efficient_slowfast_tpu.engine.state import (create_train_state,
                                                     make_train_step)
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg.DATA.TEST_CROP_SIZE = cfg.DATA.CROP_SIZE  # train runs at CROP_SIZE
    cfg.TPU.REMAT = not on_cpu  # stage remat fits 2x the batch (README table)
    # s2-only remat keeps the batch-64 headroom while skipping the s3-s5
    # backward recompute: 79.4 vs 75.6 clips/s remat-all (PERF.md r3 sweep)
    cfg.TPU.REMAT_STAGES = [2]
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(cfg, model, rng)
    step = make_train_step(cfg, model, tx)
    batch = 2 if on_cpu else 64  # with remat; plain bf16 fits 32
    s, t = cfg.DATA.CROP_SIZE, cfg.DATA.NUM_FRAMES
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (batch, t // cfg.SLOWFAST.ALPHA, s, s, 3),
                          jnp.bfloat16),
        jax.random.normal(key, (batch, t, s, s, 3), jnp.bfloat16),
    ]
    labels = jnp.zeros((batch,), jnp.int32)

    state, m = step(state, inputs, labels, 0.1, rng)  # compile
    _sync(m["loss"])
    iters = 2 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, inputs, labels, 0.1, rng)
    _sync(m["loss"])
    dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        "metric": "SlowFast-R50 8x8 train step throughput (fwd+bwd+opt)",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
    })
    return value


def bench_shufflenetv2(emit):
    """Second north-star model (BASELINE.md): SlowFastShuffleNetV2 w2.0,
    16x2 clips at 112² — the fork's published headline efficient variant
    (reference configs + README "Pretrained models" table; repo config
    configs/Kinetics/SLOWFAST_SHUFFLENETV2_16x2_112.yaml)."""
    import jax

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs/Kinetics/SLOWFAST_SHUFFLENETV2_16x2_112.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if on_cpu:  # keep the smoke path cheap
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 56
        cfg.DATA.TEST_CROP_SIZE = 56

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = 2 if on_cpu else 512  # measured best on v5e (r2: 5146 @512)
    inputs = _eval_inputs(cfg, batch)
    fwd = make_forward(cfg, model)

    _sync(fwd(variables, inputs))  # compile + warmup
    _sync(fwd(variables, inputs))
    iters = 3 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, inputs)
    _sync(out)
    dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        "metric": "SlowFastShuffleNetV2 w2.0 16x2 112^2 eval fwd throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
    })
    return value


def bench_i3d_nln(emit):
    """I3D R50 + 5 non-local blocks (configs/Kinetics/I3D_NLN_8x8_R50.yaml,
    upstream MODEL_ZOO row 74.0 top-1) at the 30-view eval shapes — the
    throughput provenance for README's I3D-NLN row (VERDICT r3 weak #3);
    exercises the flash-attention NLN path at 256² (ops/pallas)."""
    import jax

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs/Kinetics/I3D_NLN_8x8_R50.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if on_cpu:  # keep the smoke path cheap
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 64
        cfg.DATA.TEST_CROP_SIZE = 64

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = 2 if on_cpu else 128  # NLN affinity maps need more HBM than R50
    s = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    import jax.numpy as jnp
    inputs = [jax.random.normal(jax.random.PRNGKey(1), (batch, t, s, s, 3),
                                jnp.bfloat16)]
    fwd = make_forward(cfg, model)

    _sync(fwd(variables, inputs))  # compile + warmup
    _sync(fwd(variables, inputs))
    iters = 3 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, inputs)
    _sync(out)
    dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        # label the ACTUAL shapes — the CPU smoke path shrinks them, and a
        # "256^2" line measured at 64^2 would be false provenance (round-4
        # review finding #6)
        "metric": f"I3D-NLN R50 {t}f {s}^2 eval fwd throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "batch": batch,
        "vs_baseline": None,
    })
    return value


def bench_detection(emit):
    """AVA detection eval forward: SlowFast-R50 32x2 + RoIAlign head at the
    configs/AVA/SLOWFAST_32x2_R50_SHORT.yaml operating point (res5 stride 1
    dilation 2, ROI resolution 7, scale factor 16, 80 classes).

    Measures the jitted (variables, inputs, boxes) → per-box sigmoid scores
    program on the shapes the AVA test loader emits: a (S, 2S) short-side-S
    canvas with MAX_BOXES statically padded boxes per clip
    (data/ava_dataset.py). Reference anchor: tools/test_net.py detection
    branch + slowfast/models/head_helper.py::ResNetRoIHead.
    """
    import jax
    import jax.numpy as jnp

    from efficient_slowfast_tpu.data.ava_dataset import MAX_BOXES
    from efficient_slowfast_tpu.engine.state import (
        create_train_state, make_detection_forward)
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg = _flagship_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.ALIGNED = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 7
    cfg.MODEL.NUM_CLASSES = 80
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.MODEL.LOSS_FUNC = "bce"
    # AVA backbone trunk: res5 keeps spatial stride 1 with dilation 2
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [1, 1]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [2, 2]]

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_detection_forward(cfg, model)

    batch = 2 if on_cpu else 32
    s = cfg.DATA.TEST_CROP_SIZE  # AVA eval canvas: short side S, width 2S
    t = cfg.DATA.NUM_FRAMES
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (batch, t // cfg.SLOWFAST.ALPHA, s, 2 * s, 3),
                          jnp.bfloat16),
        jax.random.normal(key, (batch, t, s, 2 * s, 3), jnp.bfloat16),
    ]
    # canvas-pixel boxes, MAX_BOXES per clip (the loader's static padding —
    # padded rows run through RoIAlign too, exactly as in perform_test)
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, (batch, MAX_BOXES, 1), maxval=s * 1.2)
    y1 = jax.random.uniform(k2, (batch, MAX_BOXES, 1), maxval=s * 0.6)
    boxes = jnp.concatenate(
        [x1, y1, x1 + s * 0.5, y1 + s * 0.4], axis=-1).astype(jnp.float32)

    _sync(fwd(variables, inputs, boxes))  # compile + warmup
    _sync(fwd(variables, inputs, boxes))
    iters = 2 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, inputs, boxes)
    _sync(out)
    dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        "metric": "SlowFast-R50 32x2 AVA detection eval fwd throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
        "boxes_per_clip": MAX_BOXES,
    })
    return value


def bench_export(emit):
    """AOT serving artifact (engine/export.py): export the flagship
    serving forward, deserialize, and time the exported call on the same
    inputs as bench_eval — the artifact must serve at live-jit parity
    (it is the same XLA program, reloaded without the model zoo)."""
    import tempfile

    import jax

    from efficient_slowfast_tpu.engine.export import (export_serving,
                                                      load_serving)
    from efficient_slowfast_tpu.engine.state import create_train_state
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg = _flagship_cfg()
    if on_cpu:
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 32
        cfg.DATA.TEST_CROP_SIZE = 32

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as td:
        path = export_serving(cfg, state, os.path.join(td, "flagship"))
        size_mb = os.path.getsize(path) / 1e6
        serving = load_serving(path)
        del state, model
        batch = 2 if on_cpu else 256  # same operating point as bench_eval
        inputs = _eval_inputs(cfg, batch)
        _sync(serving._exported.call(inputs))  # compile + warmup
        _sync(serving._exported.call(inputs))
        iters = 3 if on_cpu else 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = serving._exported.call(inputs)
        _sync(out)
        dt = time.perf_counter() - t0

    value = batch * iters / dt / jax.device_count()
    emit({
        "metric": "SlowFast-R50 AOT serving-artifact eval throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / A100_BASELINE_CLIPS_PER_SEC, 3),
        "artifact_mb": round(size_mb, 1),
    })
    return value


def bench_int8(emit, spatial=False):
    """TPU.INT8_EVAL: calibrated int8 pointwise convs (ops/conv.py) on the
    flagship eval config. Reports throughput plus the accuracy proxy vs the
    fp forward on the same inputs (top-1 agreement + logit cosine).
    ``spatial=True`` additionally quantizes the k>1 convs
    (TPU.INT8_SPATIAL — the whole conv stack int8)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from efficient_slowfast_tpu.engine.quantize import calibrate_int8
    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    import gc

    on_cpu = jax.default_backend() == "cpu"
    batch = 2 if on_cpu else 256
    rng = jax.random.PRNGKey(0)

    # throughput FIRST, while the process memory profile matches the plain
    # bench (on the tunneled dev chip buffer frees are async RPCs — piling
    # models/executables up before the batch-256 run risks spurious OOM).
    # Weight VALUES don't affect timing, so the throughput leg runs on
    # random init; the accuracy proxy below trains real weights.
    cfg = _flagship_cfg()
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_SPATIAL = spatial
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # transient co-tenant HBM pressure here propagates to the caller's
    # with_contention_retry — ONE retry policy, owned by the wrapper
    calib_inputs = _eval_inputs(cfg, 2 if on_cpu else 32)
    variables = calibrate_int8(model, variables, [calib_inputs])
    fwd = make_forward(cfg, model)
    del calib_inputs
    gc.collect()

    # the quantized graph holds int8 copies NEXT TO the bf16 residuals, so
    # its peak HBM is higher than the fp forward's — fall back one batch
    # step on OOM rather than fail (letting async frees settle first); the
    # achieved batch is reported in the metric line. Non-OOM errors raise
    # immediately (this loop is a footprint fallback, not a retry policy).
    iters = 3 if on_cpu else 10
    inputs = None
    while True:
        try:
            inputs = _eval_inputs(cfg, batch)
            _sync(fwd(variables, inputs))  # compile + warm
            _sync(fwd(variables, inputs))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, inputs)
            _sync(out)
            dt = time.perf_counter() - t0
            break
        except Exception as e:
            if on_cpu or batch <= 16 or not _is_transient_oom(e):
                raise
            inputs = None
            jax.clear_caches()
            gc.collect()
            time.sleep(10)  # let tunneled dealloc RPCs drain
            batch //= 2
    value = batch * iters / dt / jax.device_count()
    del inputs
    jax.clear_caches()
    gc.collect()

    # trained-weights accuracy proxy through the REAL train + test engines
    # (VERDICT r3: random-init logits are near-uniform, so agreement on them
    # is a fragile signal — train briefly first, then compare 30-view runs)
    acc = _int8_accuracy_proxy(spatial)
    emit({
        "metric": ("SlowFast-R50 int8-full eval fwd throughput" if spatial
                   else "SlowFast-R50 int8-pointwise eval fwd throughput"),
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "batch": batch,
        "vs_baseline": round(value / A100_BASELINE_CLIPS_PER_SEC, 3),
        **acc,
    })
    return value


def _int8_accuracy_proxy(spatial):
    """Trained-weights int8 accuracy check (VERDICT r3 next #3).

    Briefly trains the flagship on the synthetic dataset via the real
    trainer (`engine.train.train` — real loader, LR policy, BN updates,
    checkpointing), then runs the REAL 30-view test engine twice from the
    saved checkpoint — fp and TPU.INT8_EVAL (auto-calibrated on the first
    held-out test batches, engine/test.py) — and compares ensembled top-1,
    per-clip top-1 agreement, and logit cosine. The synthetic task is
    learnable by memorization (clip content is a deterministic function of
    video id), so a few epochs produce confident, class-peaked logits and
    trained BN statistics — the distributions absmax calibration actually
    has to survive; `fp_mean_max_prob` is reported as evidence the fp
    logits are NOT near-uniform."""
    import shutil
    import tempfile

    import numpy as np

    import jax

    import importlib

    # engine/__init__ re-exports the `test` FUNCTION under the same name;
    # fetch the module itself for the TestMeter monkeypatch below
    test_mod = importlib.import_module("efficient_slowfast_tpu.engine.test")
    from efficient_slowfast_tpu.engine.train import train as run_train
    from efficient_slowfast_tpu.utils.meters import TestMeter

    on_cpu = jax.default_backend() == "cpu"
    out_dir = tempfile.mkdtemp(prefix="bench_int8_proxy_")

    def proxy_cfg():
        cfg = _flagship_cfg()
        cfg.OUTPUT_DIR = out_dir
        cfg.TRAIN.DATASET = "synthetic"
        cfg.TEST.DATASET = "synthetic"
        cfg.DATA.DECODING_BACKEND = "synthetic"
        # 64 synthetic train videos / 16 classes = 4 clips per class
        cfg.MODEL.NUM_CLASSES = 16
        cfg.TRAIN.BATCH_SIZE = 4 if on_cpu else 8
        cfg.TEST.BATCH_SIZE = 4 if on_cpu else 16
        # ~100 SGD steps at a stable LR: the color-watermarked synthetic
        # task (datasets.py _decode_clip) is learnable by memorization, but
        # batch-4/8 SGD at 0.02 diverges (measured: loss 2.8 → 28 in 10
        # iters); 0.005 converges to confident logits
        cfg.SOLVER.MAX_EPOCH = 1 if on_cpu else 12
        if on_cpu:  # keep the CPU smoke path minutes, not tens of minutes
            cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
        cfg.SOLVER.BASE_LR = 0.005
        cfg.SOLVER.WARMUP_EPOCHS = 0.0
        cfg.TRAIN.EVAL_PERIOD = 100  # no val leg — the test legs follow
        cfg.TRAIN.CHECKPOINT_PERIOD = cfg.SOLVER.MAX_EPOCH
        cfg.TPU.INT8_CALIB_BATCHES = 2
        cfg.DATA_LOADER.NUM_WORKERS = 2
        cfg.LOG_MODEL_INFO = False
        # bound H2D volume (tunneled dev chip): train canvas = test canvas
        cfg.DATA.TRAIN_JITTER_SCALES = [cfg.DATA.TEST_CROP_SIZE,
                                        cfg.DATA.TEST_CROP_SIZE]
        return cfg

    def run_capturing_test(cfg):
        """engine.test.test with per-clip (clip_id, pred) capture."""
        records = []

        class _Capture(TestMeter):
            def update_stats(self, preds, labels, clip_ids):
                records.append((np.asarray(clip_ids).copy(),
                                np.asarray(preds).copy()))
                super().update_stats(preds, labels, clip_ids)

        orig = test_mod.TestMeter
        test_mod.TestMeter = _Capture
        try:
            stats = test_mod.test(cfg)
        finally:
            test_mod.TestMeter = orig
        ids = np.concatenate([r[0] for r in records])
        preds = np.concatenate([r[1] for r in records])
        return stats, preds[np.argsort(ids)]

    import contextlib

    try:
        # the engines log json_stats to stdout; keep bench stdout JSON-only
        with contextlib.redirect_stdout(sys.stderr):
            cfg = proxy_cfg()
            run_train(cfg)

            cfg_fp = proxy_cfg()
            cfg_fp.TRAIN.ENABLE = False
            stats_fp, y_fp = run_capturing_test(cfg_fp)

            cfg_q = proxy_cfg()
            cfg_q.TRAIN.ENABLE = False
            cfg_q.TPU.INT8_EVAL = True
            cfg_q.TPU.INT8_SPATIAL = spatial
            stats_q, y_q = run_capturing_test(cfg_q)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    agree = float((y_q.argmax(-1) == y_fp.argmax(-1)).mean())
    cos = float((y_fp * y_q).sum()
                / max(np.linalg.norm(y_fp) * np.linalg.norm(y_q), 1e-12))
    top1_fp = float(stats_fp["top1_acc"])
    top1_q = float(stats_q["top1_acc"])
    return {
        "top1_fp_trained": round(top1_fp, 2),
        "top1_int8_trained": round(top1_q, 2),
        "top1_delta_pp": round(top1_q - top1_fp, 2),
        "per_clip_top1_agreement": round(agree, 4),
        "logit_cosine_vs_fp": round(cos, 6),
        # evidence the trained fp logits are confident, not near-uniform
        "fp_mean_max_prob": round(float(y_fp.max(-1).mean()), 4),
        "proxy_views": int(y_fp.shape[0]),
    }


def bench_pipeline(cfg, emit):
    """Eval loop fed by the synthetic loader through prefetch_to_device —
    exercises host decode/collate → device transfer overlap end-to-end."""
    import jax

    from efficient_slowfast_tpu.data.loader import (construct_loader,
                                                    prefetch_to_device)
    from efficient_slowfast_tpu.data.preprocess import make_test_preprocess
    from efficient_slowfast_tpu.engine.state import (create_train_state,
                                                     make_forward)
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.parallel.mesh import build_mesh

    on_cpu = jax.default_backend() == "cpu"
    cfg.TEST.DATASET = "synthetic"
    cfg.TEST.BATCH_SIZE = 8 if on_cpu else 32  # prefetch holds 2 batches
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2 if on_cpu else 10
    cfg.DATA_LOADER.NUM_WORKERS = 8

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_forward(cfg, model)
    preprocess = make_test_preprocess(cfg)
    loader = construct_loader(cfg, "test")

    # host-side loader throughput (decode+collate machinery, no device)
    n_host = 0
    t0 = time.perf_counter()
    for i, batch in enumerate(loader):
        n_host += batch["frames"].shape[0]
        if i >= (1 if on_cpu else 4):
            break
    host_clips = n_host / (time.perf_counter() - t0)

    # raw H2D bandwidth on a few clips (tunneled dev environments are
    # network-bound here; real TPU VMs do 10+ GB/s over PCIe)
    sample = next(iter(loader))["frames"][:4]
    d = jax.device_put(sample)
    _sync(d[:1, :1, :1, :1])
    t0 = time.perf_counter()
    d = jax.device_put(sample)
    _sync(d[:1, :1, :1, :1])
    h2d_gbps = sample.nbytes / (time.perf_counter() - t0) / 1e9
    del d, sample  # free HBM before the pipelined loop

    n_clips = 0
    out = None
    t0 = None
    for i, batch in enumerate(prefetch_to_device(
            loader, mesh, keys=("frames", "width", "spatial_idx", "portrait"),
            depth=2)):
        inputs = preprocess(batch["frames"], batch["width"],
                            batch["spatial_idx"], batch.get("portrait"))
        out = fwd(variables, inputs)
        if i == 0:  # first batch pays the compile; start timing after it
            _sync(out)
            t0 = time.perf_counter()
        else:
            n_clips += batch["frames"].shape[0]
        if i >= (3 if on_cpu else 6):
            break
    _sync(out)
    dt = time.perf_counter() - t0
    value = n_clips / dt / jax.device_count()
    emit({
        "metric": "SlowFast-R50 eval pipeline throughput (loader+prefetch+fwd)",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
        "host_loader_clips_per_sec": round(host_clips, 2),
        "h2d_gbps": round(h2d_gbps, 3),
    })
    return value


def bench_train_mfu(cfg, emit, train_clips_per_sec=None):
    """Train-step MFU: cost-analysis FLOPs of the full jitted train step
    (fwd+bwd+opt, incl. remat recompute) over the measured step time."""
    import jax
    import jax.numpy as jnp

    from efficient_slowfast_tpu.engine.state import (create_train_state,
                                                     make_train_step)
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg.DATA.TEST_CROP_SIZE = cfg.DATA.CROP_SIZE
    cfg.TPU.REMAT = not on_cpu
    cfg.TPU.REMAT_STAGES = [2]  # match bench_train's measured-best config
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)
    batch = 2 if on_cpu else 64
    s, t = cfg.DATA.CROP_SIZE, cfg.DATA.NUM_FRAMES
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (batch, t // cfg.SLOWFAST.ALPHA, s, s, 3),
                          jnp.bfloat16),
        jax.random.normal(key, (batch, t, s, s, 3), jnp.bfloat16),
    ]
    labels = jnp.zeros((batch,), jnp.int32)
    # make_train_step returns a jitted callable; lower it directly
    lowered = step.lower(state, inputs, labels, 0.1, key)
    cost = lowered.compile().cost_analysis()
    flops_per_clip = float(cost.get("flops", 0.0)) / batch

    if train_clips_per_sec is None:
        train_clips_per_sec = bench_train(cfg, lambda d: None)
    achieved_tflops = train_clips_per_sec * flops_per_clip / 1e12
    mfu = achieved_tflops / V5E_BF16_PEAK_TFLOPS
    emit({
        "metric": "SlowFast-R50 train-step MFU (vs v5e 197 TF/s bf16 peak)",
        "value": round(mfu * 100.0, 2),
        "unit": "%",
        "vs_baseline": None,
        "gflops_per_clip": round(flops_per_clip / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 2),
    })
    return mfu


def bench_mfu(cfg, emit, eval_clips_per_sec=None):
    """Model FLOPs utilization from XLA cost analysis of the eval fwd."""
    import functools

    import jax

    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = 2 if on_cpu else 128
    inputs = _eval_inputs(cfg, batch)

    # FLOPs from the UNFUSED analytic path (cost analysis of Pallas custom
    # calls reports the declared estimate; the unfused graph is the model's
    # true arithmetic).
    def plain(variables, inputs):
        return model.apply(variables, inputs, train=False)

    lowered = jax.jit(plain).lower(variables, inputs)
    cost = lowered.compile().cost_analysis()
    flops_total = float(cost.get("flops", 0.0))
    flops_per_clip = flops_total / batch

    if eval_clips_per_sec is None:
        eval_clips_per_sec = bench_eval(cfg, lambda d: None)
    achieved_tflops = eval_clips_per_sec * flops_per_clip / 1e12
    mfu = achieved_tflops / V5E_BF16_PEAK_TFLOPS
    emit({
        "metric": "SlowFast-R50 eval MFU (vs v5e 197 TF/s bf16 peak)",
        "value": round(mfu * 100.0, 2),
        "unit": "%",
        "vs_baseline": None,
        "gflops_per_clip": round(flops_per_clip / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 2),
    })
    return mfu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="eval",
                    choices=["eval", "train", "shufflenetv2", "i3d_nln",
                             "detection", "int8", "int8_spatial", "export",
                             "pipeline", "mfu", "all"])
    args = ap.parse_args()

    from efficient_slowfast_tpu.utils.env import honor_jax_platforms

    honor_jax_platforms()  # JAX_PLATFORMS=cpu must win over the site pin

    import jax

    def setup_compile_cache():
        """Persistent compile cache makes repeat bench runs near-instant.

        Keyed by the host CPU feature set (XLA:CPU loads cross-machine AOT
        cache entries with only a warning; after a VM migration the stale
        blobs can execute garbage — shared scheme: utils/env.py::
        machine_cache_dir) AND by backend (a CPU-forced run must not load
        AOT blobs an axon/TPU-platform process compiled with different
        host features). NOTE: jax.default_backend() INITIALIZES the
        backend, which can hang outright under co-tenant saturation of the
        tunneled chip — callers must only invoke this inside a probed
        quiet window (with_contention_retry does)."""
        try:
            from efficient_slowfast_tpu.utils.env import machine_cache_dir

            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR", machine_cache_dir(
                    f"/tmp/jax_bench_cache-{jax.default_backend()}")),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    emit = lambda d: print(json.dumps(d), flush=True)

    def chip_quiet(timeout_s=90.0):
        """Out-of-process allocation probe. Under co-tenant saturation the
        tunneled chip doesn't just fail fast with RESOURCE_EXHAUSTED — the
        backend can HANG on init/alloc, so the probe must be killable: a
        subprocess with a hard timeout. A passing probe is a reliable
        quiet-window signal and costs seconds where a failed/hung full
        bench attempt costs minutes of compiles (or the whole run).
        CPU-platform runs skip probing entirely."""
        if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
            return True
        import subprocess

        code = (
            "from efficient_slowfast_tpu.utils.env import "
            "honor_jax_platforms; honor_jax_platforms();"
            "import jax.numpy as jnp;"
            "print(float((jnp.zeros((8,), jnp.float32) + 1).sum()))"
        )
        env = dict(os.environ)
        # append (never replace) so the site's TPU plugin stays importable
        env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                             + os.pathsep + env.get("PYTHONPATH", ""))
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            return False  # hung init/alloc — the saturation signature
        if r.returncode == 0:
            return True
        if "RESOURCE_EXHAUSTED" in (r.stdout + r.stderr):
            return False
        # not a contention signature: let the real attempt surface it
        return True

    def with_contention_retry(fn, budget=None):
        """The shared dev chip sees multi-hour co-tenant saturation
        (RESOURCE_EXHAUSTED or outright hangs on any allocation). For
        single-mode runs — including the driver's headline invocation —
        probe for a quiet window before each expensive attempt and retry
        with backoff inside a wall-clock budget instead of failing (or
        hanging) on the first hit. Output stays one JSON line: nothing is
        emitted until success. The default budget is sized to outlast the
        observed co-tenant saturation episodes (a 900s budget expired
        without a quiet window on 2026-08-19); override with
        BENCH_RETRY_SECS, or pass ``budget`` explicitly (an explicit
        budget caps the env value rather than being shadowed by it)."""
        env_budget = float(os.environ.get("BENCH_RETRY_SECS", "2700"))
        budget = env_budget if budget is None else min(budget, env_budget)
        deadline = time.monotonic() + budget
        last_oom = None
        while True:
            # Wait for a quiet window first (CPU runs skip the probe
            # entirely). If the budget runs out while the chip still
            # refuses a tiny allocation, a "final attempt" would hang the
            # process in the saturation regime — raise a clear error
            # instead so the caller sees the cause, not a timeout.
            quiet = chip_quiet()
            while not quiet and time.monotonic() < deadline:
                print("bench: chip busy/hung (probe), waiting for a quiet "
                      "window", file=sys.stderr, flush=True)
                time.sleep(45)
                quiet = chip_quiet()
            if not quiet:
                raise RuntimeError(
                    "chip saturated for the whole retry budget "
                    f"({budget:.0f}s): allocation probes hung or failed "
                    "with RESOURCE_EXHAUSTED (co-tenant load); skipping "
                    "the bench attempt because the backend would hang")
            setup_compile_cache()  # first backend init — quiet window only
            try:
                return fn()
            except Exception as e:
                if not _is_transient_oom(e) or time.monotonic() > deadline:
                    raise
                # A deterministic footprint OOM (e.g. compile-time "Ran out
                # of memory in memory space hbm") reproduces byte-identically
                # on a chip the probe just declared quiet; contention OOM
                # under a quiet probe twice in a row with the SAME message is
                # vanishingly unlikely. Raise instead of burning the whole
                # retry budget re-running a permanent failure (round-4
                # review finding #4) — message-taxonomy splits are fragile
                # through the tunnel helper, repetition is not.
                if str(e) == last_oom:
                    raise
                last_oom = str(e)
                print(f"bench: chip busy ({type(e).__name__}), retrying "
                      f"until budget expires", file=sys.stderr, flush=True)
                jax.clear_caches()
                import gc
                gc.collect()
                time.sleep(60)

    if args.mode == "eval":
        # The driver's headline invocation. Output stays ONE JSON line, but
        # BASELINE.md names TWO north-star models — the second
        # (SlowFastShuffleNetV2 w2.0) rides along as a nested key so the
        # driver-recorded artifact carries both metrics. A failure on the
        # second leg must never cost the headline: it degrades to an error
        # string inside the same line.
        # Saturation fallback (see HEADLINE_CACHE): whole-budget saturation
        # emits the last-good headline marked stale — an honest degraded
        # line beats an empty round artifact.
        lines = []
        try:
            with_contention_retry(lambda: bench_eval(_flagship_cfg(),
                                                     lines.append))
        except RuntimeError as e:
            cached = (_stale_headline(e)
                      if "saturated for the whole retry budget" in str(e)
                      else None)
            if cached is None:
                raise
            emit(cached)
            return
        headline = lines[0]
        try:
            jax.clear_caches()  # drop the R50 executables before the 2nd leg
            import gc

            gc.collect()
            snv2 = []
            # the second leg is best-effort: cap its retry budget so a
            # saturated chip can't double the headline invocation's wall
            # time (the headline JSON line is already secured above)
            with_contention_retry(
                lambda: bench_shufflenetv2(snv2.append), budget=600)
            headline["second_north_star"] = snv2[0]
        except Exception as e:  # noqa: BLE001 — headline must survive
            headline["second_north_star"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}
        emit(headline)
        _persist_headline(headline)
    elif args.mode == "train":
        with_contention_retry(lambda: bench_train(_flagship_cfg(), emit))
    elif args.mode == "shufflenetv2":
        with_contention_retry(lambda: bench_shufflenetv2(emit))
    elif args.mode == "i3d_nln":
        with_contention_retry(lambda: bench_i3d_nln(emit))
    elif args.mode == "detection":
        with_contention_retry(lambda: bench_detection(emit))
    elif args.mode == "int8":
        with_contention_retry(lambda: bench_int8(emit))
    elif args.mode == "int8_spatial":
        with_contention_retry(lambda: bench_int8(emit, spatial=True))
    elif args.mode == "export":
        with_contention_retry(lambda: bench_export(emit))
    elif args.mode == "pipeline":
        with_contention_retry(lambda: bench_pipeline(_flagship_cfg(), emit))
    elif args.mode == "mfu":
        with_contention_retry(lambda: bench_mfu(_flagship_cfg(), emit))
        with_contention_retry(lambda: bench_train_mfu(_flagship_cfg(), emit))
    else:
        # One failing mode (e.g. co-tenant RESOURCE_EXHAUSTED on the shared
        # dev chip) must not take down the rest of the sweep: each mode gets
        # the shared contention-retry policy, and a mode that still fails
        # emits an error line and lets the sweep continue. The retry budget
        # is a SHARED whole-sweep deadline (not per-mode) so a saturated
        # chip can't stretch a 10-mode run by 45 min per mode.
        sweep_deadline = time.monotonic() + float(
            os.environ.get("BENCH_RETRY_SECS", "2700"))

        def guarded(name, fn):
            try:
                remaining = max(60.0, sweep_deadline - time.monotonic())
                return with_contention_retry(fn, budget=remaining)
            except Exception as e:  # noqa: BLE001 — survey mode
                emit({"metric": name, "error": f"{type(e).__name__}: {e}"
                      [:300]})
                return None

        clips = guarded("eval", lambda: bench_eval(_flagship_cfg(), emit))
        tclips = guarded("train", lambda: bench_train(_flagship_cfg(), emit))
        guarded("shufflenetv2", lambda: bench_shufflenetv2(emit))
        guarded("i3d_nln", lambda: bench_i3d_nln(emit))
        guarded("detection", lambda: bench_detection(emit))
        guarded("int8", lambda: bench_int8(emit))
        guarded("int8_spatial", lambda: bench_int8(emit, spatial=True))
        guarded("export", lambda: bench_export(emit))
        guarded("pipeline", lambda: bench_pipeline(_flagship_cfg(), emit))
        guarded("mfu", lambda: bench_mfu(
            _flagship_cfg(), emit, eval_clips_per_sec=clips))
        guarded("train_mfu", lambda: bench_train_mfu(
            _flagship_cfg(), emit, train_clips_per_sec=tclips))


if __name__ == "__main__":
    main()
