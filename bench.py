#!/usr/bin/env python3
"""Headline benchmark: SlowFast-R50 8x8 Kinetics-400 30-view eval throughput.

Measures clips/sec/chip of the jitted eval forward (post-softmax multi-view
scores, TEST_CROP 256, 32-frame clips — the reference's standard 30-view test
configuration, reference: tools/test_net.py + configs/Kinetics/
SLOWFAST_8x8_R50.yaml) on whatever accelerator JAX finds, bf16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": R}

vs_baseline compares against an A100 PyTorch estimate for the same model
(~135 clips/s for SlowFast-R50 eval fwd at 256², fp16, batch-optimal; no
official number is published — reference README/MODEL_ZOO publish accuracy
only, see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_BASELINE_CLIPS_PER_SEC = 135.0


def main():
    import functools

    import jax

    try:  # persistent compile cache makes repeat bench runs near-instant
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.models import build_model

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
    cfg.DATA.TEST_CROP_SIZE = 256  # eval resolution (fully-convolutional head)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # keep the smoke path cheap
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 64
        cfg.DATA.TEST_CROP_SIZE = 64

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    s = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    batch = 2 if on_cpu else 128  # throughput plateau on v5e is ~batch 128

    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (batch, t // cfg.SLOWFAST.ALPHA, s, s, 3),
                          jnp.bfloat16),
        jax.random.normal(key, (batch, t, s, s, 3), jnp.bfloat16),
    ]
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, inputs
    )

    fwd = jax.jit(functools.partial(model.apply, train=False))

    def sync(o):
        # block_until_ready is unreliable on tunneled platforms; a host fetch
        # of a reduction is an unambiguous execution barrier.
        return float(o.astype(jnp.float32).sum())

    sync(fwd(variables, inputs))  # compile + warmup
    sync(fwd(variables, inputs))

    iters = 3 if on_cpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, inputs)
    sync(out)  # dispatch is pipelined; the final fetch drains the stream
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    n_chips = jax.device_count()
    value = clips_per_sec / n_chips
    print(json.dumps({
        "metric": "SlowFast-R50 8x8 K400 30-view eval fwd throughput",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / A100_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
