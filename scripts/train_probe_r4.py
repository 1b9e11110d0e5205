#!/usr/bin/env python3
"""Round-4 train-step probe: gradient accumulation + bf16 optimizer state.

PERF.md r3 found batch 96/128 compile-OOM even with remat; VERDICT r3 next
#8 asks for a measured A/B of (a) TPU.GRAD_ACCUM_STEPS=2 at global batch
128 (microbatch 64 — the known-good activation footprint) and (b)
TPU.OPTIMIZER_STATE_DTYPE=bfloat16, against the shipped baseline
(batch 64, TPU.REMAT + REMAT_STAGES=[2]). Same methodology as the remat
sweep: one jitted step, compile + warm, 10 timed iterations, clips/s/chip.

Run on the TPU when the chip is quiet:
  python scripts/train_probe_r4.py | tee /tmp/train_probe_r4.jsonl
Each line is one configuration's JSON result; paste the table into PERF.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(name, batch, accum=1, remat=True, stages=(2,), opt_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from bench import _flagship_cfg, _is_transient_oom, _sync
    from efficient_slowfast_tpu.engine.state import (create_train_state,
                                                     make_train_step)
    from efficient_slowfast_tpu.models import build_model

    on_cpu = jax.default_backend() == "cpu"
    cfg = _flagship_cfg()
    cfg.DATA.TEST_CROP_SIZE = cfg.DATA.CROP_SIZE
    cfg.TPU.REMAT = remat and not on_cpu
    cfg.TPU.REMAT_STAGES = list(stages)
    cfg.TPU.GRAD_ACCUM_STEPS = accum
    cfg.TPU.OPTIMIZER_STATE_DTYPE = opt_dtype
    if on_cpu:
        batch = max(2, accum)  # smoke only

    try:
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        state, tx = create_train_state(cfg, model, rng)
        step = make_train_step(cfg, model, tx)
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
        out = {"config": name, "batch": batch, "accum": accum,
               "remat": bool(cfg.TPU.REMAT), "stages": list(stages),
               "opt_dtype": opt_dtype, "clips_per_sec_chip": round(value, 2)}
    except Exception as e:  # noqa: BLE001 — record OOMs as results
        kind = "oom" if _is_transient_oom(e) else "error"
        msg = f"{type(e).__name__}: {e}"
        # keep the load-bearing line of a compile-time HBM OOM (it is
        # buried thousands of chars into the remote helper's 500 body)
        detail = next((ln.strip() for ln in str(e).splitlines()
                       if "Ran out of memory" in ln or "Exceeded" in ln), "")
        out = {"config": name, "batch": batch, "accum": accum,
               "remat": remat, "stages": list(stages),
               "opt_dtype": opt_dtype, kind: (detail or msg)[:300]}
    print(json.dumps(out), flush=True)
    import gc

    jax.clear_caches()
    gc.collect()
    return out


def main():
    from efficient_slowfast_tpu.utils.env import honor_jax_platforms

    honor_jax_platforms()
    measure("baseline b64 remat[2]", 64)
    measure("accum2 b128 remat[2]", 128, accum=2)
    measure("accum2 b128 no-remat", 128, accum=2, remat=False)
    measure("bf16-opt b64 remat[2]", 64, opt_dtype="bfloat16")
    measure("accum2+bf16-opt b128 remat[2]", 128, accum=2,
            opt_dtype="bfloat16")
    # the r3 OOM point, retried with the bf16 optimizer-state savings alone
    measure("b96 remat[2] bf16-opt", 96, opt_dtype="bfloat16")


if __name__ == "__main__":
    main()
