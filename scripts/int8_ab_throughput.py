"""Lean int8 A/B throughput measurement for PERF.md.

Measures fp vs TPU.INT8_EVAL vs +INT8_SPATIAL flagship eval forward
throughput at the largest batch the (contended) chip admits right now,
persisting each leg's result to /tmp/int8_ab.json as it lands so a
mid-run OOM can't destroy earlier legs. Random-init weights — values
don't affect timing; accuracy lives in bench.py's trained proxy.
"""
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (module-level helpers only; main() not called)
import jax  # noqa: E402

RESULTS = "/tmp/int8_ab.json"


def save(results):
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=1)


def measure(mode, start_batch, iters=10):
    from efficient_slowfast_tpu.engine.quantize import calibrate_int8
    from efficient_slowfast_tpu.engine.state import create_train_state, \
        make_forward
    from efficient_slowfast_tpu.models import build_model

    cfg = bench._flagship_cfg()
    if mode != "fp":
        cfg.TPU.INT8_EVAL = True
        cfg.TPU.INT8_SPATIAL = (mode == "int8_spatial")
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if mode != "fp":
        calib = bench._eval_inputs(cfg, 8)  # small calib batch: footprint
        variables = calibrate_int8(model, variables, [calib])
        del calib
        gc.collect()
    fwd = make_forward(cfg, model)
    batch = start_batch
    while True:
        try:
            inputs = bench._eval_inputs(cfg, batch)
            bench._sync(fwd(variables, inputs))  # compile + warm
            bench._sync(fwd(variables, inputs))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, inputs)
            bench._sync(out)
            dt = time.perf_counter() - t0
            return batch, batch * iters / dt
        except Exception as e:
            if batch <= 8 or not bench._is_transient_oom(e):
                raise
            print(f"[{mode}] batch {batch} OOM, halving", flush=True)
            inputs = None
            jax.clear_caches()
            gc.collect()
            time.sleep(10)
            batch //= 2


def main():
    results = {"ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    # smallest-footprint leg first so SOMETHING lands even if pressure
    # rises; each leg retries within its own small budget
    for mode, start in [("int8", 128), ("fp", 128), ("int8_spatial", 128)]:
        deadline = time.monotonic() + 900
        while True:
            try:
                b, v = measure(mode, start)
                results[mode] = {"batch": b, "clips_per_sec": round(v, 2)}
                print(f"[{mode}] batch {b}: {v:.2f} clips/s", flush=True)
                save(results)
                break
            except Exception as e:
                if not bench._is_transient_oom(e) or \
                        time.monotonic() > deadline:
                    results[mode] = {"error": f"{type(e).__name__}: "
                                     f"{str(e)[:200]}"}
                    save(results)
                    print(f"[{mode}] FAILED: {e!r}"[:300], flush=True)
                    break
                print(f"[{mode}] transient OOM, waiting 45s", flush=True)
                jax.clear_caches()
                gc.collect()
                time.sleep(45)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
