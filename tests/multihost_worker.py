"""Worker + shared harness for the REAL 2-process data-parallel test.

tests/test_multihost.py runs this file as a script — one subprocess per
simulated host, each with 4 virtual CPU devices, joined into one 8-device
jax.distributed job over gloo collectives — and imports it for the
single-process ground truth. The reference cannot exercise its distributed
stack without real GPUs (SURVEY §4, slowfast/utils/distributed.py); this
drives ours end-to-end on CPU: jax.distributed init via the NUM_SHARDS/
SHARD_ID/INIT_METHOD contract, host-local batch assembly (shard_batch),
the full jitted train+eval steps, and the unaligned cross-host eval gather
(engine/test.py::gather_across_hosts, the reference's all_gather_unaligned).
"""

import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_BATCH = 8


def tiny_cfg():
    from efficient_slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 10
    # dropout off: results must be bit-comparable across process layouts
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def global_batch(cfg):
    """Deterministic global batch; every host derives the same arrays."""
    rng = np.random.default_rng(0)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    a = cfg.SLOWFAST.ALPHA
    slow = rng.normal(size=(GLOBAL_BATCH, t // a, s, s, 3)).astype(np.float32)
    fast = rng.normal(size=(GLOBAL_BATCH, t, s, s, 3)).astype(np.float32)
    labels = (np.arange(GLOBAL_BATCH) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
    # two padded eval rows, both on the second host's shard
    valid = (np.arange(GLOBAL_BATCH) < GLOBAL_BATCH - 2).astype(np.float32)
    return [slow, fast], labels, valid


def run_steps(cfg, local_rows=None):
    """Two jitted train steps + one masked eval step over all devices.

    ``local_rows``: the slice of the global batch this host feeds
    shard_batch (None = single process, feed the whole batch). Matches the
    loader's per-host index sharding (data/loader.py::shard_indices).
    """
    import jax

    from efficient_slowfast_tpu.engine.state import (
        create_train_state, make_eval_step, make_train_step, shard_state,
    )
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.parallel.mesh import build_mesh, shard_batch

    mesh = build_mesh()
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state = shard_state(state, mesh)
    step = make_train_step(cfg, model, tx)
    eval_step = make_eval_step(cfg, model)

    inputs, labels, valid = global_batch(cfg)
    sl = slice(None) if local_rows is None else local_rows
    dev_inputs = shard_batch(mesh, [p[sl] for p in inputs])
    dev_labels = shard_batch(mesh, labels[sl])
    dev_valid = shard_batch(mesh, valid[sl])

    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(2):
        state, mets = step(state, dev_inputs, dev_labels, 0.01, rng)
        losses.append(float(mets["loss"]))
    emets = eval_step(state, dev_inputs, dev_labels, dev_valid)
    return {"losses": losses, "eval_top1_err": float(emets["top1_err"])}


def engine_cfg(output_dir, num_shards):
    """Tiny synthetic end-to-end config (mirrors tests/test_engine.py)."""
    cfg = tiny_cfg()
    cfg.NUM_SHARDS = num_shards
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8          # global; 4 per host, divisor 4
    cfg.TEST.BATCH_SIZE = 30          # 15 per host -> padded to 16 + mask
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 0.01
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.LOG_PERIOD = 2
    # fewer concurrent first-run compiles: gloo context init tolerates only
    # ~30 s of cross-host skew, and this 1-core host compiles both workers'
    # programs concurrently
    cfg.LOG_MODEL_INFO = False
    cfg.OUTPUT_DIR = output_dir
    return cfg


def run_full_train_and_test(output_dir, num_shards):
    """The whole engine: train an epoch, then the 30-view test ensemble.

    Exercises per-host loader index sharding, the jitted train epoch,
    masked eval, master-only checkpointing, checkpoint reload in test(),
    and the cross-host unaligned eval gather — the complete multi-host
    story of SURVEY §2.7 in one run.
    """
    from efficient_slowfast_tpu.engine.test import test as run_test
    from efficient_slowfast_tpu.engine.train import train

    cfg = engine_cfg(output_dir, num_shards)
    state = train(cfg)
    stats = run_test(cfg)
    return {"step": int(state.step), "top1_acc": float(stats["top1_acc"])}


def run_orbax_train_and_test(output_dir, num_shards):
    """Multi-host ORBAX e2e (VERDICT r3 next #6): collective async sharded
    save from BOTH hosts during train (utils/checkpoint.py::_save_orbax —
    every process contributes its addressable shards), drain, then the test
    engine restores the .orbax directory and re-shards; engine/state.py::
    _verify_state_consistency cross-checksums the restored state so a host
    that read a divergent copy fails loudly. Returns the post-train and
    restored params/batch_stats crc32s for the bit-equality assertion."""
    import zlib

    from efficient_slowfast_tpu.engine.test import test as run_test
    from efficient_slowfast_tpu.engine.train import train
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.engine.state import create_train_state
    from efficient_slowfast_tpu.utils import checkpoint as cu

    import jax

    def crc_of(params, batch_stats):
        crc = 0
        for leaf in jax.tree_util.tree_leaves(
                {"p": params, "b": batch_stats}):
            crc = zlib.crc32(np.asarray(leaf).tobytes(), crc)
        return hex(crc)

    cfg = engine_cfg(output_dir, num_shards)
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    state = train(cfg)  # drains async saves before returning
    trained_crc = crc_of(state.params, state.batch_stats)

    # the exact restore path the test engine takes (newest checkpoint in
    # OUTPUT_DIR — the .orbax dir written above)
    fresh, _ = create_train_state(cfg, build_model(cfg),
                                  jax.random.PRNGKey(123))
    restored = cu.load_test_checkpoint(cfg, fresh)
    restored_crc = crc_of(restored.params, restored.batch_stats)

    stats = run_test(cfg)
    ckpts = sorted(os.listdir(os.path.join(output_dir, "checkpoints")))
    return {
        "step": int(state.step),
        "top1_acc": float(stats["top1_acc"]),
        "trained_crc": trained_crc,
        "restored_crc": restored_crc,
        "checkpoints": ckpts,
    }


def detection_cfg(base, num_shards):
    """The shared 2-keyframe AVA detection test config over a pre-built
    on-disk fixture (tests/test_ava.py::make_ava_fixture at <base>/ava_fx;
    the pytest parent builds it before spawning workers)."""
    import test_ava as ta

    fx = ta.make_ava_fixture(os.path.join(base, "ava_fx"))
    cfg = ta.detection_engine_cfg(fx, base)
    cfg.NUM_SHARDS = num_shards
    cfg.LOG_MODEL_INFO = False
    return cfg


def run_detection_test(base, num_shards):
    """30-view-free detection eval across hosts: per-host loader shard
    (1 real keyframe each + wrap-padding), batch-sharded RoI forward,
    _valid pad drop, cross-host box gather, full-dataset mAP on every
    host — the exact multi-host path review round 3 found broken
    (engine/test.py::_test_detection). Random-init weights: deterministic
    per RNG_SEED, so every process layout scores the same boxes."""
    from efficient_slowfast_tpu.engine.test import test as run_test

    cfg = detection_cfg(base, num_shards)
    stats = run_test(cfg)
    return {"map": float(stats["map"])}


def _gather_fixture(pid):
    """Per-host rows of UNEQUAL count (3 on host 0, 5 on host 1, ...)."""
    rows = 3 + 2 * pid
    return (np.arange(rows * 2, dtype=np.float32).reshape(rows, 2)
            + 1000.0 * pid)


def main():
    pid, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    # platform + device count must be pinned before the first backend init
    # (a sitecustomize pre-imports jax pinned to the tunneled TPU platform)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    from efficient_slowfast_tpu.utils.env import (
        honor_jax_platforms, machine_cache_dir,
    )

    honor_jax_platforms()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      machine_cache_dir("/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # the reference CLI contract: NUM_SHARDS / SHARD_ID / --init_method
    from efficient_slowfast_tpu.parallel.mesh import init_distributed

    init_distributed(types.SimpleNamespace(
        NUM_SHARDS=nprocs, SHARD_ID=pid,
        INIT_METHOD=f"tcp://localhost:{port}"))
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()

    mode = sys.argv[5] if len(sys.argv) > 5 else "steps"
    if mode == "train":
        res = run_full_train_and_test(
            os.path.dirname(os.path.abspath(out_path)), nprocs)
    elif mode == "orbax":
        res = run_orbax_train_and_test(
            os.path.dirname(os.path.abspath(out_path)), nprocs)
    elif mode == "detection":
        res = run_detection_test(
            os.path.dirname(os.path.abspath(out_path)), nprocs)
    else:
        cfg = tiny_cfg()
        per = GLOBAL_BATCH // nprocs
        res = run_steps(cfg, local_rows=slice(pid * per, (pid + 1) * per))

        from efficient_slowfast_tpu.engine.test import gather_across_hosts

        (got,) = gather_across_hosts(_gather_fixture(pid))
        expected = np.concatenate([_gather_fixture(i)
                                   for i in range(nprocs)])
        res["gather_ok"] = bool(np.array_equal(np.asarray(got), expected))

    with open(out_path, "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
