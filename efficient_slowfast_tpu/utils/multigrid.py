"""Multigrid training schedules (reference: slowfast/utils/multigrid.py).

Long-cycle: iteration-matched epoch allocation across (B, T, S) base shapes
(reference :123-212); short-cycle: per-iteration crop/batch cycling
(reference datasets/multigrid_helper.py:11-79).

TPU note (SURVEY §7): each long-cycle phase is a STATIC shape — the engine
rebuilds loaders and recompiles the step once per phase (a bounded set of
compiled programs) instead of mutating a live trainer. The BN-type auto-switch
(reference :83-101) is preserved: small per-device batches switch to
grouped sync-BN (ops/norm.py::SyncBatchNorm3d honoring NUM_SYNC_DEVICES),
large ones to sub-BN stat splitting; the engine rebuilds the module tree at
either switch and converts batch_stats (engine/train.py BN rebuild branch).
"""

from __future__ import annotations

import numpy as np

from .logging import get_logger

logger = get_logger(__name__)


class MultigridSchedule:
    """Long-cycle schedule generation + per-epoch shape updates."""

    def __init__(self):
        self.schedule = None

    def init_multigrid(self, cfg):
        self.schedule = None
        cfg.MULTIGRID.DEFAULT_B = cfg.TRAIN.BATCH_SIZE
        cfg.MULTIGRID.DEFAULT_T = cfg.DATA.NUM_FRAMES
        cfg.MULTIGRID.DEFAULT_S = cfg.DATA.TRAIN_CROP_SIZE

        if cfg.MULTIGRID.LONG_CYCLE:
            self.schedule = self.get_long_cycle_schedule(cfg)
            cfg.SOLVER.STEPS = [0] + [s[-1] for s in self.schedule]
            # fine-tuning phase boundary
            cfg.SOLVER.STEPS[-1] = (cfg.SOLVER.STEPS[-2] + cfg.SOLVER.STEPS[-1]) // 2
            cfg.SOLVER.LRS = [
                cfg.SOLVER.GAMMA ** s[0] * s[1][0] for s in self.schedule
            ]
            cfg.SOLVER.LRS = cfg.SOLVER.LRS[:-1] + [
                cfg.SOLVER.LRS[-2], cfg.SOLVER.LRS[-1],
            ]
            cfg.SOLVER.MAX_EPOCH = self.schedule[-1][-1]
        elif cfg.MULTIGRID.SHORT_CYCLE:
            cfg.SOLVER.STEPS = [
                int(s * cfg.MULTIGRID.EPOCH_FACTOR) for s in cfg.SOLVER.STEPS
            ]
            cfg.SOLVER.MAX_EPOCH = int(
                cfg.SOLVER.MAX_EPOCH * cfg.MULTIGRID.EPOCH_FACTOR
            )
        return cfg

    def update_long_cycle(self, cfg, cur_epoch):
        """Returns (cfg, changed). On change, the engine recompiles."""
        base_b, base_t, base_s = get_current_long_cycle_shape(
            self.schedule, cur_epoch
        )
        if base_s == cfg.DATA.TRAIN_CROP_SIZE and base_t == cfg.DATA.NUM_FRAMES:
            return cfg, False

        cfg.DATA.NUM_FRAMES = base_t
        cfg.DATA.TRAIN_CROP_SIZE = base_s
        cfg.TRAIN.BATCH_SIZE = base_b * cfg.MULTIGRID.DEFAULT_B

        bs_factor = (
            float(cfg.TRAIN.BATCH_SIZE / cfg.NUM_GPUS)
            / cfg.MULTIGRID.BN_BASE_SIZE
        )
        if bs_factor < 1:
            cfg.BN.NORM_TYPE = "sync_batchnorm"
            cfg.BN.NUM_SYNC_DEVICES = int(1.0 / bs_factor)
            # Honored exactly when the subgroup is a proper subset of the
            # mesh: SyncBatchNorm3d computes per-subgroup statistics
            # (ops/norm.py::effective_sync_groups). A subgroup spanning the
            # whole mesh degenerates to plain global-batch BN.
            logger.info(
                "multigrid BN switch: sync_batchnorm(NUM_SYNC_DEVICES=%d)",
                cfg.BN.NUM_SYNC_DEVICES,
            )
        elif bs_factor > 1:
            cfg.BN.NORM_TYPE = "sub_batchnorm"
            cfg.BN.NUM_SPLITS = int(bs_factor)
        else:
            cfg.BN.NORM_TYPE = "batchnorm"

        cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE = cfg.DATA.SAMPLING_RATE * (
            cfg.MULTIGRID.DEFAULT_T // cfg.DATA.NUM_FRAMES
        )
        logger.info(
            "Long cycle update: BN=%s B=%d T=%dx%d S=%d",
            cfg.BN.NORM_TYPE, cfg.TRAIN.BATCH_SIZE, cfg.DATA.NUM_FRAMES,
            cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE, cfg.DATA.TRAIN_CROP_SIZE,
        )
        return cfg, True

    def get_long_cycle_schedule(self, cfg):
        steps = cfg.SOLVER.STEPS
        default_size = float(cfg.DATA.NUM_FRAMES * cfg.DATA.TRAIN_CROP_SIZE ** 2)
        default_iters = steps[-1]

        avg_bs = []
        all_shapes = []
        for t_factor, s_factor in cfg.MULTIGRID.LONG_CYCLE_FACTORS:
            base_t = int(round(cfg.DATA.NUM_FRAMES * t_factor))
            base_s = int(round(cfg.DATA.TRAIN_CROP_SIZE * s_factor))
            if cfg.MULTIGRID.SHORT_CYCLE:
                shapes = [
                    [base_t,
                     cfg.MULTIGRID.DEFAULT_S * cfg.MULTIGRID.SHORT_CYCLE_FACTORS[0]],
                    [base_t,
                     cfg.MULTIGRID.DEFAULT_S * cfg.MULTIGRID.SHORT_CYCLE_FACTORS[1]],
                    [base_t, base_s],
                ]
            else:
                shapes = [[base_t, base_s]]
            shapes = [
                [int(round(default_size / (s[0] * s[1] * s[1]))), s[0], s[1]]
                for s in shapes
            ]
            avg_bs.append(np.mean([s[0] for s in shapes]))
            all_shapes.append(shapes)

        total_iters = 0.0
        schedule = []
        for step_index in range(len(steps) - 1):
            step_epochs = steps[step_index + 1] - steps[step_index]
            for long_cycle_index, shapes in enumerate(all_shapes):
                cur_epochs = step_epochs * avg_bs[long_cycle_index] / sum(avg_bs)
                cur_iters = cur_epochs / avg_bs[long_cycle_index]
                total_iters += cur_iters
                schedule.append((step_index, shapes[-1], cur_epochs))

        iter_saving = default_iters / total_iters
        final_step_epochs = cfg.SOLVER.MAX_EPOCH - steps[-1]
        # fine-tuning phase with the same iteration saving
        ft_epochs = final_step_epochs / iter_saving * avg_bs[-1]
        schedule.append((step_index + 1, all_shapes[-1][-1], ft_epochs))

        x = (
            cfg.SOLVER.MAX_EPOCH * cfg.MULTIGRID.EPOCH_FACTOR
            / sum(s[-1] for s in schedule)
        )
        final_schedule = []
        total_epochs = 0.0
        for s in schedule:
            epochs = s[2] * x
            total_epochs += epochs
            final_schedule.append((s[0], s[1], int(round(total_epochs))))
        print_schedule(final_schedule)
        return final_schedule


def print_schedule(schedule):
    logger.info("Long cycle index\tBase shape\tEpochs")
    for s in schedule:
        logger.info("%s\t%s\t%s", s[0], s[1], s[2])


def get_current_long_cycle_shape(schedule, epoch):
    for s in schedule:
        if epoch < s[-1]:
            return s[1]
    return schedule[-1][1]


def short_cycle_shapes(cfg):
    """The 3 crop sizes a short cycle rotates through
    (reference: datasets/multigrid_helper.py:41-58)."""
    default_s = cfg.MULTIGRID.DEFAULT_S or cfg.DATA.TRAIN_CROP_SIZE
    f0, f1 = cfg.MULTIGRID.SHORT_CYCLE_FACTORS
    return [
        int(round(default_s * f0)),
        int(round(default_s * f1)),
        cfg.DATA.TRAIN_CROP_SIZE,
    ]


def short_cycle_batch_sizes(cfg):
    """Per-phase batch sizes keeping B*S² constant (reference :41-58)."""
    bs = cfg.TRAIN.BATCH_SIZE
    s0, s1, s2 = short_cycle_shapes(cfg)
    return [
        int(round(bs * (s2 / s0) ** 2)),
        int(round(bs * (s2 / s1) ** 2)),
        bs,
    ]
