"""Training engine (reference: tools/train_net.py).

Differences from the reference, by TPU design (SURVEY §7):
- one jitted train step (fwd+bwd+update+BN stats+metrics) instead of the
  imperative loop body; data parallel via batch sharding, not DDP;
- device-accumulated metrics fetched once per LOG_PERIOD (no per-iter
  ``.item()`` syncs, reference train_net.py:133-138);
- on-device fused preprocessing (data/preprocess.py) between feeder and step.
"""

from __future__ import annotations

import math

import jax
import numpy as np

from ..config.node import CfgNode
from ..data.loader import construct_loader, shuffle_dataset
from ..data.preprocess import make_train_preprocess
from ..models import build_model
from ..ops.norm import (aggregate_sub_bn_stats, convert_bn_stats,
                        effective_num_splits)
from ..parallel.mesh import (build_mesh, compile_fence, fetch_local_rows,
                             host_barrier, shard_batch)
from ..utils import checkpoint as cu
from ..utils import lr_policy
from ..utils.logging import get_logger, setup_logging
from ..utils.meters import TrainMeter, ValMeter
from .state import create_train_state, make_eval_step, make_train_step, shard_state
from .precise_bn import calculate_and_update_precise_bn

logger = get_logger(__name__)


def check_nan_losses(loss: float):
    """reference: utils/misc.py:26-33."""
    if math.isnan(loss):
        raise RuntimeError("ERROR: Got NaN losses")


def _bn_signature(cfg):
    """(norm_type, groups) pair deciding whether the module tree must be
    rebuilt at a multigrid phase boundary. sync_batchnorm whose subgroup
    spans the mesh degenerates to plain BN (ops/norm.py::get_norm), so it
    maps to the batchnorm signature; a proper subgroup is a real module
    change (grouped statistics) and must rebuild."""
    norm = cfg.BN.NORM_TYPE
    if norm == "sub_batchnorm":
        return (norm, cfg.BN.NUM_SPLITS)
    if norm == "sync_batchnorm":
        from ..ops.norm import effective_sync_groups

        groups = effective_sync_groups(cfg)
        if groups > 1:
            return (norm, groups)
    return ("batchnorm", 0)


def train_epoch(cfg, state, train_step, preprocess, loader, meter, cur_epoch,
                mesh, rng, writer=None):
    data_size = len(loader)
    meter.iter_tic()
    pending = []  # (iter, device metrics) — sync LOG_PERIOD behind
    short_cycle_pre = None
    if cfg.MULTIGRID.SHORT_CYCLE:
        from ..data.preprocess import make_train_preprocess
        from ..utils.multigrid import short_cycle_shapes

        short_cycle_pre = [
            make_train_preprocess(cfg, crop_size=s)
            for s in short_cycle_shapes(cfg)
        ]
    from ..data.loader import prefetch_to_device

    for cur_iter, batch in enumerate(
        prefetch_to_device(loader, mesh, depth=cfg.DATA_LOADER.PREFETCH_DEPTH)
    ):
        lr = lr_policy.get_lr_at_epoch(cfg, cur_epoch + float(cur_iter) / data_size)
        frames, widths, labels = batch["frames"], batch["width"], batch["label"]
        key = jax.random.fold_in(rng, cur_epoch * data_size + cur_iter)
        portrait = batch.get("portrait")
        crop_u = batch.get("crop_u")
        if short_cycle_pre is not None and "_phase" in batch:
            inputs = short_cycle_pre[int(batch["_phase"])](
                key, frames, widths, portrait, crop_u)
        else:
            inputs = preprocess(key, frames, widths, portrait, crop_u)
        state, mets = train_step(state, inputs, labels, lr, rng)
        pending.append((cur_iter, labels.shape[0], mets))
        if len(pending) >= cfg.TPU.METRICS_PERIOD or cur_iter == data_size - 1:
            for it, bs, m in pending:
                m = jax.device_get(m)
                loss = float(m["loss"])
                check_nan_losses(loss)
                meter.update_stats(
                    float(m.get("top1_err", 0.0)),
                    float(m.get(f"top{cfg.TRAIN.TOPK}_err", 0.0)),
                    # bs is already the GLOBAL batch: the loader's device
                    # placement assembles every host's rows (shard_batch)
                    loss, float(m["lr"]), bs,
                )
                meter.log_iter_stats(cur_epoch, it)
                if writer is not None:
                    writer.add_scalars(
                        {
                            "Train/loss": loss,
                            "Train/lr": float(m["lr"]),
                            "Train/Top1_err": float(m.get("top1_err", 0.0)),
                            "Train/Top5_err": float(
                                m.get(f"top{cfg.TRAIN.TOPK}_err", 0.0)),
                        },
                        global_step=data_size * cur_epoch + it,
                    )
            pending = []
    meter.iter_toc()
    meter.log_epoch_stats(cur_epoch)
    meter.reset()
    return state


def eval_epoch(cfg, state, eval_step, preprocess, loader, meter, cur_epoch,
               mesh, rng, writer=None):
    from ..data.loader import prefetch_to_device

    # collect per-clip rows on EVERY host when plotting is configured —
    # the writer exists only on process 0, but the epoch-end merge below is
    # a collective all hosts must enter; keying on the (uniform) cfg flags
    # rather than the writer keeps hosts aligned AND makes the confusion
    # matrix cover the full validation set, not process 0's shard
    plot = cfg.TENSORBOARD.ENABLE and (
        cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE or cfg.TENSORBOARD.HISTOGRAM.ENABLE
    )
    all_preds, all_labels = [], []
    meter.iter_tic()
    for cur_iter, batch in enumerate(
        prefetch_to_device(loader, mesh, depth=cfg.DATA_LOADER.PREFETCH_DEPTH)
    ):
        frames, widths, labels = batch["frames"], batch["width"], batch["label"]
        valid = batch.get("_valid")  # host-local mask (loader pad_to_full)
        key = jax.random.fold_in(rng, cur_iter)
        inputs = preprocess(key, frames, widths, batch.get("portrait"),
                            batch.get("crop_u"))
        out = eval_step(state, inputs, labels,
                        None if valid is None else shard_batch(mesh, valid))
        # preds are batch-sharded over all hosts — fetch scalars only;
        # the per-clip rows (plot) come back through fetch_local_rows
        scalars = jax.device_get({k: v for k, v in out.items()
                                  if k != "preds"})
        if plot:
            keep = slice(None) if valid is None else np.asarray(valid) > 0
            local_preds = fetch_local_rows(out["preds"])
            local_labels = fetch_local_rows(labels)
            all_preds.append(local_preds[keep])
            all_labels.append(local_labels[keep])
        meter.update_stats(
            float(scalars["top1_err"]),
            float(scalars[f"top{cfg.TRAIN.TOPK}_err"]),
            # num_valid is the GLOBAL count (jit sees global shapes)
            float(scalars["num_valid"]),
        )
        meter.log_iter_stats(cur_epoch, cur_iter)
    meter.iter_toc()
    top1 = meter.log_epoch_stats(cur_epoch)
    meter.reset()
    if plot and all_preds:
        from .test import gather_across_hosts

        preds, labels = gather_across_hosts(
            np.concatenate(all_preds), np.concatenate(all_labels))
        if writer is not None:
            writer.plot_eval(preds, labels, global_step=cur_epoch)
    return top1


def train(cfg: CfgNode):
    setup_logging(cfg.OUTPUT_DIR)
    logger.info("Train with config:\n%s", cfg.dump())

    import random as _random

    np.random.seed(cfg.RNG_SEED)
    _random.seed(cfg.RNG_SEED)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)

    multigrid = None
    if cfg.MULTIGRID.LONG_CYCLE or cfg.MULTIGRID.SHORT_CYCLE:
        from ..utils.multigrid import MultigridSchedule

        multigrid = MultigridSchedule()
        cfg = multigrid.init_multigrid(cfg)
        if cfg.MULTIGRID.LONG_CYCLE:
            cfg, _ = multigrid.update_long_cycle(cfg, cur_epoch=0)

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)
    state = shard_state(state, mesh)
    state, start_epoch = cu.load_train_checkpoint(cfg, state)

    if cfg.LOG_MODEL_INFO:
        from ..utils.misc import log_model_info
        from .state import pathway_inputs

        log_model_info(model, cfg, state, pathway_inputs(cfg, 1))

    train_loader = construct_loader(cfg, "train")
    val_loader = construct_loader(cfg, "val")
    precise_bn_loader = (
        construct_loader(cfg, "train") if cfg.BN.USE_PRECISE_STATS else None
    )

    if cfg.DETECTION.ENABLE:
        return _train_detection(cfg, model, state, tx, train_loader, val_loader,
                                mesh, rng, start_epoch)

    # compile_fence: multi-host, AOT-compile + barrier before the first
    # dispatch of any new input signature (see parallel/mesh.py)
    train_step = compile_fence(make_train_step(cfg, model, tx), "train_step")
    eval_step = compile_fence(make_eval_step(cfg, model), "eval_step")
    preprocess = make_train_preprocess(cfg)
    cur_bn = _bn_signature(cfg)

    train_meter = TrainMeter(len(train_loader), cfg)
    val_meter = ValMeter(len(val_loader), cfg)

    writer = None
    if cfg.TENSORBOARD.ENABLE and jax.process_index() == 0:
        from ..visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)

    logger.info("Start epoch: %d", start_epoch + 1)
    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        if multigrid is not None and cfg.MULTIGRID.LONG_CYCLE:
            cfg, changed = multigrid.update_long_cycle(cfg, cur_epoch)
            if changed:
                # shape phase change: rebuild loaders + steps (bounded set of
                # compiled programs; params carry over unchanged)
                new_bn = _bn_signature(cfg)
                if new_bn != cur_bn:
                    # BN-type auto-switch (utils/multigrid.py:69-90): the
                    # reference rebuilds the whole trainer + checkpoint
                    # round-trip (tools/train_net.py:410-432). Here the param
                    # layout is BN-type-invariant (ops/norm.py), so rebuild
                    # the module tree and convert only the batch_stats
                    # between normal and split form; params/opt state carry.
                    logger.info("multigrid BN rebuild: %s -> %s", cur_bn, new_bn)
                    model = build_model(cfg)
                    state = shard_state(
                        state.replace(batch_stats=convert_bn_stats(
                            state.batch_stats, cur_bn[0], new_bn[0],
                            effective_num_splits(cfg))),
                        mesh,
                    )
                    eval_step = compile_fence(make_eval_step(cfg, model),
                                              "eval_step")
                    cur_bn = new_bn
                train_loader = construct_loader(cfg, "train")
                val_loader = construct_loader(cfg, "val")
                if cfg.BN.USE_PRECISE_STATS:
                    precise_bn_loader = construct_loader(cfg, "train")
                train_step = compile_fence(make_train_step(cfg, model, tx),
                                           "train_step")
                preprocess = make_train_preprocess(cfg)
                train_meter = TrainMeter(len(train_loader), cfg)
                val_meter = ValMeter(len(val_loader), cfg)

        shuffle_dataset(train_loader, cur_epoch)
        state = train_epoch(
            cfg, state, train_step, preprocess, train_loader, train_meter,
            cur_epoch, mesh, rng, writer=writer,
        )

        if cfg.BN.USE_PRECISE_STATS and precise_bn_loader is not None:
            state = calculate_and_update_precise_bn(
                cfg, state, model, precise_bn_loader, preprocess, mesh, rng,
                num_batches=min(cfg.BN.NUM_BATCHES_PRECISE, len(precise_bn_loader)),
            )
        if cfg.BN.NORM_TYPE == "sub_batchnorm":
            state = state.replace(
                batch_stats=aggregate_sub_bn_stats(state.batch_stats)
            )

        if cu.is_checkpoint_epoch(
            cfg, cur_epoch, multigrid.schedule if multigrid else None
        ):
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if _is_eval_epoch(cfg, cur_epoch, multigrid.schedule if multigrid else None):
            top1 = eval_epoch(cfg, state, eval_step, preprocess, val_loader,
                              val_meter, cur_epoch, mesh, rng, writer=writer)
            if writer is not None:
                writer.add_scalars({"Val/Top1_err": top1},
                                   global_step=cur_epoch)
    if writer is not None:
        writer.close()
    cu.wait_for_saves()  # drain any in-flight async (orbax) checkpoint
    # multi-host: non-master processes must not race ahead (e.g. run_net's
    # train -> test reads the master-written checkpoint); coordination-
    # service barrier, since hosts can be minutes apart here
    host_barrier("train_complete")
    return state


def _train_detection(cfg, model, state, tx, train_loader, val_loader, mesh,
                     rng, start_epoch):
    """AVA detection training loop (reference train_net.py detection branch)."""
    from ..data.preprocess import (
        make_detection_preprocess, make_detection_train_preprocess,
    )
    from ..utils.meters import AVAMeter
    from .state import make_detection_forward, make_detection_train_step

    step = compile_fence(make_detection_train_step(cfg, model, tx),
                         "det_train_step")
    fwd = compile_fence(make_detection_forward(cfg, model), "det_val_fwd")
    train_pre = make_detection_train_preprocess(cfg)
    preprocess = make_detection_preprocess(cfg)
    train_meter = AVAMeter(len(train_loader), cfg, mode="train")
    val_meter = AVAMeter(len(val_loader), cfg, mode="val")
    val_meter.video_idx_to_name = getattr(
        val_loader.dataset, "_video_idx_to_name", None
    )

    for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        shuffle_dataset(train_loader, cur_epoch)
        data_size = len(train_loader)
        train_meter.iter_tic()
        for cur_iter, batch in enumerate(train_loader):
            lr = lr_policy.get_lr_at_epoch(
                cfg, cur_epoch + float(cur_iter) / data_size
            )
            key = jax.random.fold_in(rng, cur_epoch * data_size + cur_iter)
            inputs, boxes = train_pre(
                key,
                shard_batch(mesh, batch["frames"]),
                shard_batch(mesh, batch["width"]),
                shard_batch(mesh, batch["boxes"]),
            )
            labels = shard_batch(mesh, batch["box_labels"])
            mask = shard_batch(mesh, batch["box_mask"])
            state, mets = step(state, inputs, boxes, labels, mask, lr, rng)
            mets = jax.device_get(mets)
            check_nan_losses(float(mets["loss"]))
            train_meter.update_stats(None, None, None,
                                     loss=float(mets["loss"]), lr=float(mets["lr"]))
            train_meter.log_iter_stats(cur_epoch, cur_iter)
        train_meter.iter_toc()
        train_meter.reset()

        if cu.is_checkpoint_epoch(cfg, cur_epoch):
            cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
        if _is_eval_epoch(cfg, cur_epoch):
            from .test import detection_box_mask, gather_across_hosts

            variables = {"params": state.params, "batch_stats": state.batch_stats}
            for cur_iter, batch in enumerate(val_loader):
                inputs = preprocess(shard_batch(mesh, batch["frames"]))
                boxes = shard_batch(mesh, batch["boxes"])
                # this host's rows of the batch-sharded global output —
                # device_get of the global array spans non-addressable
                # shards on other hosts and would crash (or mispair with
                # the host-local box metadata below)
                preds = fetch_local_rows(fwd(variables, inputs, boxes))
                m = detection_box_mask(batch)  # box_mask ∧ _valid pad drop
                ori = np.asarray(batch["ori_boxes"]).reshape(-1, 4)[m]
                meta = np.repeat(np.asarray(batch["metadata"]),
                                 batch["boxes"].shape[1], axis=0)[m]
                ori5 = np.concatenate(
                    [np.zeros((len(ori), 1)), ori], axis=1
                )
                p, ori5, meta = gather_across_hosts(preds[m], ori5, meta)
                val_meter.update_stats(p, ori5, meta)
                val_meter.log_iter_stats(cur_epoch, cur_iter)
            val_meter.log_epoch_stats(cur_epoch)
            val_meter.reset()
    cu.wait_for_saves()  # drain any in-flight async (orbax) checkpoint
    host_barrier("train_complete")  # see the classification trainer's note
    return state


def _is_eval_epoch(cfg, cur_epoch, multigrid_schedule=None) -> bool:
    """reference: utils/misc.py:193-214."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0
