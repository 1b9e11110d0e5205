"""Multi-view testing engine (reference: tools/test_net.py:21-189).

Each video appears NUM_ENSEMBLE_VIEWS × NUM_SPATIAL_CROPS times in the test
set; per-clip post-softmax scores are ensembled per video (sum or max) in the
TestMeter, then top-1/top-k computed. The 30-view batch rides the device in
one jitted (preprocess + forward) program; no all_gather is needed — under
pjit the gather is the device→host fetch of the (already global) outputs.
"""

from __future__ import annotations

import numpy as np
import jax

from ..data.loader import construct_loader
from ..data.preprocess import make_test_preprocess
from ..models import build_model
from ..parallel.mesh import (build_mesh, compile_fence, fetch_local_rows,
                             shard_batch)
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, setup_logging
from ..utils.meters import TestMeter
from .state import create_train_state, make_forward

logger = get_logger(__name__)


def gather_across_hosts(*arrays):
    """Concatenate every host's shard of per-clip eval outputs.

    Multi-host equivalent of the reference's all_gather at test_net.py:95-98;
    variable row counts (the _valid mask drops different numbers of padded
    rows per host) ride ``process_allgather`` like the reference's gloo
    all_gather_unaligned (reference: distributed.py:155-255). Identity on a
    single host.
    """
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils as mhu

    # Row counts differ per host (each drops its own padded rows), but
    # process_allgather needs equal shapes — gather counts, pad to the max,
    # gather, then slice each host's real rows back out (the reference's
    # pad-then-unpad all_gather_unaligned).
    n = int(arrays[0].shape[0])
    counts = np.asarray(mhu.process_allgather(np.asarray(n))).reshape(-1)
    m = int(counts.max())
    out = []
    for a in arrays:
        pad = [(0, m - n)] + [(0, 0)] * (a.ndim - 1)
        g = np.asarray(mhu.process_allgather(np.pad(a, pad), tiled=False))
        out.append(
            np.concatenate([g[i, : counts[i]] for i in range(len(counts))])
        )
    return tuple(out)


def perform_test(cfg, state, model, loader, meter, mesh, quant=None):
    preprocess = make_test_preprocess(cfg)
    fwd = make_forward(cfg, model)
    # one jitted program: XLA folds the conv-layout change of the packed
    # pathways into the preprocess epilogue instead of a separate 1.6 GB
    # copy between the two dispatches
    run = compile_fence(  # multi-host: compile + barrier before dispatch
        jax.jit(lambda v, f, w, s, p: fwd(v, preprocess(f, w, s, p))),
        "test_run")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if quant is not None:
        variables["quant"] = quant
    from ..data.loader import prefetch_to_device

    meter.iter_tic()
    for cur_iter, batch in enumerate(prefetch_to_device(
        loader, mesh, keys=("frames", "width", "spatial_idx", "portrait"),
        depth=cfg.DATA_LOADER.PREFETCH_DEPTH, host_copy=("spatial_idx",),
    )):
        frames, widths, sidx = (batch["frames"], batch["width"],
                                batch["spatial_idx"])
        # this host's rows only: labels/clip ids/_valid below are the
        # host-local batch metadata (multi-host: remote shards are neither
        # addressable nor ours to ensemble — gather_across_hosts merges)
        preds = fetch_local_rows(
            run(variables, frames, widths, sidx, batch["portrait"]))
        labels = np.asarray(batch["label"])
        clip_ids = (
            np.asarray(batch["index"]) * meter.num_clips
            + np.asarray(batch["temporal_idx"]) * cfg.TEST.NUM_SPATIAL_CROPS
            # spatial_idx rides to device for the preprocess; its host copy
            # (prefetch host_copy) pairs with the host-local metadata
            # without a D2H fetch through the tunnel
            + np.asarray(batch["spatial_idx_host"])
        )
        if "_valid" in batch:
            # drop loader padding (pad_to_full mask) before ensembling
            keep = np.asarray(batch["_valid"]) > 0
            preds, labels, clip_ids = preds[keep], labels[keep], clip_ids[keep]
        preds, labels, clip_ids = gather_across_hosts(preds, labels, clip_ids)
        meter.update_stats(preds, labels, clip_ids)
        if (cur_iter + 1) % cfg.LOG_PERIOD == 0:
            meter.log_iter_stats(cur_iter)
    meter.iter_toc()
    return meter.finalize_metrics(ks=(1, cfg.TRAIN.TOPK))


def test(cfg):
    setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:\n%s", cfg.dump())

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state, _ = create_train_state(cfg, model, rng)
    state = cu.load_test_checkpoint(cfg, state)

    loader = construct_loader(cfg, "test")

    quant = None
    if cfg.TPU.INT8_EVAL:
        # serving path: load the persisted calibration when one matches
        # this model/config, else record per-layer activation ranges on the
        # first calibration batches and persist them — calibrate once,
        # serve many (serving an uncalibrated scale would zero the net,
        # ops/conv.py)
        from .quantize import (calibrate_for_test, load_calibration,
                               save_calibration)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        quant = load_calibration(cfg, variables)
        if quant is not None:
            logger.info("TPU.INT8_EVAL: loaded persisted calibration")
        else:
            logger.info("TPU.INT8_EVAL: calibrating activation ranges on %d "
                        "test batch(es)", max(1, cfg.TPU.INT8_CALIB_BATCHES))
            quant = calibrate_for_test(cfg, model, variables, mesh)
            path = save_calibration(cfg, variables, quant)
            logger.info("TPU.INT8_EVAL: persisted calibration to %s", path)

    if cfg.DETECTION.ENABLE:
        return _test_detection(cfg, state, model, loader, mesh, quant=quant)

    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_items = len(loader.dataset)
    assert num_items % num_clips == 0, (
        f"test set size {num_items} not divisible by {num_clips} views"
    )
    meter = TestMeter(
        num_videos=num_items // num_clips,
        num_clips=num_clips,
        num_cls=cfg.MODEL.NUM_CLASSES,
        overall_iters=len(loader),
        multi_label=cfg.DATA.MULTI_LABEL,
        ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
        topk=cfg.TRAIN.TOPK,
    )
    stats = perform_test(cfg, state, model, loader, meter, mesh, quant=quant)
    return stats


def _test_detection(cfg, state, model, loader, mesh, quant=None):
    """AVA detection test: full-dataset mAP (reference test_net.py detection)."""
    from ..data.preprocess import make_detection_preprocess
    from ..utils.meters import AVAMeter
    from .state import make_detection_forward

    preprocess = make_detection_preprocess(cfg)
    # multi-host: compile + barrier before first dispatch (compile skew
    # tolerance is ~30 s; see parallel/mesh.py::compile_fence)
    fwd = compile_fence(make_detection_forward(cfg, model), "det_test_fwd")
    meter = AVAMeter(len(loader), cfg, mode="test")
    meter.video_idx_to_name = getattr(loader.dataset, "_video_idx_to_name", None)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if quant is not None:
        variables["quant"] = quant
    for cur_iter, batch in enumerate(loader):
        inputs = preprocess(shard_batch(mesh, batch["frames"]))
        boxes = shard_batch(mesh, batch["boxes"])
        preds = fetch_local_rows(fwd(variables, inputs, boxes))
        m = detection_box_mask(batch)
        ori = np.asarray(batch["ori_boxes"]).reshape(-1, 4)[m]
        meta = np.repeat(np.asarray(batch["metadata"]),
                         batch["boxes"].shape[1], axis=0)[m]
        ori5 = np.concatenate([np.zeros((len(ori), 1)), ori], axis=1)
        # every host holds only its loader shard's boxes — merge before the
        # meter so finalize_metrics sees the full dataset (the reference's
        # all_gather_unaligned at train_net.py eval_epoch detection branch)
        p, ori5, meta = gather_across_hosts(preds[m], ori5, meta)
        meter.update_stats(p, ori5, meta)
        meter.log_iter_stats(None, cur_iter)
    mAP = meter.finalize_metrics()
    return {"map": mAP}


def detection_box_mask(batch) -> np.ndarray:
    """Flat (B*MAX,) bool mask of real boxes in a detection eval batch.

    Combines the per-box ``box_mask`` with the loader's per-clip ``_valid``
    pad mask: pad_to_full wraps REAL clips to fill the tail batch, so their
    duplicated boxes carry box_mask=1 and would be double-counted in mAP
    without the clip-level drop (classification paths drop the same way,
    perform_test/eval_epoch)."""
    m = np.asarray(batch["box_mask"]) > 0  # (B, MAX)
    if "_valid" in batch:
        m = m & (np.asarray(batch["_valid"]).reshape(-1, 1) > 0)
    return m.reshape(-1)
