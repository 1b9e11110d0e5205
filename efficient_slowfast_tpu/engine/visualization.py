"""Model-input visualization (reference: tools/visualization.py:19-110).

Dumps de-normalized input clips to TensorBoard for
TENSORBOARD.MODEL_VIS.ENABLE jobs — the reference tool's exact scope
(input inspection only). Grad-CAM lives in the standalone CLI
(tools/gradcam_video.py, reference wdf_visualization/gradcam_video.py)."""

from __future__ import annotations

import numpy as np
import jax

from ..data.loader import construct_loader
from ..data.preprocess import make_test_preprocess
from ..models import build_model
from ..parallel.mesh import build_mesh, shard_batch
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, setup_logging
from ..visualization.tensorboard_vis import TensorboardWriter
from .state import create_train_state

logger = get_logger(__name__)


def visualize(cfg):
    setup_logging(cfg.OUTPUT_DIR)
    mesh = build_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state, _ = create_train_state(cfg, model, rng)
    state = cu.load_test_checkpoint(cfg, state)

    loader = construct_loader(cfg, "test")
    preprocess = make_test_preprocess(cfg)
    writer = TensorboardWriter(cfg)
    mean = np.asarray(cfg.DATA.MEAN)
    std = np.asarray(cfg.DATA.STD)

    from ..parallel.mesh import fetch_local_rows
    from .test import gather_across_hosts

    # Iterate the WHOLE test loader and gather every host's shard before
    # writing, like the reference (tools/visualization.py:19-66 gathers
    # inputs across GPUs and walks the loader) — a multi-host run inspects
    # the full input stream, not process 0's shard of one batch.
    for step, batch in enumerate(loader):
        frames = shard_batch(mesh, batch["frames"])
        widths = shard_batch(mesh, batch["width"])
        sidx = shard_batch(mesh, batch["spatial_idx"])
        portrait = (shard_batch(mesh, batch["portrait"])
                    if "portrait" in batch else None)
        inputs = preprocess(frames, widths, sidx, portrait)
        local = [fetch_local_rows(p) for p in inputs]
        if "_valid" in batch:  # drop loader pad rows before the gather
            keep = np.asarray(batch["_valid"]) > 0
            local = [p[keep] for p in local]
        gathered = gather_across_hosts(*local)  # collective: every host
        for p, clips in enumerate(gathered):
            video = np.asarray(clips, np.float32) * std + mean
            video = np.clip(video, 0.0, 1.0)
            writer.add_video(video, tag=f"Video Input Pathway {p}",
                             global_step=step)
    writer.close()
    logger.info("Visualization written.")
