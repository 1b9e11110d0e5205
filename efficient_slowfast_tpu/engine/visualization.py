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

    global_idx = -1
    for batch in loader:
        frames = shard_batch(mesh, batch["frames"])
        widths = shard_batch(mesh, batch["width"])
        sidx = shard_batch(mesh, batch["spatial_idx"])
        portrait = (shard_batch(mesh, batch["portrait"])
                    if "portrait" in batch else None)
        inputs = preprocess(frames, widths, sidx, portrait)
        for p, path in enumerate(jax.device_get(inputs)):
            video = np.asarray(path) * std + mean  # revert normalization
            video = np.clip(video, 0.0, 1.0)
            global_idx += 1
            writer.add_video(video, tag=f"Video Input Pathway {p}",
                             global_step=global_idx)
        break  # one batch is enough for input inspection
    writer.close()
    logger.info("Visualization written.")
