"""Grad-CAM over a whole video clip → overlay mp4/GIF per pathway.

Reference: ``wdf_visualization/gradcam_video.py:59-402`` — a standalone tool
that loads a cfg + checkpoint, hooks a target layer, backprops a one-hot
class score, and writes per-frame CAM overlays for both pathways as
images/GIF. Here the CAM comes from :mod:`.gradcam`'s intercept-methods
formulation (no hooks, one ``jax.grad``), the clip comes through the native
decoder, and the overlays stream through the native mp4 encoder — the same
components the demo serves with, so the tool needs no cv2/moviepy.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..data import decoder
from ..data.preprocess import make_test_preprocess
from ..models import build_model
from ..utils import checkpoint as cu
from ..utils.logging import get_logger
from .gradcam import GradCAM, overlay_heatmap

logger = get_logger(__name__)


def _denormalize(pathway: np.ndarray, mean, std) -> np.ndarray:
    """Revert DATA.MEAN/STD normalization back to uint8 frames."""
    video = np.asarray(pathway) * np.asarray(std) + np.asarray(mean)
    return (np.clip(video, 0.0, 1.0) * 255).astype(np.uint8)


def gradcam_video(cfg, video_path: str, target_layer: str,
                  target_class: Optional[int] = None,
                  out_dir: Optional[str] = None,
                  write_gif: bool = False) -> dict:
    """Run Grad-CAM on one video and write per-pathway overlay videos.

    Returns ``{"predictions": (1, C) np.ndarray, "outputs": [paths...]}``.
    ``target_layer`` is a slash-joined flax module path (e.g. ``"s5"`` or
    ``"s4/pathway1_res3"``), matching the reference's stage-name choices
    (gradcam_video.py:31-36 offers s4/s5/fuse layers).
    """
    out_dir = out_dir or cfg.OUTPUT_DIR or "."
    os.makedirs(out_dir, exist_ok=True)

    from ..engine.state import create_train_state

    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state, _ = create_train_state(cfg, model, rng)
    state = cu.load_test_checkpoint(cfg, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    clip = decoder.decode_clip(
        video_path, cfg.DATA.NUM_FRAMES, cfg.DATA.SAMPLING_RATE,
        0, 1, cfg.DATA.TARGET_FPS, cfg.DATA.TEST_CROP_SIZE, False,
    )
    if clip is None:
        raise RuntimeError(f"cannot decode {video_path}")

    preprocess = make_test_preprocess(cfg)
    inputs = preprocess(
        np.asarray(clip)[None],
        np.asarray([clip.shape[2]], np.int32),
        np.asarray([1], np.int32),  # center crop, the single-view default
    )

    class_idx = None
    if target_class is not None:
        class_idx = np.asarray([int(target_class)])
    preds, cams = GradCAM(model, variables, target_layer)(inputs, class_idx)
    shown = int(np.argmax(preds[0])) if target_class is None else int(
        target_class)
    logger.info("Grad-CAM class %d (score %.4f) at layer '%s'",
                shown, float(preds[0, shown]), target_layer)

    # A stage-output target yields one CAM per pathway; a deeper
    # single-tensor target (e.g. "s4/pathway1_res3") yields ONE CAM —
    # overlay it on every pathway clip (overlay_heatmap interpolates the
    # CAM's T'/h'/w' grid onto each clip's geometry).
    if not isinstance(cams, (list, tuple)):
        cams = [cams] * len(inputs)

    # playback rate: the clip's NUM_FRAMES fast frames span
    # NUM_FRAMES*SAMPLING_RATE source frames at TARGET_FPS (the demo's
    # output-path math); a pathway with fewer frames covers the SAME
    # wall-clock span, so its fps scales by its frame count
    fast_fps = cfg.DATA.TARGET_FPS / max(cfg.DATA.SAMPLING_RATE, 1)
    stem = os.path.splitext(os.path.basename(video_path))[0]
    safe_layer = target_layer.replace("/", "_")
    outputs = []
    for p, (pathway, cam) in enumerate(zip(inputs, cams)):
        frames = _denormalize(jax.device_get(pathway)[0],
                              cfg.DATA.MEAN, cfg.DATA.STD)
        overlay = overlay_heatmap(frames, cam[0])
        fps = max(1, round(fast_fps * frames.shape[0] / cfg.DATA.NUM_FRAMES))
        path = os.path.join(
            out_dir, f"gradcam_{stem}_{safe_layer}_pathway{p}.mp4")
        with decoder.VideoEncoder(path, overlay.shape[2], overlay.shape[1],
                                  fps) as enc:
            enc.append(overlay)
        outputs.append(path)
        if write_gif:
            from PIL import Image

            gif = path[:-4] + ".gif"
            ims = [Image.fromarray(f) for f in overlay]
            ims[0].save(gif, save_all=True, append_images=ims[1:],
                        duration=int(1000 / fps), loop=0)
            outputs.append(gif)
    logger.info("Wrote %s", ", ".join(outputs))
    return {"predictions": np.asarray(preds), "outputs": outputs}
