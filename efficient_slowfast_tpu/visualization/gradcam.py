"""Grad-CAM for video models (reference: wdf_visualization/gradcam_video.py).

The reference registers torch forward/backward hooks on a target layer
(:59-118). The JAX formulation: with ``jax.grad`` the activation gradient is
obtained by re-running the model under ``flax.linen.intercept_methods`` with
an interceptor that RETURNS an explicit tensor as the target module's output —
differentiating the score w.r.t. that tensor is exactly d(score)/d(activation)
with no hooks and no mutable state.

CAM = ReLU( Σ_c mean_{T,H,W}(dscore/dA_c) · A_c ), per the Grad-CAM paper and
the reference's generate_cam_videos (:120-225).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _capture_activation(model, variables, inputs, target_path: str):
    """Forward pass capturing the target module's output (traceable: the
    captured activation is returned THROUGH the function, so the whole
    thing jits — eager interception would dispatch per-op)."""
    box: dict = {}

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if context.module.path and "/".join(context.module.path) == target_path:
            if context.method_name == "__call__":
                box["act"] = out
        return out

    with nn.intercept_methods(interceptor):
        preds = model.apply(variables, inputs, train=False)
    if "act" not in box:
        raise KeyError(
            f"target layer '{target_path}' not found; module paths are "
            "slash-joined flax paths like 's5/pathway0_res2'"
        )
    return preds, box["act"]


def _score_with_injection(model, variables, inputs, target_path: str,
                          activation, class_idx):
    """Score of class_idx with the target module's output replaced."""

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if (context.module.path
                and "/".join(context.module.path) == target_path
                and context.method_name == "__call__"):
            return activation
        return out

    with nn.intercept_methods(interceptor):
        preds = model.apply(variables, inputs, train=False)
    return preds[jnp.arange(preds.shape[0]), class_idx].sum()


class GradCAM:
    """Grad-CAM heatmaps for a target layer of a video model.

    target_layer: slash-joined flax module path, e.g. "s5/pathway0_res2"
    (reference README documents per-backbone target layers).

    Both passes (capture forward, injected-score grad) run jitted —
    compiled once per input geometry, then cheap to call per clip."""

    def __init__(self, model, variables, target_layer: str):
        self.model = model
        self.variables = variables
        self.target = target_layer
        self._fwd = jax.jit(lambda v, x: _capture_activation(
            model, v, x, target_layer))
        self._grad = jax.jit(lambda v, x, a, c: jax.grad(
            lambda a_: _score_with_injection(
                model, v, x, target_layer, a_, c))(a))

    def __call__(self, inputs, class_idx: Optional[np.ndarray] = None):
        # an unknown target layer raises KeyError at trace time (first
        # call) — jit preserves the exception class
        preds, act = self._fwd(self.variables, inputs)
        if class_idx is None:
            class_idx = jnp.argmax(preds, axis=-1)
        grads = self._grad(self.variables, inputs, act,
                           jnp.asarray(class_idx))

        def cam_of(a, g):
            # channel weights: global-average gradient (B, 1, 1, 1, C)
            weights = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
            cam = nn.relu(jnp.sum(weights * a, axis=-1))  # (B, T, H, W)
            cmin = cam.min(axis=(1, 2, 3), keepdims=True)
            cmax = cam.max(axis=(1, 2, 3), keepdims=True)
            return (cam - cmin) / jnp.maximum(cmax - cmin, 1e-8)

        # target module may emit a single tensor or a pathway list
        cams = jax.tree_util.tree_map(cam_of, act, grads)
        cams = jax.tree_util.tree_map(np.asarray, cams)
        return np.asarray(preds), cams


def overlay_heatmap(frames: np.ndarray, cam: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Blend per-frame heatmaps onto uint8 frames (reference:
    wdf_visualization/misc_functions.py heatmap overlay).

    frames (T, H, W, 3) uint8; cam (T', h, w) in [0, 1] — temporally and
    spatially resized to the frames with nearest/bilinear interpolation."""
    from PIL import Image

    t, h, w, _ = frames.shape
    tc = cam.shape[0]
    out = np.empty_like(frames)
    for i in range(t):
        ci = min(int(round(i * (tc - 1) / max(t - 1, 1))), tc - 1)
        heat = np.asarray(
            Image.fromarray((cam[ci] * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR
            ),
            np.float32,
        ) / 255.0
        # simple jet-like colormap: red↑ with heat, blue↓
        color = np.stack([
            heat * 255.0,
            np.maximum(0.0, 1.0 - np.abs(heat - 0.5) * 2) * 255.0,
            (1.0 - heat) * 255.0,
        ], axis=-1)
        out[i] = np.clip(
            (1 - alpha) * frames[i].astype(np.float32) + alpha * color, 0, 255
        ).astype(np.uint8)
    return out
