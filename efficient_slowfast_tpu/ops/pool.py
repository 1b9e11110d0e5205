"""Pooling ops for channels-last 5-D tensors (B, T, H, W, C).

Torch-style symmetric integer padding; wrappers over ``flax.linen`` pooling
(which lowers to XLA reduce_window — fused and MXU-friendly).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def max_pool3d(x, kernel, stride=None, padding=(0, 0, 0)):
    k = _triple(kernel)
    s = _triple(stride) if stride is not None else k
    p = _triple(padding)
    return nn.max_pool(x, window_shape=k, strides=s, padding=[(pi, pi) for pi in p])


def avg_pool3d(x, kernel, stride=None, padding=(0, 0, 0)):
    k = _triple(kernel)
    s = _triple(stride) if stride is not None else k
    p = _triple(padding)
    # Fail loudly where torch would: a window larger than the (padded)
    # input yields an empty output — downstream that surfaces as silent
    # NaNs (e.g. a head pool built from a stale cfg.DATA.NUM_FRAMES).
    for d in range(3):
        if k[d] > x.shape[1 + d] + 2 * p[d]:
            raise ValueError(
                f"avg_pool3d window {k} larger than input "
                f"{x.shape[1:4]} (padding {p})"
            )
    # count_include_pad=True to match torch.nn.AvgPool3d default.
    return nn.avg_pool(
        x, window_shape=k, strides=s, padding=[(pi, pi) for pi in p],
        count_include_pad=True,
    )


def adaptive_avg_pool3d_1(x):
    """AdaptiveAvgPool3d((1,1,1)) — global mean over (T, H, W), keepdims."""
    return jnp.mean(x, axis=(1, 2, 3), keepdims=True)


def global_avg_pool(x):
    """Global mean over (T, H, W) without keepdims → (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))


def temporal_downsample_max(x, alpha: int):
    """MaxPool3d(kernel=(alpha,1,1), stride=(alpha,1,1)) — CMDA Fast→Slow
    temporal squeeze (reference: custom_video_model_builder.py:127-135)."""
    return max_pool3d(x, (alpha, 1, 1), (alpha, 1, 1))


def temporal_upsample_nearest(x, alpha: int):
    """Nearest temporal upsample ×alpha — CMDA Slow→Fast expand
    (reference: custom_video_model_builder.py:137-146)."""
    return jnp.repeat(x, alpha, axis=1)
