"""ROIAlign for TPU — pure-jax gather/bilinear formulation.

Replaces detectron2's C++/CUDA ROIAlign (reference:
config_slowfast/detectron2/detectron2/layers/csrc/ROIAlign/, used by
slowfast/models/head_helper.py:49-81 with ``sampling_ratio=0``). Semantics
follow detectron2 ``aligned=True``: box coordinates are scaled then shifted
by −0.5 so samples align with pixel centers; out-of-bounds samples (beyond
[−1, size]) contribute zero but still count toward the bin average, like the
CUDA kernel's border handling.

``sampling_ratio=0`` is torch's ADAPTIVE grid: each ROI samples
ceil(bin_h) × ceil(bin_w) points per bin (ROIAlign_cpu.cpp
``roi_bin_grid_h = ceil(roi_height / pooled_height)``). A data-dependent
sample count is not expressible with static shapes under jit, so the kernel
samples a static ceil(max(H, W)/out) grid per bin and MASKS samples beyond
each ROI's true adaptive count — numerically identical to torch for every
box that fits the feature map (boxes are clipped to the crop upstream, so
the static cap is exact; a hypothetical larger box would be under-sampled
at the cap rather than erroring).

Everything is batched gathers + elementwise math — XLA fuses it; boxes ride
the batch dimension so the op scales with detection count, not image size.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,   # (B, H, W, C) channels-last
    boxes: jnp.ndarray,      # (R, 5) [batch_idx, x1, y1, x2, y2] in input coords
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:            # (R, output_size, output_size, C)
    b, h, w, c = features.shape
    out = output_size
    r = boxes.shape[0]

    batch_idx = boxes[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 1] * spatial_scale - offset
    y1 = boxes[:, 2] * spatial_scale - offset
    x2 = boxes[:, 3] * spatial_scale - offset
    y2 = boxes[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    if sampling_ratio > 0:
        n = int(sampling_ratio)
        g_h = jnp.full((r,), float(n), jnp.float32)
        g_w = g_h
    else:
        # static cap: clipped boxes span at most the feature map, whose bins
        # are at most ceil(max(H, W)/out) wide.
        # g_* is torch's raw grid count ceil(bin) WITHOUT a lower clamp —
        # for degenerate (zero/negative-area) boxes it is <= 0, so NO sample
        # is active and the output is exactly torch's 0 (ROIAlign_cpu.cpp
        # runs zero grid-loop iterations and divides by count=max(grid,1))
        n = max(1, math.ceil(max(h, w) / out))
        g_h = jnp.minimum(jnp.ceil(bin_h), float(n))
        g_w = jnp.minimum(jnp.ceil(bin_w), float(n))
    # position math needs a strictly-positive divisor; degenerate grids are
    # masked out below so the clamp never leaks into the output
    n_h = jnp.clip(g_h, 1.0, None)
    n_w = jnp.clip(g_w, 1.0, None)

    # per-ROI sample grid: position ph + (i + 0.5)/n_axis within each bin,
    # flattened to (R, out*n); samples with i >= n_axis are masked below
    ph = jnp.arange(out, dtype=jnp.float32)           # (out,)
    sub = jnp.arange(n, dtype=jnp.float32) + 0.5      # (n,)
    gy = ph[None, :, None] + (sub[None, :] / n_h[:, None])[:, None, :]
    gx = ph[None, :, None] + (sub[None, :] / n_w[:, None])[:, None, :]
    ys = y1[:, None] + gy.reshape(r, out * n) * bin_h[:, None]
    xs = x1[:, None] + gx.reshape(r, out * n) * bin_w[:, None]
    my = jnp.arange(n)[None, :] < g_h[:, None]        # (R, n)
    mx = jnp.arange(n)[None, :] < g_w[:, None]

    def sample_one(feat, yy, xx):
        # feat (H, W, C); yy, xx (out*n,) → (out*n, out*n, C)
        def axis_weights(v, size):
            valid = (v >= -1.0) & (v <= size)
            vc = jnp.clip(v, 0.0, size - 1)
            lo = jnp.floor(vc)
            hi = jnp.minimum(lo + 1, size - 1)
            frac = vc - lo
            return lo.astype(jnp.int32), hi.astype(jnp.int32), frac, valid

        y_lo, y_hi, fy, vy = axis_weights(yy, h)
        x_lo, x_hi, fx, vx = axis_weights(xx, w)

        r_lo = feat[y_lo]            # (out*n, W, C)
        r_hi = feat[y_hi]
        rows = r_lo + fy[:, None, None] * (r_hi - r_lo)
        c_lo = rows[:, x_lo]         # (out*n, out*n, C)
        c_hi = rows[:, x_hi]
        vals = c_lo + fx[None, :, None] * (c_hi - c_lo)
        mask = (vy[:, None] & vx[None, :]).astype(vals.dtype)
        return vals * mask[..., None]

    samples = jax.vmap(sample_one)(features[batch_idx], ys, xs)
    # masked average over each bin's ACTIVE n_h×n_w samples (adaptive grid);
    # for sampling_ratio>0 every sample is active and this is a plain mean
    samples = samples.reshape(r, out, n, out, n, c)
    active = (my[:, None, :, None, None] & mx[:, None, None, None, :])
    # torch: count = max(grid_h * grid_w, 1) — degenerate boxes divide an
    # empty (all-masked) sum by 1 and pool to exactly zero
    count = jnp.maximum(g_h * g_w, 1.0)[:, None, None, None]
    pooled = (samples * active[..., None].astype(samples.dtype)).sum(
        axis=(2, 4))
    return pooled / count.astype(samples.dtype)
