"""ROIAlign for TPU — pure-jax gather/bilinear formulation.

Replaces detectron2's C++/CUDA ROIAlign (reference:
config_slowfast/detectron2/detectron2/layers/csrc/ROIAlign/, used by
slowfast/models/head_helper.py:75-81). Semantics follow detectron2
``aligned=True``: box coordinates are scaled then shifted by −0.5 so samples
align with pixel centers; out-of-bounds samples (beyond [−1, size]) contribute
zero, like the CUDA kernel's border handling.

TPU note: torch's ``sampling_ratio=0`` means an adaptive per-box grid
(ceil(bin/out)); a data-dependent grid is not expressible with static shapes,
so a FIXED sampling grid (default 2×2 per bin, the detectron2 default for
typical feature strides) is used. For the AVA head (7×7 bins over ~14×14
features) the adaptive grid is ≤2 almost always, so this matches the
reference numerically for all but extremely large boxes.

Everything is batched gathers + elementwise math — XLA fuses it; boxes ride
the batch dimension so the op scales with detection count, not image size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,   # (B, H, W, C) channels-last
    boxes: jnp.ndarray,      # (R, 5) [batch_idx, x1, y1, x2, y2] in input coords
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:            # (R, output_size, output_size, C)
    b, h, w, c = features.shape
    out = output_size
    n = max(int(sampling_ratio), 1)

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

    # sample coordinates: (R, out*n)
    grid = (jnp.arange(out)[:, None] + (jnp.arange(n)[None, :] + 0.5) / n)
    grid = grid.reshape(-1)  # (out*n,)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

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
    # average the n×n samples per bin
    r = samples.shape[0]
    samples = samples.reshape(r, out, n, out, n, c)
    return samples.mean(axis=(2, 4))
