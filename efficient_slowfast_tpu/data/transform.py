"""On-device (jit-compatible) video transforms.

TPU-first redesign of the reference's per-worker CPU transforms
(reference: slowfast/datasets/transform.py — random_short_side_scale_jitter
:283-337, random_crop :359-392, horizontal_flip :395-422, uniform_crop
:425-468; slowfast/datasets/utils.py — tensor_normalize :298-317,
spatial_sampling :151-203).

Key idea: the reference's "resize short side to a random scale, then crop a
fixed window" is re-expressed as a single **bilinear crop-and-resize with a
traced source box** — output shapes stay static under jit while the scale
factor is a traced random value, so one compiled program covers the whole
jitter range. All ops are batched (leading B axis) and run fused on device;
randomness comes from counter-based `jax.random` keys.

Frames are channels-last uint8/float (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def tensor_normalize(frames: jnp.ndarray, mean, std) -> jnp.ndarray:
    """uint8 → float, /255, −mean, /std (reference: utils.py:298-317)."""
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def crop_and_resize(
    frames: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Bilinear sample an axis-aligned box from each clip.

    frames: (B, T, H, W, C) float; boxes: (B, 4) [y0, x0, y1, x1] in source
    pixel coordinates (half-open, i.e. the box covers [y0, y1) like a crop of
    size y1-y0). Output (B, T, out, out, C).

    Sampling grid matches torch's bilinear `interpolate(align_corners=False)`
    followed by integer crop when the box is integral and scale matches —
    sample centers at box_start + (i + 0.5) * box_size / out - 0.5.
    """
    b, t, h, w, c = frames.shape
    out = out_size

    y0, x0, y1, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    idx = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out  # (out,)

    def sample_axis(start, stop, size):
        # (B, out) fractional source coordinates
        return start[:, None] + idx[None, :] * (stop - start)[:, None] - 0.5

    ys = sample_axis(y0, y1, h)  # (B, out)
    xs = sample_axis(x0, x1, w)

    def gather_bilinear(fr, yy, xx):
        # fr: (T, H, W, C); yy, xx: (out,)
        y0i = jnp.clip(jnp.floor(yy), 0, h - 1)
        x0i = jnp.clip(jnp.floor(xx), 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        wy = jnp.clip(yy - y0i, 0.0, 1.0)
        wx = jnp.clip(xx - x0i, 0.0, 1.0)
        y0i, x0i, y1i, x1i = (a.astype(jnp.int32) for a in (y0i, x0i, y1i, x1i))
        # gather rows then columns: (T, out, W, C) → (T, out, out, C)
        r0 = fr[:, y0i, :, :]
        r1 = fr[:, y1i, :, :]
        rows = r0 + wy[None, :, None, None] * (r1 - r0)
        c0 = rows[:, :, x0i, :]
        c1 = rows[:, :, x1i, :]
        return c0 + wx[None, None, :, None] * (c1 - c0)

    return jax.vmap(gather_bilinear)(frames, ys, xs)


def random_scale_crop_boxes(
    rng: jax.Array,
    batch: int,
    height: int,
    widths: jnp.ndarray,
    min_scale: int,
    max_scale: int,
    crop_size: int,
    inverse_uniform: bool = False,
    u_x: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample per-clip boxes equivalent to scale-jitter + random crop.

    The reference resizes the short side to s ~ U[min_scale, max_scale] then
    random-crops `crop_size` (reference: transform.py:283-337 + :359-392).
    Equivalently we crop a window of source size crop_size * (short/s) at a
    uniform position, and resize it to crop_size. `widths` gives each clip's
    true (unpadded) width; `height` is the canvas short side.

    ``u_x`` (per-clip in [0, 1]) replaces the device-sampled horizontal
    position with a HOST-chosen one. For content whose long axis exceeds the
    2:1 canvas, the host positions its canvas window at ``round(u·(L−wc))``
    and passes the same ``u`` here (datasets.fit_canvas_into window_u); the
    composed offset ``u·(L−wc) + u·(wc−win) = u·(L−win)`` is then uniform
    over the FULL resized long axis, exactly the reference's range
    (transform.py:359-392) — not just the window the device can see.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    if inverse_uniform:
        inv = jax.random.uniform(
            k1, (batch,), minval=1.0 / max_scale, maxval=1.0 / min_scale
        )
        scale = 1.0 / inv
    else:
        scale = jax.random.uniform(
            k1, (batch,), minval=float(min_scale), maxval=float(max_scale)
        )
    short = jnp.minimum(jnp.float32(height), widths.astype(jnp.float32))
    win = crop_size * short / scale  # source window size (per clip)
    wmax_y = jnp.float32(height) - win
    wmax_x = widths.astype(jnp.float32) - win
    oy = jax.random.uniform(k2, (batch,)) * jnp.maximum(wmax_y, 0.0)
    fx = jax.random.uniform(k3, (batch,)) if u_x is None \
        else u_x.astype(jnp.float32)
    ox = fx * jnp.maximum(wmax_x, 0.0)
    return jnp.stack([oy, ox, oy + win, ox + win], axis=1)


def uniform_crop_boxes(
    height: int,
    widths: jnp.ndarray,
    scale: int,
    crop_size: int,
    spatial_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic 3-position test crops (reference: transform.py:425-468).

    Short side is resized to `scale`, then a `crop_size` window is taken at
    position spatial_idx ∈ {0: left/top, 1: center, 2: right/bottom}.
    Expressed as source boxes of size crop_size * short / scale.
    """
    widths = widths.astype(jnp.float32)
    short = jnp.minimum(jnp.float32(height), widths)
    win = crop_size * short / float(scale)
    max_y = jnp.float32(height) - win
    max_x = widths - win
    # centered offsets use ceil like the reference (int(math.ceil((w-size)/2)),
    # transform.py:447-448) so integer-sized crops land on the exact pixels
    sidx = spatial_idx.astype(jnp.float32)

    def pos(max_off):  # 0 → 0, 1 → ceil(max/2), 2 → max
        return jnp.where(sidx == 0, 0.0,
                         jnp.where(sidx == 1.0, jnp.ceil(max_off / 2.0),
                                   max_off))

    # wider-than-tall: offset along x; taller-than-wide: along y (portrait
    # canvases are stored transposed — datasets.fit_canvas_into — so in
    # practice is_wide always holds and the x axis is the crop axis)
    is_wide = widths >= height
    oy = jnp.where(is_wide, jnp.ceil(max_y / 2.0), pos(max_y))
    ox = jnp.where(is_wide, pos(max_x), jnp.ceil(max_x / 2.0))
    return jnp.stack([oy, ox, oy + win, ox + win], axis=1)


def transpose_portrait(frames: jnp.ndarray, portrait: jnp.ndarray):
    """Swap H↔W of square crops flagged as transposed portrait storage.

    `frames` (B, T, S, S, C); `portrait` (B,) {0,1}. Tall clips ride the
    canvas axis-swapped (datasets.fit_canvas_into keep_portrait) so the
    uniform/random crop along canvas-x covers the original vertical axis;
    this restores their orientation after the crop. A pure transpose is its
    own inverse — no pixel is interpolated or flipped.
    """
    swapped = jnp.swapaxes(frames, 2, 3)
    flag = portrait.astype(bool)[:, None, None, None, None]
    return jnp.where(flag, swapped, frames)


def horizontal_flip(rng: jax.Array, frames: jnp.ndarray, prob: float = 0.5):
    """Per-clip random horizontal flip (reference: transform.py:395-422)."""
    b = frames.shape[0]
    do = jax.random.uniform(rng, (b,)) < prob
    flipped = frames[:, :, :, ::-1, :]
    return jnp.where(do[:, None, None, None, None], flipped, frames)


def temporal_sampling(frames: jnp.ndarray, start_idx, end_idx, num_samples: int):
    """linspace index_select over T (reference: decoder.py:35-52).

    Works with traced scalar start/end (per-batch shared) or static ints.
    frames: (B, T, H, W, C) or (T, H, W, C).
    """
    t_axis = 1 if frames.ndim == 5 else 0
    t = frames.shape[t_axis]
    idx = jnp.linspace(start_idx, end_idx, num_samples)
    idx = jnp.clip(jnp.round(idx), 0, t - 1).astype(jnp.int32)
    return jnp.take(frames, idx, axis=t_axis)


def color_normalization(frames, mean, stddev):
    return (frames - jnp.asarray(mean)) / jnp.asarray(stddev)


def lighting_jitter(rng, frames, alphastd, eigval, eigvec):
    """PCA lighting noise (reference: transform.py:636-664)."""
    if alphastd == 0.0:
        return frames
    b = frames.shape[0]
    alpha = jax.random.normal(rng, (b, 3)) * alphastd
    eigval = jnp.asarray(eigval, jnp.float32)  # (3,)
    eigvec = jnp.asarray(eigvec, jnp.float32)  # (3, 3)
    rgb = (alpha[:, None, :] * eigval[None, None, :] * eigvec[None, :, :]).sum(-1)
    return frames + rgb[:, None, None, None, :]


def _blend(a, b, alpha):
    return alpha * a + (1.0 - alpha) * b


def brightness_jitter(rng, var, frames):
    b = frames.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (b,), minval=-var, maxval=var)
    return _blend(frames, jnp.zeros_like(frames), alpha[:, None, None, None, None])


def contrast_jitter(rng, var, frames):
    b = frames.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (b,), minval=-var, maxval=var)
    gray = frames.mean(axis=(2, 3, 4), keepdims=True)
    return _blend(frames, gray, alpha[:, None, None, None, None])


def saturation_jitter(rng, var, frames):
    b = frames.shape[0]
    alpha = 1.0 + jax.random.uniform(rng, (b,), minval=-var, maxval=var)
    gray = frames.mean(axis=-1, keepdims=True)
    return _blend(frames, gray, alpha[:, None, None, None, None])


_LUMA = (0.299, 0.587, 0.114)  # ITU-R 601-2, PIL convert("L") weights


def pil_color_jitter(rng, frames, lo=0.4, hi=1.4, widths=None):
    """Jester-style clip-level color jitter (reference: decoder.py:447-454 +
    transform.py RandomColorJitter :692-717).

    One enhancement factor f ~ U(lo, hi) per clip for each of brightness,
    contrast, color (saturation), applied in that fixed PIL order:
      brightness: f·x ; contrast: blend with the mean luma ; color: blend
      with the per-pixel luma. `frames` are floats in [0, 1] (pre mean/std).
    `widths` (B,) restricts the contrast mean to the unpadded content region.
    """
    b = frames.shape[0]
    kb, kc, ks = jax.random.split(rng, 3)
    luma_w = jnp.asarray(_LUMA, jnp.float32)

    def factor(k):
        return jax.random.uniform(k, (b, 1, 1, 1, 1), minval=lo, maxval=hi)

    x = frames * factor(kb)  # brightness: blend with black

    luma = (x * luma_w).sum(-1, keepdims=True)
    if widths is not None:
        wmask = (jnp.arange(frames.shape[3])[None, :]
                 < widths[:, None]).astype(jnp.float32)  # (B, W)
        wmask = wmask[:, None, None, :, None]
        mean_l = ((luma * wmask).sum(axis=(1, 2, 3), keepdims=True)
                  / jnp.maximum(wmask.sum(axis=(1, 2, 3), keepdims=True), 1.0))
    else:
        mean_l = luma.mean(axis=(1, 2, 3), keepdims=True)
    fc = factor(kc)
    x = fc * x + (1.0 - fc) * mean_l  # contrast

    luma = (x * luma_w).sum(-1, keepdims=True)
    fs = factor(ks)
    return fs * x + (1.0 - fs) * luma  # color/saturation


def transform_boxes_to_crop(boxes, crop_boxes, out_size):
    """Map (B, N, 4) [x1, y1, x2, y2] canvas-pixel boxes through the
    per-clip crop window (B, 4) [y0, x0, y1, x1] into out_size crop coords,
    clipped to the image (reference: cv2_transform scale/crop box co-ops)."""
    y0, x0, y1, x1 = (crop_boxes[:, i] for i in range(4))
    sx = out_size / jnp.maximum(x1 - x0, 1e-6)
    sy = out_size / jnp.maximum(y1 - y0, 1e-6)
    out = jnp.stack([
        (boxes[..., 0] - x0[:, None]) * sx[:, None],
        (boxes[..., 1] - y0[:, None]) * sy[:, None],
        (boxes[..., 2] - x0[:, None]) * sx[:, None],
        (boxes[..., 3] - y0[:, None]) * sy[:, None],
    ], axis=-1)
    return jnp.clip(out, 0.0, out_size - 1.0)


def horizontal_flip_with_boxes(rng, frames, boxes, prob=0.5):
    """Joint clip+box flip; boxes (B, N, 4) [x1, y1, x2, y2] in pixel coords
    of the (unpadded) frame (reference: cv2_transform.horizontal_flip_list)."""
    b, _, _, w, _ = frames.shape
    do = jax.random.uniform(rng, (b,)) < prob
    flipped = frames[:, :, :, ::-1, :]
    frames = jnp.where(do[:, None, None, None, None], flipped, frames)
    fx1 = (w - 1.0) - boxes[..., 2]
    fx2 = (w - 1.0) - boxes[..., 0]
    fboxes = jnp.stack([fx1, boxes[..., 1], fx2, boxes[..., 3]], axis=-1)
    boxes = jnp.where(do[:, None, None], fboxes, boxes)
    return frames, boxes


def color_jitter(rng, frames, brightness=0.0, contrast=0.0, saturation=0.0):
    """Randomly-ordered brightness/contrast/saturation (reference
    transform.py:542-580; order randomization replaced by a fixed random
    permutation per batch for jit-compatibility)."""
    ks = jax.random.split(rng, 4)
    order = jax.random.permutation(ks[0], 3)
    def apply(i, fr):
        fns = [
            lambda f: brightness_jitter(ks[1], brightness, f) if brightness else f,
            lambda f: contrast_jitter(ks[2], contrast, f) if contrast else f,
            lambda f: saturation_jitter(ks[3], saturation, f) if saturation else f,
        ]
        return jax.lax.switch(order[i], fns, fr)
    fr = frames
    for i in range(3):
        fr = apply(i, fr)
    return fr
