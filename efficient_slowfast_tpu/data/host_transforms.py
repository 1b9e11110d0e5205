"""Host-side (PIL/numpy) clip transform classes.

Reference: slowfast/datasets/transform.py:24-282 — the PIL-based
Compose/Scale/RandomRotate/RandomResize/Gaussian_blur/SaltImage/
Temporal*Crop classes used by the frame-folder (wheel/tired/smoke) pipelines.
Device-side equivalents of the tensor ops live in data/transform.py; these
host classes exist for CPU-side augmentation of frame-folder clips where the
reference applies them before tensorization.

All operate on uint8 numpy clips (T, H, W, C) and compose with `Compose`.
"""

from __future__ import annotations

import random
from typing import Callable, List, Sequence

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            clip = t(clip)
        return clip


class Scale:
    """Resize the short side to `size` (bilinear), preserving aspect."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        from PIL import Image

        t, h, w, _ = clip.shape
        if min(h, w) == self.size:
            return clip
        if h < w:
            nh, nw = self.size, int(round(w * self.size / h))
        else:
            nh, nw = int(round(h * self.size / w)), self.size
        out = np.empty((t, nh, nw, clip.shape[3]), np.uint8)
        for i in range(t):
            out[i] = np.asarray(
                Image.fromarray(clip[i]).resize((nw, nh), Image.BILINEAR))
        return out


class RandomResize:
    """Random uniform rescale within [ratio_min, ratio_max]."""

    def __init__(self, ratio=(3.0 / 4.0, 4.0 / 3.0)):
        self.ratio = ratio

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        from PIL import Image

        scale = random.uniform(*self.ratio)
        t, h, w, _ = clip.shape
        nh, nw = int(round(h * scale)), int(round(w * scale))
        out = np.empty((t, nh, nw, clip.shape[3]), np.uint8)
        for i in range(t):
            out[i] = np.asarray(
                Image.fromarray(clip[i]).resize((nw, nh), Image.BILINEAR))
        return out


class RandomRotate:
    """Random rotation within ±degrees (expand=False, like PIL rotate)."""

    def __init__(self, degrees: float = 10.0):
        self.degrees = degrees

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        from PIL import Image

        angle = random.uniform(-self.degrees, self.degrees)
        out = np.empty_like(clip)
        for i in range(clip.shape[0]):
            out[i] = np.asarray(
                Image.fromarray(clip[i]).rotate(angle, Image.BILINEAR))
        return out


class GaussianBlur:
    def __init__(self, radius: float = 1.0, prob: float = 0.5):
        self.radius = radius
        self.prob = prob

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        from PIL import Image, ImageFilter

        if random.random() >= self.prob:
            return clip
        out = np.empty_like(clip)
        f = ImageFilter.GaussianBlur(radius=self.radius)
        for i in range(clip.shape[0]):
            out[i] = np.asarray(Image.fromarray(clip[i]).filter(f))
        return out


class SaltImage:
    """Salt noise: random pixels set to white (reference SaltImage)."""

    def __init__(self, ratio: int = 100, prob: float = 0.5):
        self.ratio = ratio
        self.prob = prob

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        if random.random() >= self.prob:
            return clip
        out = clip.copy()
        t, h, w, _ = clip.shape
        noise = np.random.randint(0, self.ratio, (t, h, w))
        out[noise == 0] = 255
        return out


class TemporalCenterCrop:
    """Keep the middle `size` frames (pad by edge repeat when short)."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        t = clip.shape[0]
        if t >= self.size:
            start = (t - self.size) // 2
            return clip[start:start + self.size]
        idx = np.clip(np.arange(self.size) - (self.size - t) // 2, 0, t - 1)
        return clip[idx]


class TemporalRandomCrop:
    """Keep a random contiguous `size`-frame window."""

    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        t = clip.shape[0]
        if t <= self.size:
            return TemporalCenterCrop(self.size)(clip)
        start = random.randint(0, t - self.size)
        return clip[start:start + self.size]


class TemporalBeginCrop:
    def __init__(self, size: int):
        self.size = int(size)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        if clip.shape[0] >= self.size:
            return clip[: self.size]
        return TemporalCenterCrop(self.size)(clip)
