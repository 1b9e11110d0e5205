"""Fused on-device preprocessing: the jitted stage between the host feeder
and the model.

Replaces the reference's per-worker CPU chain
(reference: slowfast/datasets/kinetics.py:122-255 __getitem__ →
tensor_normalize → spatial_sampling → pack_pathway_output) with ONE compiled
XLA program per (split, shape): uint8 canvas batch in HBM → normalize →
crop-and-resize (traced boxes) → flip → pathway pack, fully fused so the HBM
round-trips are minimal and the MXU never waits on host preprocessing.

Host contract: the feeder supplies
  frames: (B, T, S, Wc, 3) uint8 — short side exactly S, true content width
          widths[i] ≤ Wc (right-padded), already temporally sampled to T.
  widths: (B,) int32
"""

from __future__ import annotations

import jax

from . import transform as T
from .pathways import pack_pathway_output


def make_train_preprocess(cfg, crop_size=None):
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)
    min_s, max_s = cfg.DATA.TRAIN_JITTER_SCALES
    crop = int(crop_size) if crop_size else cfg.DATA.TRAIN_CROP_SIZE
    flip = cfg.DATA.RANDOM_FLIP
    inv = cfg.DATA.INV_UNIFORM_SAMPLE

    @jax.jit
    def pre(rng, frames, widths):
        b = frames.shape[0]
        h = frames.shape[2]
        k_box, k_flip = jax.random.split(rng)
        x = T.tensor_normalize(frames, mean, std)
        boxes = T.random_scale_crop_boxes(
            k_box, b, h, widths, min_s, max_s, crop, inverse_uniform=inv
        )
        x = T.crop_and_resize(x, boxes, crop)
        if flip:
            x = T.horizontal_flip(k_flip, x)
        return pack_pathway_output(cfg, x)

    return pre


def make_detection_preprocess(cfg):
    """Detection (AVA): normalize + pathway-pack only — boxes are in canvas
    pixel coordinates, so no device-side spatial crop is applied (host does
    detection augmentation where boxes and frames transform together)."""
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)

    @jax.jit
    def pre(frames):
        x = T.tensor_normalize(frames, mean, std)
        return pack_pathway_output(cfg, x)

    return pre


def make_test_preprocess(cfg):
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)
    crop = cfg.DATA.TEST_CROP_SIZE

    @jax.jit
    def pre(frames, widths, spatial_idx):
        h = frames.shape[2]
        x = T.tensor_normalize(frames, mean, std)
        boxes = T.uniform_crop_boxes(h, widths, crop, crop, spatial_idx)
        x = T.crop_and_resize(x, boxes, crop)
        return pack_pathway_output(cfg, x)

    return pre
