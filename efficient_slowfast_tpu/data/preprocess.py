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
import jax.numpy as jnp

from . import transform as T
from ..parallel.mesh import constrain_spatial
from .pathways import pack_pathway_output


def make_train_preprocess(cfg, crop_size=None):
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)
    min_s, max_s = cfg.DATA.TRAIN_JITTER_SCALES
    crop = int(crop_size) if crop_size else cfg.DATA.TRAIN_CROP_SIZE
    flip = cfg.DATA.RANDOM_FLIP
    inv = cfg.DATA.INV_UNIFORM_SAMPLE
    # Jester-style clip-level color jitter: [lo, hi] enhancement-factor range
    # (reference: datasets/decoder.py:447-454 applies it for jester train/val)
    jitter = tuple(cfg.DATA.TRAIN_COLOR_JITTER)

    @jax.jit
    def pre(rng, frames, widths, portrait=None, crop_u=None):
        b = frames.shape[0]
        h = frames.shape[2]
        k_box, k_flip, k_jit = jax.random.split(rng, 3)
        if jitter:
            x = frames.astype(jnp.float32) / 255.0
            x = T.pil_color_jitter(k_jit, x, jitter[0], jitter[1],
                                   widths=widths)
            x = T.color_normalization(x, mean, std)
        else:
            x = T.tensor_normalize(frames, mean, std)
        # crop_u: host-sampled long-axis position shared with the canvas
        # window (datasets.fit_canvas_into window_u) so the composed crop
        # spans the FULL resized long axis on >2:1 media (reference
        # transform.py:359-392 samples over the full width)
        boxes = T.random_scale_crop_boxes(
            k_box, b, h, widths, min_s, max_s, crop, inverse_uniform=inv,
            u_x=crop_u,
        )
        x = T.crop_and_resize(x, boxes, crop)
        if portrait is not None:
            # restore tall clips' orientation BEFORE the flip so the flip
            # stays horizontal in content coordinates
            x = T.transpose_portrait(x, portrait)
        if flip:
            x = T.horizontal_flip(k_flip, x)
        return constrain_spatial(cfg, pack_pathway_output(cfg, x))

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
        return constrain_spatial(cfg, pack_pathway_output(cfg, x))

    return pre


def make_detection_train_preprocess(cfg):
    """AVA train augmentation, fully on device with box co-transform
    (reference: ava_dataset._images_and_boxes_preprocessing_cv2 train branch:
    scale-jitter → random-crop → flip → /255 → [color jitter] → PCA lighting
    → normalize; cv2_transform.py list ops). Returns (inputs, boxes') where
    boxes' are in crop-pixel coordinates for the RoI head.
    """
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)
    min_s, max_s = cfg.DATA.TRAIN_JITTER_SCALES
    crop = cfg.DATA.TRAIN_CROP_SIZE
    flip = cfg.DATA.RANDOM_FLIP
    use_color = cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION
    pca_only = cfg.AVA.TRAIN_PCA_JITTER_ONLY
    eigval = tuple(cfg.AVA.TRAIN_PCA_EIGVAL)
    eigvec = tuple(tuple(r) for r in cfg.AVA.TRAIN_PCA_EIGVEC)

    @jax.jit
    def pre(rng, frames, widths, boxes):
        b = frames.shape[0]
        h = frames.shape[2]
        k_box, k_flip, k_jit, k_pca = jax.random.split(rng, 4)
        x = frames.astype(jnp.float32) / 255.0
        crop_boxes = T.random_scale_crop_boxes(
            k_box, b, h, widths, min_s, max_s, crop
        )
        x = T.crop_and_resize(x, crop_boxes, crop)
        boxes = T.transform_boxes_to_crop(boxes, crop_boxes, crop)
        if flip:
            x, boxes = T.horizontal_flip_with_boxes(k_flip, x, boxes)
        if use_color:
            if not pca_only:
                # var-parameterized, random order (cv2_transform.color_jitter_list)
                x = T.color_jitter(k_jit, x, 0.4, 0.4, 0.4)
            x = T.lighting_jitter(k_pca, x, 0.1, eigval, eigvec)
        x = T.color_normalization(x, mean, std)
        return (constrain_spatial(cfg, pack_pathway_output(cfg, x)),
                boxes)

    return pre


def make_test_preprocess(cfg):
    mean = tuple(cfg.DATA.MEAN)
    std = tuple(cfg.DATA.STD)
    crop = cfg.DATA.TEST_CROP_SIZE

    @jax.jit
    def pre(frames, widths, spatial_idx, portrait=None):
        h = frames.shape[2]
        x = T.tensor_normalize(frames, mean, std)
        boxes = T.uniform_crop_boxes(h, widths, crop, crop, spatial_idx)
        x = T.crop_and_resize(x, boxes, crop)
        if portrait is not None:
            # tall clips ride the canvas transposed; the crop above was along
            # their original vertical axis (top/center/bottom views) — swap
            # the square crop back (reference: transform.py:425-468)
            x = T.transpose_portrait(x, portrait)
        return constrain_spatial(cfg, pack_pathway_output(cfg, x))

    return pre
