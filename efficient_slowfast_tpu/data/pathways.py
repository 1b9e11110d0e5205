"""Pathway packing (reference: slowfast/datasets/utils.py:73-112).

Fast pathway = all T frames; slow pathway = every α-th frame selected with
the reference's linspace(0, T-1, T//α) index rule. On-device, batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def slow_pathway_indices(num_frames: int, alpha: int) -> jnp.ndarray:
    idx = jnp.linspace(0, num_frames - 1, num_frames // alpha)
    return jnp.clip(jnp.round(idx), 0, num_frames - 1).astype(jnp.int32)


def pack_pathway_output_in_the_middle(cfg, frames: jnp.ndarray):
    """Variant selecting the middle T//α frames for the slow pathway
    (reference: datasets/utils.py:115-148)."""
    if cfg.MODEL.ARCH in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [frames]
    t = frames.shape[1]
    alpha = cfg.SLOWFAST.ALPHA
    n_slow = t // alpha
    start = (t - n_slow) // 2
    slow = frames[:, start: start + n_slow]
    return [slow, frames]


def pack_pathway_output(cfg, frames: jnp.ndarray):
    """frames (B, T, H, W, C) → [slow, fast] or [frames] per cfg.MODEL.ARCH.

    DATA.SLOW_PATHWAY_MIDDLE selects the contiguous-middle-window slow
    pathway used by the frame-folder pipelines (reference utils.py:115-148).
    """
    if cfg.MODEL.ARCH in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [frames]
    if cfg.DATA.SLOW_PATHWAY_MIDDLE:
        return pack_pathway_output_in_the_middle(cfg, frames)
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        t = frames.shape[1]
        slow = jnp.take(frames, slow_pathway_indices(t, cfg.SLOWFAST.ALPHA), axis=1)
        return [slow, frames]
    raise NotImplementedError(
        f"Model arch {cfg.MODEL.ARCH} is not in "
        f"{cfg.MODEL.SINGLE_PATHWAY_ARCH + cfg.MODEL.MULTI_PATHWAY_ARCH}"
    )
