"""Fused eval forward for SlowFast trunks — the serving path.

Production inference engines fold normalization into weights and fuse
whole residual blocks; flax's module tree is the *training* representation.
This module reads the trained variables pytree by name (the same tree the
checkpointer and torch importer produce), folds every eval-mode BN affine
into its conv (ops/pallas/fused_bottleneck.fold_bn), and executes the
network with raw lax/Pallas ops:

- identity (stride-1) bottleneck blocks run as ONE fused Pallas kernel per
  block (x read once, output written once — the XLA path streams ~6 tensor
  passes per block through HBM);
- strided block-0s, stems, lateral fusions, and the head stay on XLA
  (they are a small minority of step time and XLA handles them well).

Numerics match the flax path to bf16 rounding (exact in f32); see
tests/test_inference_engine.py. Reference behavior being reproduced:
slowfast/models/video_model_builder.py:153-416 (SlowFast forward) and
head_helper.py:218-221 (eval softmax-then-mean).

Supported: MODEL.MODEL_NAME == "SlowFast", bottleneck_transform, plain BN,
no non-local blocks, groups 1, dilation 1, detection off. ``supports(cfg)``
reports applicability; callers fall back to ``model.apply`` otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slowfast import _MODEL_STAGE_DEPTH, _POOL1
from ..ops.pallas.fused_bottleneck import (bottleneck_reference, fold_bn,
                                           fused_bottleneck)
from ..utils import logging as logging_util

logger = logging_util.get_logger(__name__)

BN_EPS = 1e-5
# shapes whose fused kernel failed and fell back — warn once PER SHAPE so a
# kernel regression that breaks every block stays visible in the log rather
# than hiding behind a single process-wide warning
_FALLBACK_SHAPES = set()


def supports(cfg) -> bool:
    """Whether the fused engine covers this config's eval forward."""
    try:
        return (
            cfg.MODEL.MODEL_NAME == "SlowFast"
            and not cfg.DETECTION.ENABLE
            and cfg.BN.NORM_TYPE == "batchnorm"
            and cfg.RESNET.TRANS_FUNC == "bottleneck_transform"
            and not cfg.RESNET.STRIDE_1X1
            and all(g == 1 for g in [cfg.RESNET.NUM_GROUPS])
            and all(not loc[p] for loc in cfg.NONLOCAL.LOCATION for p in (0, 1))
            and all(d == 1 for ds in cfg.RESNET.SPATIAL_DILATIONS for d in ds)
            and not cfg.MODEL.SLOW_PATHWAY_HEAD
            and not cfg.MULTIGRID.SHORT_CYCLE
            and cfg.RESNET.DEPTH in _MODEL_STAGE_DEPTH
            # the engine's head hardcodes softmax-then-mean
            and cfg.MODEL.HEAD_ACT == "softmax"
            and not cfg.DATA.MULTI_LABEL
        )
    except Exception:
        return False


def _conv3d(x, kernel, stride, padding, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), tuple(stride),
        [(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def _maxpool(x, window, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype.type(0),
        jax.lax.max,
        (1,) + tuple(window) + (1,),
        (1,) + tuple(stride) + (1,),
        [(0, 0)] + [(p, p) for p in padding] + [(0, 0)],
    )


def _bn_affine(p, s):
    """(gain, bias) of an eval BN: y = x*gain + bias."""
    g = p["scale"] * jax.lax.rsqrt(s["var"].astype(jnp.float32) + BN_EPS)
    return g, p["bias"] - s["mean"] * g


def _folded(pb, sb, conv_key, bn_key):
    k = pb[conv_key]["conv"]["kernel"] if "conv" in pb[conv_key] else pb[conv_key]["kernel"]
    bn_p, bn_s = pb[bn_key]["bn"], sb[bn_key]["bn"]
    return fold_bn(k, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
                   BN_EPS)


def _xla_block(x, wa, ba, wb, bb, wc, bc, wp, bp, stride, dtype):
    """Strided bottleneck block on XLA (block 0 of s3..s5)."""
    kt = wa.shape[0]
    a = _conv3d(x, wa, (1, 1, 1), (kt // 2, 0, 0), dtype)
    a = jax.nn.relu(a + ba).astype(dtype)
    b = _conv3d(a, wb, (1, stride, stride), (0, 1, 1), dtype)
    b = jax.nn.relu(b + bb).astype(dtype)
    c = _conv3d(b, wc, (1, 1, 1), (0, 0, 0), dtype) + bc
    if wp is not None:
        res = _conv3d(x, wp, (1, stride, stride), (0, 0, 0), dtype) + bp
    else:
        res = x.astype(jnp.float32)
    return jax.nn.relu(c.astype(dtype) + res.astype(dtype))


def _block(x, params, stats, name, stride, dtype, use_pallas):
    """One ResBlock from the pytree; fused Pallas when stride==1."""
    pb, sb = params[name]["branch2"], stats[name]["branch2"]
    wa, ba = _folded(pb, sb, "a", "a_bn")
    wb, bb = _folded(pb, sb, "b", "b_bn")
    wc, bc = _folded(pb, sb, "c", "c_bn")
    has_proj = "branch1" in params[name]
    wp = bp = None
    if has_proj:
        wp, bp = _folded(params[name], stats[name], "branch1", "branch1_bn")
        wp, bp = wp[0, 0, 0], bp
    b_, t, h, w, cin = x.shape
    if stride == 1:
        xn = x.reshape(b_ * t, h, w, cin)
        args = (xn, t, wa[:, 0, 0], ba, wb[0], bb, wc[0, 0, 0], bc, wp, bp)
        if use_pallas:
            try:
                y = fused_bottleneck(*args)
            except Exception as e:
                # No VMEM plan (ValueError) or the kernel build itself failed
                # at trace time — degrade to the XLA reference path rather
                # than crash the opt-in FUSED_EVAL run. (A Mosaic failure at
                # XLA-compile time is outside this trace-time guard; the
                # supports() gate + _plan envelope is what prevents those.
                # The kernel's own correctness is covered directly by
                # tests/test_fused_bottleneck.py, so a regression cannot
                # hide behind this fallback in the suite.)
                shape_key = (xn.shape, wa.shape, str(xn.dtype))
                if shape_key not in _FALLBACK_SHAPES:
                    _FALLBACK_SHAPES.add(shape_key)
                    logger.warning(
                        "fused_bottleneck unavailable for %s (%s: %s); "
                        "using the XLA reference block for this shape",
                        shape_key, type(e).__name__, e)
                y = bottleneck_reference(*args)
        else:
            y = bottleneck_reference(*args)
        return y.reshape(b_, t, h, w, -1).astype(dtype)
    wp3 = wp[None, None, None] if wp is not None else None
    return _xla_block(x, wa, ba, wb, bb, wc, bc, wp3, bp, stride,
                      dtype).astype(dtype)


def make_fused_eval_forward(cfg):
    """Build the jitted fused eval forward: fn(variables, [slow, fast]) →
    scores, where ``variables`` is the standard {"params", "batch_stats"}
    pytree from create_train_state / checkpoint load. The constructor needs
    only the cfg — variables are an argument of the returned fn.
    """
    assert supports(cfg), "config outside the fused engine's envelope"
    from ..models.build import get_compute_dtype

    dtype = get_compute_dtype(cfg)
    arch = cfg.MODEL.ARCH
    depths = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
    beta = cfg.SLOWFAST.BETA_INV
    alpha = cfg.SLOWFAST.ALPHA
    pool1 = _POOL1[arch]
    strides = [s[0] for s in cfg.RESNET.SPATIAL_STRIDES]
    use_pallas = jax.default_backend() == "tpu"

    def forward(variables, inputs):
        p = variables["params"]
        s = variables["batch_stats"]

        # ---- s1: per-pathway stem (conv+BN+ReLU+maxpool) ------------------
        x = []
        for pw in range(2):
            stem_p = p["s1"][f"pathway{pw}_stem"]
            stem_s = s["s1"][f"pathway{pw}_stem"]
            k, b = fold_bn(stem_p["conv"]["conv"]["kernel"],
                           stem_p["bn"]["bn"]["scale"],
                           stem_p["bn"]["bn"]["bias"],
                           stem_s["bn"]["bn"]["mean"],
                           stem_s["bn"]["bn"]["var"], BN_EPS)
            kt = k.shape[0]
            y = _conv3d(inputs[pw], k, (1, 2, 2), (kt // 2, 3, 3), dtype)
            y = jax.nn.relu(y + b).astype(dtype)
            x.append(_maxpool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1)))

        def fuse(x, name):
            fp, fs = p[name], s[name]
            k, b = fold_bn(fp["conv_f2s"]["conv"]["kernel"],
                           fp["bn"]["bn"]["scale"], fp["bn"]["bn"]["bias"],
                           fs["bn"]["bn"]["mean"], fs["bn"]["bn"]["var"],
                           BN_EPS)
            kf = k.shape[0]
            f = _conv3d(x[1], k, (alpha, 1, 1), (kf // 2, 0, 0), dtype)
            f = jax.nn.relu(f + b).astype(dtype)
            return [jnp.concatenate([x[0], f], axis=-1), x[1]]

        x = fuse(x, "s1_fuse")

        # ---- stages (per-block temporal kernels come from the checkpoint
        # weight shapes themselves, so no schedule recomputation here) -----
        for si, stage in enumerate(("s2", "s3", "s4", "s5")):
            nb = depths[si]
            for pw in range(2):
                y = x[pw]
                for i in range(nb):
                    y = _block(y, p[stage], s[stage], f"pathway{pw}_res{i}",
                               strides[si] if i == 0 else 1, dtype,
                               use_pallas)
                x[pw] = y
            if stage != "s5":
                x = fuse(x, f"{stage}_fuse")
            if stage == "s2" and any(v != 1 for pv in pool1 for v in pv):
                x = [_maxpool(x[pw], pool1[pw], pool1[pw], (0, 0, 0))
                     for pw in range(2)]

        # ---- head: avgpool → concat → linear → softmax → mean -------------
        crop = cfg.DATA.CROP_SIZE
        tdim = cfg.DATA.NUM_FRAMES
        psz = [
            [tdim // alpha // pool1[0][0], crop // 32, crop // 32],
            [tdim // pool1[1][0], crop // 32, crop // 32],
        ]
        pooled = []
        for pw in range(2):
            y = x[pw].astype(jnp.float32)
            win = (1,) + tuple(psz[pw]) + (1,)
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, win, (1, 1, 1, 1, 1),
                [(0, 0)] * 5) / np.prod(psz[pw])
            pooled.append(y)
        y = jnp.concatenate(pooled, axis=-1)
        fc = p["head"]["projection"]["fc"]
        y = y.astype(dtype) @ fc["kernel"].astype(dtype) + fc["bias"]
        y = jax.nn.softmax(y.astype(jnp.float32), axis=-1)
        y = jnp.mean(y, axis=(1, 2, 3))
        return y.reshape(y.shape[0], -1)

    return jax.jit(forward)
