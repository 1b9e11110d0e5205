"""Process-wide numeric/kernel options, configured from ``cfg.TPU``.

The reference's model architecture is fully determined by its cfg; ours must
be too — kernel-dispatch decisions (tap-decomposed stems, the Pallas flash
path) are therefore driven by ``cfg.TPU.*`` keys set once per job via
``configure(cfg)`` (called by ``build_model``), never by environment
variables. Two runs of the same YAML always trace the same program.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class KernelOptions:
    # Decompose low-channel full-3D stem convs into per-temporal-tap 2D convs.
    # Faster in isolation, slower end-to-end (breaks XLA fusion) — opt-in.
    tap_decompose: bool = False
    # Rewrite stride-2 7x7 tiny-C_in stems as s2d(4) conv with the 4x4
    # output block packed into channels (ops/conv.py::_S2DStemConv).
    stem_d2s: bool = False
    # Serve 1x1x1 convs as calibrated int8 matmuls (eval only; needs a
    # calibration pass — see ops/conv.py::_Int8Conv1x1 and
    # engine/quantize.py). Measured 1.4-1.8x on the pointwise shapes (v5e).
    int8_eval: bool = False
    # Extend int8 serving to the spatial (k>1) convs too
    # (ops/conv.py::_Int8ConvSpatial). Separate opt-in: bigger byte cut,
    # bigger accuracy risk. Requires int8_eval.
    int8_spatial: bool = False
    # Use the Pallas flash-attention kernel on TPU for large token counts.
    flash_attention: bool = True
    # Token count above which attention switches from the materialized
    # (N, N) einsum to the streaming (flash/chunked) path.
    flash_min_tokens: int = 1024
    # Largest key count handed to the Pallas kernel; larger falls back to the
    # chunked lax.scan path. Default = the CMDA 224^2-input token count
    # validated against the Mosaic compiler on v5e (32768 fails to compile).
    flash_max_keys: int = 25088


options = KernelOptions()
_configured = False


def configure(cfg) -> KernelOptions:
    """Set process-wide kernel options from ``cfg.TPU``; returns them.

    The options are a process-wide singleton (they feed retrace-time
    dispatch decisions), so building a second model under a DIFFERENT
    cfg.TPU.* silently changes kernel dispatch for earlier models on their
    next retrace — warn loudly when that happens so mixed-config processes
    (e.g. a bench script building two models) see it.
    """
    global _configured
    new = KernelOptions(
        tap_decompose=bool(cfg.TPU.TAP_DECOMPOSE),
        stem_d2s=bool(cfg.TPU.STEM_D2S),
        int8_eval=bool(cfg.TPU.INT8_EVAL),
        int8_spatial=bool(cfg.TPU.INT8_EVAL and cfg.TPU.INT8_SPATIAL),
        flash_attention=bool(cfg.TPU.FLASH_ATTENTION),
        flash_min_tokens=int(cfg.TPU.FLASH_MIN_TOKENS),
        flash_max_keys=int(cfg.TPU.FLASH_MAX_KEYS),
    )
    if _configured and new != options:
        from ..utils.logging import get_logger

        get_logger(__name__).warning(
            "Kernel options reconfigured with different values (%s -> %s); "
            "previously built models pick the new dispatch on their next "
            "retrace", options, new)
    _configured = True
    for f in new.__dataclass_fields__:
        setattr(options, f, getattr(new, f))
    return options
