"""AOT serving export: serialize the compiled serving forward to disk.

TPU-native production-serving addition (no reference counterpart — the
fork serves through a live torch process). ``jax.export`` lowers the
serving forward — eval-mode apply with the weights baked in as constants,
including the int8 path when ``TPU.INT8_EVAL`` is calibrated — to a
self-contained StableHLO artifact with a SYMBOLIC batch dimension, so one
export serves any batch size. A serving host deserializes and calls it
without the model zoo, the config system, or a checkpoint load on its
import path; retracing/recompilation never happens at serving time (XLA
compiles the deserialized module once per batch shape actually used).

Scope: the exported function maps preprocessed pathway inputs
``[slow (b,t/alpha,s,s,3), fast (b,t,s,s,3)]`` to class predictions —
the same contract as ``make_forward``. With ``DETECTION.ENABLE`` the
artifact additionally takes canvas-pixel boxes ``(b, max_boxes, 4)`` and
returns per-box action scores ``(b*max_boxes, classes)`` — the
``make_detection_forward`` contract (padded boxes score garbage rows the
caller drops, same as the engines' box_mask). Host-side decode + crop
stays in the serving process (it is data-dependent IO, not compute).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)

_SUFFIX = ".jaxserving"


def export_serving(cfg, state, out_path: str, platforms=None,
                   quant=None, max_boxes: int = 32) -> str:
    """Export the serving forward for ``state`` to ``out_path``.

    Args:
      cfg: full config; TPU.INT8_EVAL etc. select the serving graph;
        DETECTION.ENABLE exports the RoI forward (inputs + boxes).
      state: TrainState (or any object with .params/.batch_stats) whose
        weights get baked into the artifact.
      out_path: target file; ``.jaxserving`` appended if missing.
      platforms: lowering platforms, e.g. ["tpu"] or ["tpu", "cpu"];
        default = the current default backend. Cross-platform export is
        how a CPU host packages a TPU serving artifact.
      quant: calibrated ``quant`` collection for TPU.INT8_EVAL exports.
        When omitted, the calibration persisted by the serving engines
        (engine.quantize.save_calibration) is loaded and fingerprint-
        checked; export refuses if neither source yields a calibration.
      max_boxes: detection exports only — the static per-clip box-padding
        width baked into the artifact (the batch dim stays symbolic);
        callers pad/clip their boxes to it like the AVA loader does.

    Returns the written path.
    """
    from ..models import build_model
    from .state import make_forward

    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if cfg.TPU.INT8_EVAL:
        from ..ops.conv import quant_is_calibrated
        from .quantize import calibration_path, load_calibration

        if quant is None:
            quant = getattr(state, "quant", None)
        if quant is None:
            quant = load_calibration(cfg, variables)
        assert quant is not None and quant_is_calibrated({"quant": quant}), (
            "TPU.INT8_EVAL export needs a calibrated quant collection: "
            "run engine.quantize.calibrate_int8 and pass it as quant=, or "
            "serve once with TPU.INT8_EVAL so the calibration persists at "
            f"{calibration_path(cfg)} (a persisted file is also rejected "
            "when its fingerprint does not match this checkpoint/config)")
        variables["quant"] = quant

    t = cfg.DATA.NUM_FRAMES
    s = cfg.DATA.TEST_CROP_SIZE
    dt = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    (b,) = jax.export.symbolic_shape("b")
    multi = cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH
    if multi:
        specs = [
            jax.ShapeDtypeStruct((b, t // cfg.SLOWFAST.ALPHA, s, s, 3), dt),
            jax.ShapeDtypeStruct((b, t, s, s, 3), dt),
        ]
    else:
        specs = [jax.ShapeDtypeStruct((b, t, s, s, 3), dt)]

    if cfg.DETECTION.ENABLE:
        from .state import make_detection_forward

        det_fwd = make_detection_forward(cfg, model)
        box_spec = jax.ShapeDtypeStruct((b, max_boxes, 4), jnp.float32)
        exported = jax.export.export(
            jax.jit(lambda inputs, boxes: det_fwd(variables, inputs, boxes)),
            platforms=platforms,
        )(specs, box_spec)
    else:
        fwd = make_forward(cfg, model)
        exported = jax.export.export(
            jax.jit(lambda inputs: fwd(variables, inputs)),
            platforms=platforms,
        )(specs)

    if not out_path.endswith(_SUFFIX):
        out_path += _SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    logger.info(
        "Exported %s serving forward (%s, platforms=%s, %d classes, %.1f MB)"
        " to %s",
        "detection" if cfg.DETECTION.ENABLE else "classification",
        "int8" if cfg.TPU.INT8_EVAL else str(dt.__name__),
        list(exported.platforms), cfg.MODEL.NUM_CLASSES,
        len(blob) / 1e6, out_path)
    return out_path


class ServingModel:
    """A deserialized serving artifact: ``preds = serving(pathways)``.

    Batch size is free (symbolic in the artifact); each distinct batch
    size XLA-compiles once on first call, so production hosts should pin
    one (or a few) serving batch sizes.
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._exported = jax.export.deserialize(f.read())
        self.platforms = tuple(self._exported.platforms)
        self.in_avals = tuple(self._exported.in_avals)

    def __call__(self, inputs, *rest):
        # same pytree calling convention as the exported fn: the pathway
        # list, plus (detection artifacts) the (b, max_boxes, 4) boxes
        return np.asarray(self._exported.call(inputs, *rest))


def load_serving(path: str) -> ServingModel:
    return ServingModel(path)
