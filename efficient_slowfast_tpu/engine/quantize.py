"""Post-training int8 calibration for the TPU.INT8_EVAL serving path.

The quantized pointwise convs (ops/conv.py::_Int8Conv1x1) read their static
per-layer activation range from the flax ``quant`` collection; running the
model with ``mutable=["quant"]`` IS the calibration pass (each layer records
the running max|x| it saw). Static scales — rather than dynamic per-batch
maxabs — are what let XLA fuse the quantize into the producer conv's
epilogue so activations are written/read as int8 (PERF.md round 3).

There is no reference counterpart (the fork serves fp16/fp32;
quantization is a TPU-native serving addition).
"""

from __future__ import annotations

import jax

from ..ops.conv import quant_is_calibrated


def calibrate_int8(model, variables, batches):
    """Record per-layer activation ranges over ``batches`` of inputs.

    Args:
      model: a model built with cfg.TPU.INT8_EVAL=True.
      variables: {"params", "batch_stats", ...} from create_train_state or a
        checkpoint load (the "quant" collection is created/updated here).
      batches: iterable of model inputs (each a [slow, fast] pathway list).

    Returns the variables dict with a populated ``quant`` collection.
    Raises if no quantized layer recorded a range (e.g. the model was built
    without INT8_EVAL, so there is nothing to calibrate).
    """
    variables = dict(variables)

    @jax.jit
    def step(variables, inputs):
        _, updated = model.apply(variables, inputs, train=False,
                                 mutable=["quant"])
        return updated["quant"]

    n = 0
    for inputs in batches:
        variables["quant"] = step(variables, inputs)
        n += 1
    if n == 0:
        raise ValueError("calibrate_int8 needs at least one batch")
    if not quant_is_calibrated(variables):
        raise ValueError(
            "calibration recorded no activation ranges — was the model "
            "built with cfg.TPU.INT8_EVAL=True?"
        )
    return variables
