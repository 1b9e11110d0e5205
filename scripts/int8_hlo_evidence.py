#!/usr/bin/env python3
"""HLO-level evidence for the int8 activation-epilogue-fusion claim.

engine/quantize.py states (as design intent) that static activation scales
let XLA fuse the quantize into the producer conv's epilogue so activations
cross HBM as int8. This script settles it (VERDICT r3 weak #2 / next #1):
it AOT-compiles the TPU.INT8_EVAL flagship eval forward (compile only — no
quiet-chip window needed) and inspects the OPTIMIZED HLO:

- how many convolution/dot ops consume s8 operands (the int8 MXU path is
  actually lowered, not silently upcast);
- whether s8 tensors appear as fusion OUTPUTS / parameters of the int8
  conv fusions (activations materialized to HBM as int8 = the claimed byte
  cut) or only as in-fusion temporaries right after a bf16 parameter (no
  byte cut crossing HBM);
- the total bytes of s8 vs bf16/f32 fusion outputs.

Usage: python scripts/int8_hlo_evidence.py [--spatial] [--cpu]
Prints a JSON summary; paste into PERF.md round 4.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dump", default="", help="write full HLO text here")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from efficient_slowfast_tpu.utils.env import honor_jax_platforms

    honor_jax_platforms()

    import jax
    import jax.numpy as jnp

    from bench import _flagship_cfg
    from efficient_slowfast_tpu.models import build_model

    cfg = _flagship_cfg()
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_SPATIAL = bool(args.spatial)
    model = build_model(cfg)

    # Everything ABSTRACT (ShapeDtypeStructs via eval_shape) — the whole
    # pipeline is AOT lower+compile, no device execution, so this works
    # even while co-tenants hold the chip's HBM (only the remote compile
    # service is needed).
    x_abs = _input_shapes(cfg, args.batch)

    def _zeros():
        return [jnp.zeros(s.shape, s.dtype) for s in x_abs]

    def _abstract_init():
        kk = jax.random.PRNGKey(0)  # traced — never touches the device
        return model.init({"params": kk, "dropout": kk}, _zeros(),
                          train=False)

    var_abs = jax.eval_shape(_abstract_init)
    variables = {"params": var_abs["params"],
                 "batch_stats": var_abs.get("batch_stats", {})}
    # quant collection structure: HLO only needs the scales to EXIST as
    # runtime arguments — values don't change the graph
    q_abs = jax.eval_shape(
        lambda v: model.apply(v, _zeros(), train=False, mutable=["quant"]),
        variables)[1]["quant"]
    variables["quant"] = q_abs

    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)).lower(variables, x_abs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    print(json.dumps(analyze(hlo), sort_keys=True))


def _input_shapes(cfg, batch):
    import jax
    import jax.numpy as jnp

    s = cfg.DATA.TEST_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    return [jax.ShapeDtypeStruct((batch, t // cfg.SLOWFAST.ALPHA, s, s, 3),
                                 jnp.bfloat16),
            jax.ShapeDtypeStruct((batch, t, s, s, 3), jnp.bfloat16)]


_SHAPE_RE = re.compile(r"(s8|bf16|f32)\[([\d,]*)\]")


def _bytes_of(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * {"s8": 1, "bf16": 2, "f32": 4}[dtype]


def analyze(hlo: str) -> dict:
    """Count int8 compute ops and s8 tensors CROSSING fusion boundaries."""
    # fusion ops whose OUTPUT element type is s8: tensors that cross HBM
    # as int8 (the claimed byte cut)
    s8_out_bytes = 0
    other_out_bytes = 0
    fusion_roots_s8 = 0
    for m in re.finditer(r"^\s*(?:ROOT )?%?\S+ = (s8|bf16|f32)\[([\d,]*)\][^=]*fusion\(",
                         hlo, re.M):
        b = _bytes_of(m.group(1), m.group(2))
        if m.group(1) == "s8":
            fusion_roots_s8 += 1
            s8_out_bytes += b
        else:
            other_out_bytes += b
    # int8×int8 convolutions accumulate in s32 — an s32-OUTPUT conv/dot is
    # the unambiguous signature of the int8 MXU lowering (operand types
    # are not printed on the op line, only operand names). \S* after ]
    # eats the HLO layout suffix ({1,0:T(8,128)} etc.)
    conv_lines = re.findall(
        r"= (\S+)\[[^\]]*\]\S* (?:convolution|dot)\(", hlo)
    convs_s32 = sum(1 for dt in conv_lines if dt == "s32")
    return {
        "convs_or_dots_total": len(conv_lines),
        "convs_or_dots_s32_output_int8_mxu": convs_s32,
        "fusion_outputs_s8": fusion_roots_s8,
        "fusion_output_bytes_s8": s8_out_bytes,
        "fusion_output_bytes_other": other_out_bytes,
        "verdict_activations_cross_hbm_as_int8": fusion_roots_s8 > 0,
        "_note": "convs_s32_output>0 proves the int8 MXU lowering; "
                 "fusion_outputs_s8>0 proves quantized activations are "
                 "materialized (written/read) across fusion boundaries",
    }


if __name__ == "__main__":
    main()
