#!/usr/bin/env python3
"""Export a checkpoint as a self-contained AOT serving artifact.

TPU-native production-serving tool (no reference counterpart): lowers the
serving forward — weights baked in, int8 when TPU.INT8_EVAL is calibrated —
to a StableHLO artifact with a symbolic batch dimension via ``jax.export``.
A serving host loads it with ``engine.export.load_serving`` and calls it;
no model code, config, or checkpoint load at serving time.

Example:
    python tools/export_serving.py --cfg configs/Kinetics/SLOWFAST_8x8_R50.yaml \
        --out r50_serving --platforms tpu \
        TEST.CHECKPOINT_FILE_PATH checkpoints/checkpoint_epoch_00196.pyth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_slowfast_tpu.utils.env import honor_jax_platforms

honor_jax_platforms()

from efficient_slowfast_tpu.config.parser import load_config_from


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True, help="Path to config yaml.")
    ap.add_argument("--out", required=True,
                    help="Output artifact path (.jaxserving).")
    ap.add_argument("--platforms", default=None,
                    help="Comma-separated lowering platforms (e.g. "
                         "'tpu' or 'tpu,cpu'); default: current backend. "
                         "Lets a CPU host package a TPU artifact.")
    ap.add_argument("--max-boxes", type=int, default=32,
                    help="Detection exports (DETECTION.ENABLE): static "
                         "per-clip box padding width baked into the "
                         "artifact; batch stays symbolic.")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                    help="KEY VALUE config override pairs.")
    args = ap.parse_args()

    cfg = load_config_from(args.cfg, args.opts)

    import jax

    from efficient_slowfast_tpu.engine.export import export_serving
    from efficient_slowfast_tpu.engine.state import create_train_state
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.utils import checkpoint as cu

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(cfg.RNG_SEED))
    state = cu.load_test_checkpoint(cfg, state)

    platforms = args.platforms.split(",") if args.platforms else None
    path = export_serving(cfg, state, args.out, platforms=platforms,
                          max_boxes=args.max_boxes)
    print(path)


if __name__ == "__main__":
    main()
