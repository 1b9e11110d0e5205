"""CLI argument parsing + config loading (reference: slowfast/utils/parser.py:13-94)."""

from __future__ import annotations

import argparse
import os
import sys

from .defaults import assert_and_infer_cfg, get_cfg
from .node import CfgNode


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native Efficient-SlowFast train/test/demo pipeline."
    )
    parser.add_argument(
        "--shard_id", type=int, default=0,
        help="Shard id (host index) of this node; 0 .. NUM_SHARDS-1.",
    )
    parser.add_argument(
        "--num_shards", type=int, default=1, help="Number of hosts in the job."
    )
    parser.add_argument(
        "--init_method", type=str, default="tcp://localhost:9999",
        help="Coordinator address for multi-host jax.distributed.",
    )
    parser.add_argument(
        "--cfg", dest="cfg_file", type=str, default=None, help="Path to config yaml."
    )
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER, default=None,
        help="KEY VALUE override pairs appended after the flags.",
    )
    if argv is None and len(sys.argv) == 1:
        parser.print_help()
    return parser.parse_args(argv)


def load_config(args) -> CfgNode:
    """Build the job config: defaults < yaml < CLI opts (reference: parser.py:67-94)."""
    cfg = get_cfg()
    if getattr(args, "cfg_file", None):
        cfg.merge_from_file(args.cfg_file)
    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)

    if hasattr(args, "num_shards") and hasattr(args, "shard_id"):
        cfg.NUM_SHARDS = args.num_shards
        cfg.SHARD_ID = args.shard_id

    cfg = assert_and_infer_cfg(cfg)
    if cfg.OUTPUT_DIR:
        os.makedirs(os.path.join(cfg.OUTPUT_DIR, "checkpoints"), exist_ok=True)
    return cfg


def load_config_from(cfg_file: str, opts=None) -> CfgNode:
    """``load_config`` for auxiliary CLIs (gradcam_video, export_serving)
    that define their own argparse surface: same defaults < yaml < opts
    resolution and validation, no shard/output-dir side channel drift."""
    import types

    return load_config(types.SimpleNamespace(cfg_file=cfg_file, opts=opts))
