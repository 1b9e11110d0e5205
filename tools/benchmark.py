#!/usr/bin/env python3
"""Data-loading benchmark CLI (reference: SlowFast/tools/benchmark.py:15-25)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_slowfast_tpu.utils.env import honor_jax_platforms

honor_jax_platforms()

from efficient_slowfast_tpu.config.parser import load_config, parse_args
from efficient_slowfast_tpu.utils.benchmark import benchmark_data_loading
from efficient_slowfast_tpu.utils.misc import launch_job


def main():
    args = parse_args()
    cfg = load_config(args)
    launch_job(cfg=cfg, init_method=args.init_method,
               func=benchmark_data_loading)


if __name__ == "__main__":
    main()
