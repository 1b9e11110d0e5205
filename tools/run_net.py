#!/usr/bin/env python3
"""Train/test/demo dispatcher (reference: SlowFast/tools/run_net.py:14-37).

Usage:
    python tools/run_net.py --cfg configs/Kinetics/SLOWFAST_8x8_R50.yaml \
        [--num_shards N --shard_id I --init_method tcp://host:port] KEY VAL ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_slowfast_tpu.utils.env import honor_jax_platforms

honor_jax_platforms()

from efficient_slowfast_tpu.config.parser import load_config, parse_args
from efficient_slowfast_tpu.utils.misc import launch_job


def main():
    args = parse_args()
    cfg = load_config(args)

    if cfg.TRAIN.ENABLE:
        from efficient_slowfast_tpu.engine.train import train

        launch_job(cfg=cfg, init_method=args.init_method, func=train)

    if cfg.TEST.ENABLE:
        from efficient_slowfast_tpu.engine.test import test

        launch_job(cfg=cfg, init_method=args.init_method, func=test)

    if cfg.DEMO.ENABLE:
        from efficient_slowfast_tpu.engine.demo import demo

        launch_job(cfg=cfg, init_method=args.init_method, func=demo)

    if cfg.TENSORBOARD.ENABLE and cfg.TENSORBOARD.MODEL_VIS.ENABLE:
        from efficient_slowfast_tpu.engine.visualization import visualize

        launch_job(cfg=cfg, init_method=args.init_method, func=visualize)


if __name__ == "__main__":
    main()
