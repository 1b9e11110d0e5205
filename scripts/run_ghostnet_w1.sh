#!/bin/bash
# slowfast ghostnet w1.0, 112x112 / 16f
# (reference: wdf_all_run_scripts/run_ghostnet_w1.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_GHOSTNET_8x8_R50_stepwise_multigrid.yaml" NUM_GPUS 4 TRAIN.BATCH_SIZE 256 DATA_LOADER.NUM_WORKERS 16
