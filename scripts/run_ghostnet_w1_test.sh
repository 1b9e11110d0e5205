#!/bin/bash
# slowfast ghostnet w1.0 — 30-view test only
# (reference: wdf_all_run_scripts/run_ghostnet_w1_test.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_GHOSTNET_8x8_R50_stepwise_multigrid.yaml" NUM_GPUS 4 TRAIN.ENABLE False TEST.BATCH_SIZE 240 DATA_LOADER.NUM_WORKERS 16
