#!/bin/bash
# slowfast shufflenetv2 w2.0 — 30-view test only
# (reference: wdf_all_run_scripts/run_shufflenetv2_w2_test.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_SHUFFLENETV2_8x8_R50_stepwise_multigrid.yaml" NUM_GPUS 4 SLOWFAST.WIDTH_MULTI 2.0 TRAIN.ENABLE False TEST.BATCH_SIZE 240 DATA_LOADER.NUM_WORKERS 16
