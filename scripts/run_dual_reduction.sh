#!/bin/bash
# CMDA with fusion-layer reduction (stepwise multigrid schedule)
# (reference: wdf_all_run_scripts/run_dual_reduction.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_DUAL_8x8_R50_stepwise_multigrid.yaml" NUM_GPUS 1 TRAIN.BATCH_SIZE 4 TEST.BATCH_SIZE 4 DATA_LOADER.NUM_WORKERS 8
