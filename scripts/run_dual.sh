#!/bin/bash
# slowfast dual attention (CMDA), 224x224 / 32f
# (reference: wdf_all_run_scripts/run_dual.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_DUALATTENTION_8x8_R50.yaml" NUM_GPUS 4 TRAIN.BATCH_SIZE 4 TEST.BATCH_SIZE 4 DATA_LOADER.NUM_WORKERS 8
