#!/bin/bash
# slowfast shufflenet w2.0 g3 (published headline variant)
# (reference: wdf_all_run_scripts/run_shufflenet_w2_g3.sh — NUM_GPUS here is the TPU chip
# count the job shards over; see docs/GETTING_STARTED.md)
set -e
ROOT_PATH="$(cd "$(dirname "$0")/.." && pwd)"

python "$ROOT_PATH/tools/run_net.py" --cfg "$ROOT_PATH/configs/Kinetics/SLOWFAST_SHUFFLENET_8x8_R50_stepwise_multigrid.yaml" NUM_GPUS 4 SLOWFAST.WIDTH_MULTI 2.0 SLOWFAST.GROUPS 3 TRAIN.BATCH_SIZE 256 DATA_LOADER.NUM_WORKERS 16
