#!/bin/bash
# Full MSA soft-MMD DG run (reference scripts_local/dg_softmmd.sh recipe)
set -e
SOURCE=${1:-modelnet}
python train_dg_single_gpu.py --source "$SOURCE" \
    --cfg tools/cfgs/cfgs_local/DG_unified_loss.yaml "${@:2}"
