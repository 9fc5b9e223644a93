#!/bin/bash
# Cluster-splitter DG run: requires the offline splitter output
# (python dataset_splitter.py --pre_trained <ckpt> --dataset <ds>)
set -e
SOURCE=${1:-modelnet}
python train_dg_single_gpu.py --source "$SOURCE" \
    --cfg tools/cfgs/cfgs_local/DG_unified_loss.yaml \
    --set DATASET_SPLITTER.METHOD Cluster "${@:2}"
