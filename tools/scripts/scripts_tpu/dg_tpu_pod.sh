#!/bin/bash
# Multi-host TPU-pod launch (replaces the reference's dg_slurm.sh NCCL recipe).
# Run the same command on every host of the slice, e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="bash dg_tpu_pod.sh modelnet"
# jax.distributed.initialize() discovers the coordinator from the TPU runtime.
set -e
SOURCE=${1:-modelnet}
python train_dg.py --source "$SOURCE" \
    --cfg tools/cfgs/cfgs_sproject/DG_unified_loss_onedataset_shapenet.yaml \
    --launcher jax "${@:2}"
