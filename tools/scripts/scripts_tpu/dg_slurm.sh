#!/bin/bash
# SLURM launch (reference scripts_sproject/dg_slurm.sh surface):
#   sh dg_slurm.sh <partition> <job_name> <nodes> <source> [extra args]
set -e
PARTITION=$1; JOB_NAME=$2; NODES=$3; SOURCE=${4:-modelnet}
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python train_dg.py --source "$SOURCE" --launcher slurm \
     --cfg tools/cfgs/cfgs_sproject/DG_unified_loss_onedataset_shapenet.yaml "${@:5}"
