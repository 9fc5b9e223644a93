#!/bin/bash
# Source-only baseline sweep over the three datasets
set -e
for SOURCE in modelnet shapenet scannet; do
    python train_source.py --source "$SOURCE" \
        --cfg tools/cfgs/cfgs_local/direct_inference.yaml "$@"
done
