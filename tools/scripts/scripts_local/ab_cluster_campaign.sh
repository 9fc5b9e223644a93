#!/bin/bash
# Cluster-split alignment A/B campaign (docs/VALIDATION.md "Cluster-split
# source" table): does the MSA/SDA alignment stack earn its keep when the
# source sub-domains are REAL feature clusters instead of exchangeable
# random halves?
#
# Pipeline: hard synthetic tree (per-class 32) -> source-only PointNet
# (16 epochs) -> offline kmeans splitter on its mid features ->
# 3 seeds x {full MSA/SDA, MMD_WEIGHT 0} DGCNN DG runs on the kmeans split.
#
# Usage: bash tools/scripts/scripts_local/ab_cluster_campaign.sh [ROOT [LOGD]]
# On the axon dev box prefix TPU python with PYTHONPATH=.:/root/.axon_site.
set -u
ROOT=${1:-/tmp/hard32_data}
LOGD=${2:-/tmp/ab5}
SEEDS=${SEEDS:-"666 1234 2026"}
TPU_PP=${TPU_PP:-".:/root/.axon_site"}
# Persistent compile cache: the DG step is a ~15 min remote compile on this
# box; with the cache, seeds 2..N of an arm start in seconds.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
mkdir -p "$LOGD" "$JAX_COMPILATION_CACHE_DIR"
stamp() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOGD/progress.txt"; }

if [ ! -f "$ROOT/modelnet/train_pts.npy" ]; then
  stamp "generating hard tree"
  env JAX_PLATFORMS=cpu PYTHONPATH="$PWD" python tools/make_synthetic_data.py \
    --root "$ROOT" --per-class 32 --points 1024 --hard > "$LOGD/data.log" 2>&1 || { stamp "DATA FAILED"; exit 1; }
fi

if [ -z "$(find "$ROOT/output" -type d -name 'modelnet_checkpoint_epoch_16' 2>/dev/null)" ]; then
  stamp "training splitter feature model (source-only PointNet, 16 epochs)"
  env PYTHONPATH="$TPU_PP" python train_source.py --source modelnet \
    --cfg tools/cfgs/cfgs_local/direct_inference.yaml \
    --batch_size 16 --ckpt_save_interval 8 \
    --set DATA_ROOT "$ROOT" LOGS_ROOT "$ROOT" OPTIMIZATION.NUM_EPOCHES 16 \
    DATASET.FIXED_X_ROTATION False RANDOM_SEED 666 \
    > "$LOGD/src.log" 2>&1 || { stamp "SOURCE TRAIN FAILED"; exit 1; }
fi
CKPT=$(find "$ROOT/output" -type d -name "modelnet_checkpoint_epoch_16" | head -1)
[ -n "$CKPT" ] || { stamp "NO CKPT FOUND"; exit 1; }

if [ ! -d "$ROOT/modelnet/spliter" ]; then
  stamp "running kmeans cluster splitter"
  env JAX_PLATFORMS=cpu PYTHONPATH="$PWD" python dataset_splitter.py \
    --dataset modelnet --data_root "$ROOT" --pre_trained "$CKPT" \
    > "$LOGD/split.log" 2>&1 || { stamp "SPLITTER FAILED"; exit 1; }
fi

for SEED in $SEEDS; do
  for ARM in full clsonly; do
    LOG="$LOGD/dg_${ARM}_${SEED}.log"
    if grep -q "complete in" "$LOG" 2>/dev/null; then
      stamp "skip $ARM seed=$SEED (done)"; continue
    fi
    EXTRA=""
    # NB: 0.0, not 0 — the typed --set (utils/config.py) rejects an int
    # override of a float key.
    [ "$ARM" = clsonly ] && EXTRA="METHODS.MMD_WEIGHT 0.0"
    stamp "arm=$ARM seed=$SEED starting"
    env PYTHONPATH="$TPU_PP" python train_dg_single_gpu.py --source modelnet \
      --cfg tools/cfgs/cfgs_local/DG_unified_loss.yaml \
      --batch_size 16 \
      --set DATA_ROOT "$ROOT" LOGS_ROOT "$ROOT" Model DGCNN \
      OPTIMIZATION.NUM_EPOCHES 12 DATASET.FIXED_X_ROTATION False \
      DATASET_SPLITTER.METHOD Cluster RANDOM_SEED "$SEED" $EXTRA \
      > "$LOG" 2>&1
    stamp "arm=$ARM seed=$SEED rc=$? best: $(grep -o 'Best Tar Acc: [0-9.]*' "$LOG" | tail -2 | tr '\n' ' ')"
  done
done
stamp "CAMPAIGN DONE"
