#!/bin/bash
# Per-backbone recapture at round-5 HEAD (docs/PERF.md table refresh) plus
# the stacked-forward speed A/B for the BN backbones.
#
# Value-ordered and resumable (skips any config whose JSON already exists):
#   1. bf16 for all five backbones — the production-policy column is the
#      stale one (PERF.md:150: four cells are round-3 measurements).
#   2. stacked-forward bf16 for DGCNN/PointNet++ — transfer-neutrality is
#      already proven (docs/VALIDATION.md "Stacked both-domains forward");
#      a measured speed win flips their default in engine/dg_trainer.py.
#   3. f32 for PointNet++ (PartialReduce ball query landed after the r4
#      f32 sweep) and DGCNN (flagship sanity).
#   4. Extras if budget remains: stacked PointNet/PTran, f32 rest.
#
# Usage: bash tools/scripts/scripts_local/bench5_recapture.sh [OUTDIR]
set -u
cd "$(dirname "$0")/../../.."
OUT=${1:-/tmp/bench5}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
stamp() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/progress.txt"; }

run() { # model batch dtype tag extra-env...
  local m=$1 b=$2 dt=$3 tag=$4; shift 4
  local f="$OUT/${m}_${dt}${tag}.json"
  if [ -s "$f" ] && ! grep -q '"error"' "$f"; then
    stamp "skip $m $dt$tag (done)"; return
  fi
  stamp "measuring $m $dt$tag"
  env "$@" timeout 1500 python bench.py --out "$f" \
    --measure "{\"model_name\":\"$m\",\"batch\":$b,\"dtype\":\"$dt\"}" \
    >> "$OUT/${m}_${dt}${tag}.log" 2>&1
  stamp "$m $dt$tag rc=$? $(head -c 240 "$f" 2>/dev/null)"
}

run DGCNN 64 bf16 "" X=1
run Pointnet2 64 bf16 "" X=1
run KPConv 16 bf16 "" X=1
run PTran 32 bf16 "" X=1
run Pointnet 64 bf16 "" X=1

run DGCNN 64 bf16 "_stacked" SUG_STACKED_FORWARD=1
run Pointnet2 64 bf16 "_stacked" SUG_STACKED_FORWARD=1

run Pointnet2 64 f32 "" X=1
run DGCNN 64 f32 "" X=1

run Pointnet 64 bf16 "_stacked" SUG_STACKED_FORWARD=1
run PTran 32 bf16 "_stacked" SUG_STACKED_FORWARD=1
run Pointnet 64 f32 "" X=1
run PTran 32 f32 "" X=1
stamp "SWEEP DONE"
