#!/usr/bin/env bash
# Real-scene parity run: fetch LLFF fern + MipNeRF-360 garden, train with the
# reference recipe, render, and compute metrics (results.json).
#
# This container is zero-egress, so the fetch cannot run HERE — execute this
# on any box with internet + a TPU/CPU. Reference PSNR milestones to compare
# against (BASELINE.md):
#   fern r=4 baseline:    24.11@7K  24.01@10K  24.07@20K  24.13@30K
#   garden r=4 recipe:    garden.sh:22-26 (grad 0.0002, min_opacity 0.005)
#   bicycle r=4 baseline: 23.54@7K  25.10@15K  25.75@40K
#
# Usage: scripts/fetch_and_eval.sh [DATA_DIR] [OUT_DIR] [SCENE...]
set -euo pipefail

DATA=${1:-/tmp/gs_data}
OUT=${2:-/tmp/gs_runs}
shift 2 2>/dev/null || true
SCENES=("${@:-fern garden}")
[ $# -eq 0 ] && SCENES=(fern garden)
mkdir -p "$DATA" "$OUT"
cd "$(dirname "$0")/.."

fetch_fern() {
  [ -d "$DATA/nerf_llff_data/fern" ] && return
  echo "fetching LLFF (nerf_llff_data)..."
  # official NeRF data mirror
  curl -L -o "$DATA/nerf_llff_data.zip" \
    "https://storage.googleapis.com/nerf_data/nerf_llff_data.zip" ||
  gdown 16VnMcF1KJYxN9QId6TClMsZRahHNMW5g -O "$DATA/nerf_llff_data.zip"
  unzip -q "$DATA/nerf_llff_data.zip" -d "$DATA"
}

fetch_garden() {
  [ -d "$DATA/360_v2/garden" ] && return
  echo "fetching MipNeRF-360 (360_v2)..."
  curl -L -o "$DATA/360_v2.zip" \
    "https://storage.googleapis.com/gresearch/refraw360/360_v2.zip"
  unzip -q "$DATA/360_v2.zip" -d "$DATA/360_v2"
}

run_scene() {
  local name=$1 src=$2 res=$3 iters=$4
  local model="$OUT/${name}_r${res}"
  echo "=== $name (r=$res, ${iters} iters) ==="
  # the reference garden.sh:22-26 recipe (baseline flags)
  python -m mvs_gaussian_splatting_tpu.cli.train \
    -s "$src" -r "$res" --eval --model_path "$model" \
    --iterations "$iters" \
    --densify_grad_threshold 0.0002 --min_opacity 0.005 \
    --test_iterations 7000 10000 15000 20000 "$iters" \
    --save_iterations "$iters"
  python -m mvs_gaussian_splatting_tpu.cli.render -m "$model"
  python -m mvs_gaussian_splatting_tpu.eval.metrics -m "$model"
  echo "--- $model/results.json ---"
  cat "$model/results.json"
}

for s in "${SCENES[@]}"; do
  case "$s" in
    fern)    fetch_fern;   run_scene fern   "$DATA/nerf_llff_data/fern" 4 30000 ;;
    garden)  fetch_garden; run_scene garden "$DATA/360_v2/garden"       4 30000 ;;
    bicycle) fetch_garden; run_scene bicycle "$DATA/360_v2/bicycle"     4 40000 ;;
    *) echo "unknown scene $s"; exit 1 ;;
  esac
done
