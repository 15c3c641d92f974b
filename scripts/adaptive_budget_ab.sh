#!/bin/bash
# A/B measurement of the adaptive offline-eval tile budgets (round 4b):
# short specular-scene run at reference resolution, then offline render the
# SAME saved model with the legacy fixed tiering vs adaptive budgets and
# record both metric sets next to the loop eval. Serializes all TPU work in
# one process chain (one TPU client at a time — CLAUDE.md).
set -e -o pipefail
cd /root/repo
OUT=${1:-runs/specadapt}

python scripts/ref_scale_validation.py --out "$OUT" --scene_style specular \
    --iterations 5000 2>&1 | tail -5

M="$OUT/model"
echo "=== offline render: legacy fixed tiering ==="
python -m mvs_gaussian_splatting_tpu.cli.render -m "$M" --skip_train \
    --no-adaptive_budgets 2>&1 | tail -3
python -m mvs_gaussian_splatting_tpu.eval.metrics -m "$M" 2>&1 | tail -5
mv "$M/results.json" "$M/results_fixed_tiers.json"
mv "$M/per_view.json" "$M/per_view_fixed_tiers.json"

echo "=== offline render: adaptive budgets ==="
python -m mvs_gaussian_splatting_tpu.cli.render -m "$M" --skip_train \
    2>&1 | tail -4
python -m mvs_gaussian_splatting_tpu.eval.metrics -m "$M" 2>&1 | tail -5

echo "=== loop eval (history) ==="
python - "$OUT" <<'EOF'
import json, sys
h = json.load(open(sys.argv[1] + "/history.json"))
print("loop eval:", h["psnr_test"])
for tag in ("results_fixed_tiers", "results"):
    r = json.load(open(sys.argv[1] + "/model/%s.json" % tag))
    print(tag, r)
EOF
