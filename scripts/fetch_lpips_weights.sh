#!/usr/bin/env bash
# Fetch torchvision VGG16 + the official LPIPS v0.1 linear heads and convert
# them to the NPZ this framework's jnp LPIPS consumes ($LPIPS_WEIGHTS_NPZ).
#
# Zero-egress containers cannot run this; on any machine with internet:
#   pip install torchvision
#   scripts/fetch_lpips_weights.sh /path/to/lpips_vgg.npz
# then copy the npz over and `export LPIPS_WEIGHTS_NPZ=/path/to/lpips_vgg.npz`
# — eval/metrics.py starts reporting real LPIPS numbers.
set -euo pipefail
OUT=${1:-lpips_vgg.npz}
cd "$(dirname "$0")/.."
python - "$OUT" << 'EOF'
import sys
from mvs_gaussian_splatting_tpu.eval.convert_lpips_weights import main
main(sys.argv[1])
EOF
echo "wrote $OUT — set LPIPS_WEIGHTS_NPZ=$OUT"
