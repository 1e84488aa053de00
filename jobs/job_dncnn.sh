#!/bin/bash
# Canonical DnCNN runs over the four noise sources (mirrors ref:job_dncnn.sh:17-84).
# Usage: bash jobs/job_dncnn.sh <gauss|camnlf|nf|real|smoke> [noise_flow_model_dir]
set -e
cfg="${1:-gauss}"
NF_DIR="${2:-experiments/sidd/published}"
SIDD="${SIDD_PATH:-./data/SIDD_Medium_Raw/Data}"

case "$cfg" in
  gauss)
    python train_dncnn_noiseflow.py --model DnCNN_Gauss --train_data "$SIDD"
    python test_dncnn_noiseflow.py --model_name DnCNN_Gauss --set_dir data
    ;;
  camnlf)
    python train_dncnn_noiseflow.py --model DnCNN_CamNLF --train_data "$SIDD"
    python test_dncnn_noiseflow.py --model_name DnCNN_CamNLF --set_dir data
    ;;
  nf)
    python train_dncnn_noiseflow.py --model DnCNN_NF --train_data "$SIDD" \
      --noise_flow_path "$NF_DIR"
    python test_dncnn_noiseflow.py --model_name DnCNN_NF --set_dir data
    ;;
  real)
    python train_dncnn_noiseflow.py --model DnCNN_Real --train_data "$SIDD"
    python test_dncnn_noiseflow.py --model_name DnCNN_Real --set_dir data
    ;;
  smoke)
    python train_dncnn_noiseflow.py --model DnCNN_Gauss --synthetic_data 4 \
      --max_epoch 3 --batch_size 16 --depth 5 --filters 8 \
      --save_dir /tmp/dncnn_smoke
    python test_dncnn_noiseflow.py --model_name DnCNN_Gauss \
      --model_dir /tmp/dncnn_smoke --depth 5 --filters 8 --synthetic \
      --result_dir /tmp/dncnn_smoke_results
    ;;
  *) echo "unknown config: $cfg" >&2; exit 1;;
esac
