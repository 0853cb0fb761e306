#!/usr/bin/env bash
# Omni-modality pretraining (reference: scripts/vast/pretrain_vast.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
python3 run.py \
    --config vast_tpu/configs/pretrain_cfg/pretrain_vast.json \
    --output_dir "${1:-output/pretrain_vast}" "${@:2}"
