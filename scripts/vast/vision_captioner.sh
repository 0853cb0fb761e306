#!/usr/bin/env bash
# Corpus vision captioner (reference: scripts/vast/vision_captioner.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
python3 run.py \
    --config vast_tpu/configs/captioner_cfg/caption-generation-vision.json \
    --output_dir "${1:-output/vision_captioner}" --mode testing "${@:2}"
