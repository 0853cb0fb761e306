#!/usr/bin/env bash
# Corpus audio captioner (reference: scripts/vast/audio_captioner.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
python3 run.py \
    --config vast_tpu/configs/captioner_cfg/caption-generation-audio.json \
    --output_dir "${1:-output/audio_captioner}" --mode testing "${@:2}"
