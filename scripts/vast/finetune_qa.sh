#!/usr/bin/env bash
# QA finetuning launches (reference: scripts/vast/finetune_qa.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
CONFIG=${1:-vast_tpu/configs/finetune_cfg/VQA-msrvtt.json}
OUTPUT=${2:-output/$(basename "${CONFIG%.json}")}
python3 run.py --config "$CONFIG" --output_dir "$OUTPUT"     --pretrain_dir "${PRETRAIN_DIR:-}" "${@:3}"
