#!/usr/bin/env bash
# Retrieval finetuning launches (reference: scripts/vast/finetune_ret.sh).
# JAX SPMD uses all local devices from one process — no torch.distributed
# launcher; multi-host runs start this same command on every host.
set -euo pipefail
cd "$(dirname "$0")/../.."

CONFIG=${1:-vast_tpu/configs/finetune_cfg/retrieval-msrvtt.json}
OUTPUT=${2:-output/$(basename "${CONFIG%.json}")}

python3 run.py \
    --config "$CONFIG" \
    --output_dir "$OUTPUT" \
    --pretrain_dir "${PRETRAIN_DIR:-}" \
    "${@:3}"

# catalog (mirrors the commented launch list in the reference script):
#   vast_tpu/configs/finetune_cfg/retrieval-{msrvtt,flickr,mscoco,didemo,
#     activitynet,vatex,youcook,lsmdc,valor32k,audiocaps,clothov2}.json
