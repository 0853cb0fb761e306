#!/usr/bin/env bash
# Released-checkpoint quality-parity runbook (PARITY.md Known-gaps #1).
#
# On a machine with the released VAST weights and the MSR-VTT data:
#
#     scripts/verify_release_parity.sh /path/to/vast.pt /path/to/datasets
#
# Runs retrieval-msrvtt + caption-msrvtt eval through run.py's ingest +
# test pipeline, prints one JSON line with video R@1 and CIDEr, and exits
# nonzero if either lands outside the published ranges (R@1 63.9, CIDEr
# 78.0 — VAST paper). Extra args pass through to the python driver, e.g.
# --expect_r1 60:68 or --skip_cap.
set -euo pipefail
ckpt=${1:?usage: verify_release_parity.sh CHECKPOINT [DATA_ROOT] [extra flags]}
shift
data=()
if [ $# -gt 0 ] && [ -d "$1" ]; then
    data=(--data_root "$1")
    shift
fi
# ${data[@]+...}: empty-array expansion trips `set -u` on bash < 4.4
# (macOS 3.2, older RHEL) — guard so no-DATA_ROOT invocations work there
exec python "$(dirname "$0")/verify_release_parity.py" \
    --checkpoint "$ckpt" ${data[@]+"${data[@]}"} "$@"
