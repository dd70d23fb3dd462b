#!/bin/bash
# losslessness: answer file must equal the baseline's outputs
# (reference scripts/equal.sh)
set -e
cd "$(dirname "$0")/.."
python -m samd_tpu.evaluation.equal "${1:-answers-samd.jsonl}" \
    "${2:-answers-baseline.jsonl}"
