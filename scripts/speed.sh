#!/bin/bash
# tokens/s + per-task speedup vs the baseline answer file
# (reference scripts/speed.sh)
set -e
cd "$(dirname "$0")/.."
python -m samd_tpu.evaluation.speed "${1:-answers-samd.jsonl}" \
    "${2:-answers-baseline.jsonl}"
