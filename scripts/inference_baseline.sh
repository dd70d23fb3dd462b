#!/bin/bash
# Vanilla AR baseline (speedup denominator; reference inference_baseline.sh)
set -ex
cd "$(dirname "$0")/.."
python -m samd_tpu.evaluation.launch \
    --engine ar \
    --question-file "${QUESTIONS:-questions.jsonl}" \
    --out "${OUT:-answers-baseline.jsonl}" \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} "$@"
