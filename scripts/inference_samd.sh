#!/bin/bash
# SAM-Decoding[Token Recycle]: n_predicts=40 len_threshold=5 len_bias=5
# (reference scripts/inference_samd.sh:16-20)
set -ex
cd "$(dirname "$0")/.."
python -m samd_tpu.evaluation.launch \
    --engine sam_hybrid --tree-method token_recycle \
    --n-predicts 40 --len-threshold 5 --len-bias 5 \
    --question-file "${QUESTIONS:-questions.jsonl}" \
    --out "${OUT:-answers-samd.jsonl}" \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} ${SAM:+--sam "$SAM"} "$@"
