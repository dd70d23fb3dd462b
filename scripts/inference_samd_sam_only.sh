#!/bin/bash
# SAM-Decoding (sam_only): max_predicts=60 alpha=4.0 len_bias=0
# (reference scripts/inference_samd_sam_only.sh:16-19)
set -ex
cd "$(dirname "$0")/.."
python -m samd_tpu.evaluation.launch \
    --engine sam_only --max-predicts 60 --alpha 4.0 --len-bias 0 \
    --question-file "${QUESTIONS:-questions.jsonl}" \
    --out "${OUT:-answers-sam_only.jsonl}" \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} ${SAM:+--sam "$SAM"} "$@"
