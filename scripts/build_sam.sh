#!/bin/bash
# corpus pipeline: instructions -> model responses -> static SAM (.npz)
# (reference tools/prepare_prompts.py + gen_response.py + gen_sam_alpaca.py)
set -ex
cd "$(dirname "$0")/.."
python -m samd_tpu.tools.gen_corpus \
    --input "${INSTRUCTIONS:-instructions.jsonl}" \
    --output "${CORPUS:-corpus.jsonl}" \
    ${MODEL_DIR:+--model-dir "$MODEL_DIR"} "$@"
python -m samd_tpu.tools.build_sam \
    --input "${CORPUS:-corpus.jsonl}" --output "${SAM:-sam.npz}" \
    ${MODEL_DIR:+--tokenizer "$MODEL_DIR"} --add-vocab "${VOCAB:-0}"
