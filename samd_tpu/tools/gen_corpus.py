"""Corpus generation pipeline: instruction data → templated prompts →
model-generated responses → prompt+response JSONL for the static-SAM build.

TPU-native replacement for the reference's three-stage pipeline
(/root/reference/tools/prepare_prompts.py templating +
/root/reference/tools/gen_response.py vLLM batch generation): prompts are
templated here (alpaca / vicuna conventions) and responses come from the
repo's own batched fused engine — the drafts the static SAM serves must look
like *this* model's output, which is exactly what serving it produces.

    python -m samd_tpu.tools.gen_corpus \
        --input instructions.jsonl --output corpus.jsonl \
        [--model-dir HF_DIR | --synthetic] [--tokenizer PATH] \
        [--template vicuna|alpaca|none] [--max-new-tokens 1024] \
        [--temperature 0.8] [--top-p 0.95] [--batch 4]

Input rows: {"instruction": ..., ["input": ...]} (alpaca schema) or
{"prompt": ...}.  Output rows: {"prompt": ..., "response": ...} (or
{"tokens": [...]} in --synthetic token mode), consumable by
``samd_tpu.tools.build_sam``.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List


def log(msg):
    print(msg, file=sys.stderr, flush=True)


ALPACA_TEMPLATE = (
    "Below is an instruction that describes a task. Write a response that "
    "appropriately completes the request.\n\n### Instruction:\n{instruction}"
    "\n\n### Response:\n")
ALPACA_INPUT_TEMPLATE = (
    "Below is an instruction that describes a task, paired with an input "
    "that provides further context. Write a response that appropriately "
    "completes the request.\n\n### Instruction:\n{instruction}\n\n"
    "### Input:\n{input}\n\n### Response:\n")


def template_prompt(row: dict, template: str) -> str:
    """Reference prompt conventions (tools/prompter.py, data_utils.py)."""
    if "prompt" in row:
        return row["prompt"]
    instruction = row["instruction"]
    if template == "vicuna":
        from ..evaluation.codecs import VicunaCodec

        body = instruction
        if row.get("input"):
            body += "\n" + row["input"]
        return (f"{VicunaCodec.SYSTEM} USER: {body} ASSISTANT:")
    if template == "alpaca":
        if row.get("input"):
            return ALPACA_INPUT_TEMPLATE.format(
                instruction=instruction, input=row["input"])
        return ALPACA_TEMPLATE.format(instruction=instruction)
    return instruction


def main(argv: List[str] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model-dir", default=None,
                   help="HF checkpoint dir (models.loader.load_llama)")
    p.add_argument("--synthetic", action="store_true",
                   help="random tiny model + token-id passthrough (pipeline "
                        "testing without weights)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--template", default="vicuna",
                   choices=["vicuna", "alpaca", "none"])
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--max-cache-len", type=int, default=2048)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--eos-token-id", type=int, default=2)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        from ..testing import force_cpu

        force_cpu()
    import jax

    from ..config import GenerationConfig
    from ..fused_sam import BatchedFusedSamEngine, FusedSamConfig

    rows = []
    with open(args.input) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if args.limit:
        rows = rows[:args.limit]
    log(f"{len(rows)} instruction rows")

    tokenizer = None
    if args.model_dir or args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            args.tokenizer or args.model_dir, use_fast=True)

    if args.model_dir:
        from ..models.loader import load_llama

        cfg, params = load_llama(args.model_dir)
    else:
        from ..models import init_params, tiny_config

        cfg = tiny_config(vocab_size=256)
        params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)

    engine = BatchedFusedSamEngine(
        cfg, params, FusedSamConfig(),
        batch_size=args.batch, max_cache_len=args.max_cache_len,
        eos_token_id=args.eos_token_id)
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        max_cache_len=args.max_cache_len,
        greedy=args.temperature <= 0.0,
        temperature=max(args.temperature, 0.0), top_p=args.top_p)

    prompts, id_lists = [], []
    for row in rows:
        if "tokens" in row:
            prompts.append(None)
            id_lists.append(list(row["tokens"]))
            continue
        text = template_prompt(row, args.template)
        if tokenizer is None:
            raise SystemExit("--tokenizer (or --model-dir) required for "
                             "text input; or provide token rows")
        prompts.append(text)
        id_lists.append(tokenizer.encode(text))

    rids = [engine.add_request(ids, gen) for ids in id_lists]
    log("generating responses (batched fused engine)...")
    results = engine.run()

    with open(args.output, "w") as out:
        for row_prompt, ids, rid in zip(prompts, id_lists, rids):
            res = results[rid]
            gen_ids = res.output_ids[len(ids):]
            if row_prompt is None or tokenizer is None:
                out.write(json.dumps(
                    {"tokens": list(res.output_ids)}) + "\n")
            else:
                out.write(json.dumps({
                    "prompt": row_prompt,
                    "response": tokenizer.decode(
                        gen_ids, skip_special_tokens=True),
                }) + "\n")
    log(f"wrote {len(rows)} prompt+response rows to {args.output}")


if __name__ == "__main__":
    main()
