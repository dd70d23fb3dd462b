"""Offline static-SAM build tool.

Reference pipeline: tools/prepare_prompts.py → tools/gen_response.py →
tools/gen_sam_alpaca.py → pickle (/root/reference/tools/).  Here one tool
covers tokenized input, with the C++ engine for construction speed and the
CSR .npz format for output:

    python -m samd_tpu.tools.build_sam --input corpus.jsonl --output sam.npz \
        [--tokenizer PATH] [--eos-token 2] [--add-vocab 32000] [--topk 8]

Input JSONL rows: {"tokens": [...]}, or {"text": "..."} /
{"prompt": ..., "response": ...} with ``--tokenizer``.  ``--add-vocab N``
appends every single-token sequence [i] for i<N so any token has at least one
transition (reference gen_sam_alpaca.py:43-44).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Iterator, List


def iter_token_sequences(path: str, tokenizer) -> Iterator[List[int]]:
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            if "tokens" in row:
                yield list(row["tokens"])
            elif "text" in row:
                if tokenizer is None:
                    raise SystemExit("--tokenizer required for text input")
                yield tokenizer.encode(row["text"])
            elif "prompt" in row and "response" in row:
                if tokenizer is None:
                    raise SystemExit("--tokenizer required for text input")
                yield tokenizer.encode(row["prompt"] + row["response"])
            else:
                raise SystemExit(f"unrecognized row keys: {sorted(row)}")


def build(args) -> None:
    import numpy as np

    from ..sam.native import best_sam_class

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        if args.eos_token is None:
            args.eos_token = tokenizer.eos_token_id

    eos = args.eos_token if args.eos_token is not None else 2
    cls = best_sam_class()
    sam = cls(track_text=True, track_counts=True)
    n_seqs = n_tokens = 0
    for seq in iter_token_sequences(args.input, tokenizer):
        sam.feed(seq, grow=True)
        if not seq or seq[-1] != eos:
            sam.feed([eos], grow=True)
        n_seqs += 1
        n_tokens += len(seq)
        if args.verbose and n_seqs % 1000 == 0:
            print(f"  {n_seqs} sequences / {n_tokens} tokens...",
                  file=sys.stderr)
    if args.add_vocab:
        for i in range(args.add_vocab):
            sam.feed([i, eos], grow=True)

    arrays = sam.to_arrays() if hasattr(sam, "to_arrays") else None
    if arrays is None:
        from ..sam.serialize import to_arrays

        arrays = to_arrays(sam)
    np.savez_compressed(args.output, **arrays)
    print(f"built SAM: {n_seqs} sequences, {n_tokens} tokens, "
          f"{int(arrays['link'].shape[0])} states -> {args.output}",
          file=sys.stderr)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="corpus JSONL")
    p.add_argument("--output", required=True, help="output .npz path")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (for text input)")
    p.add_argument("--eos-token", type=int, default=None)
    p.add_argument("--add-vocab", type=int, default=0,
                   help="append [i] for i < N for full vocab coverage")
    p.add_argument("--topk", type=int, default=8)
    p.add_argument("--verbose", action="store_true")
    build(p.parse_args())


if __name__ == "__main__":
    main()
