"""Streaming chat CLI for the samd_tpu engine.

Reference: /root/reference/samd/inference/cli.py (FastChat-based REPL).  This
one is dependency-light: plain stdin REPL with ``!!reset`` / ``!!exit``
commands, streaming accepted-token chunks as they commit.

    python -m samd_tpu.cli --model /path/to/hf-llama [--sam corpus.npz] \
        [--mode sam_only|sam_hybrid] [--random-model]  # smoke mode

``--random-model`` runs a random-weight 1B model (no tokenizer: token-id
REPL) for smoke testing on machines without checkpoints.
"""

from __future__ import annotations

import argparse
import sys


def build_engine(args):
    import jax

    from .config import SamdConfig
    from .drafters import make_drafter
    from .engine import SamdEngine
    from .models import init_params, llama_1b
    from .sam.serialize import load_sam

    static_sam = None
    if args.sam:
        static_sam = load_sam(args.sam, topk=8)

    if args.random_model:
        if args.tiny:
            from .models import (tiny_config, tiny_moe_config,
                                 tiny_qwen2_config)

            cfg = {"llama": tiny_config,
                   "qwen2": tiny_qwen2_config,
                   "moe": tiny_moe_config}[args.family](vocab_size=256)
        elif args.family == "qwen2":
            from dataclasses import replace

            # 1B-class Qwen2-family shape (qkv biases, 1e6 rope)
            cfg = replace(llama_1b(), attn_bias=True, rope_theta=1e6)
        elif args.family == "moe":
            from dataclasses import replace

            # 8 experts at half the trunk's FFN width (~4.4B MLP params
            # would blow the single chip's HBM at full width)
            cfg = replace(llama_1b(), intermediate_size=2816,
                          num_experts=8, num_experts_per_tok=2)
        else:
            cfg = llama_1b()
        params = init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = None
        eos = -1
    else:
        from .models.loader import load_llama

        cfg, params = load_llama(args.model)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model)
        eos = tokenizer.eos_token_id

    if args.kv_quant:
        # int8 KV: 2x context/slots per chip; pair with flash+ds so speed
        # stays at parity (docs/PERFORMANCE.md "INT8 KV cache")
        from dataclasses import replace

        cfg = replace(cfg, kv_quant=True)

    if args.max_cache_len >= 2048 and not args.cpu \
            and cfg.num_kv_heads < 8:
        # long-cache configs: the v2 flash kernel + native-transposed KV
        # layout beat XLA's full-cache attention from S~2048 up (measured
        # crossover, docs/PERFORMANCE.md "Kernel-level"); single-stream
        # engines only — batched paths keep XLA (kernel is B=1-gated).
        # KH>=8 models instead get per-request cache buckets below (the
        # flash kernel is DMA-latency-bound at many kv heads).
        from dataclasses import replace

        cfg = replace(cfg, attention_impl="flash", kv_layout="ds")

    # big-KV models (7B-class: >=8 KB/token): per-request cache buckets —
    # attention scales with each request's reachable length instead of the
    # padded max (17.1 -> 12.8 ms/step measured at 7B;
    # docs/PERFORMANCE.md "7B step decomposition")
    kv_bytes_per_tok = 2 * cfg.num_kv_heads * cfg.head_dim * 2
    cache_buckets = ()
    if kv_bytes_per_tok >= 8192:
        cache_buckets = tuple(
            b for b in (256, 384, 512, 768, 1024, 1536, 2048, 3072)
            if b < args.max_cache_len)

    qdtype = None
    if args.quantize != "none":
        import jax.numpy as jnp

        from .ops.quant import quantize_llama_params

        qdtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
                  "int4": jnp.int4}[args.quantize]
        params = quantize_llama_params(params, dtype=qdtype)
        if args.quantize == "int4" and not args.cpu:
            # the Pallas weight-streaming kernel is the int4 speed path
            # (0.5 bytes/weight; the XLA fallback streams int8-parity
            # bytes) — auto-select it on the TPU
            from dataclasses import replace

            cfg = replace(cfg, int4_impl="kernel")

    def quantized_net():
        """EAGLE draft net matching the engines' default init, quantized to
        the serving dtype so the expansion loop streams 1-byte weights."""
        if qdtype is None:
            return None
        import jax

        from .drafters.eagle.net import EagleNetConfig, init_eagle_params
        from .ops.quant import quantize_eagle_params

        net = init_eagle_params(EagleNetConfig.from_target(cfg),
                                jax.random.PRNGKey(7))
        return quantize_eagle_params(net, dtype=qdtype)

    if args.engine == "fused_sam":
        from .fused_sam import FusedSamConfig, FusedSamEngine

        corpus = static_sam.text if static_sam is not None else None
        engine = FusedSamEngine(cfg, params,
                                FusedSamConfig(cache_buckets=cache_buckets),
                                corpus=corpus,
                                max_cache_len=args.max_cache_len,
                                eos_token_id=eos)
    elif args.engine == "pld":
        from .pld import PldEngine

        engine = PldEngine(cfg, params, max_cache_len=args.max_cache_len,
                           eos_token_id=eos)
    elif args.engine == "token_recycle":
        from .token_recycle_fused import FusedTokenRecycleEngine

        engine = FusedTokenRecycleEngine(cfg, params,
                                         max_cache_len=args.max_cache_len,
                                         eos_token_id=eos)
    elif args.engine == "fused_hybrid":
        from .fused_hybrid import FusedHybridConfig, FusedHybridEngine

        corpus = static_sam.text if static_sam is not None else None
        engine = FusedHybridEngine(
            cfg, params, FusedHybridConfig(cache_buckets=cache_buckets),
            corpus=corpus, max_cache_len=args.max_cache_len,
            eos_token_id=eos)
    elif args.engine == "fused_sam_eagle2":
        from .fused_hybrid import (
            FusedHybridEagleConfig,
            FusedHybridEagleEngine,
        )

        corpus = static_sam.text if static_sam is not None else None
        engine = FusedHybridEagleEngine(cfg, params,
                                        FusedHybridEagleConfig(),
                                        corpus=corpus,
                                        net_params=quantized_net(),
                                        max_cache_len=args.max_cache_len,
                                        eos_token_id=eos)
    elif args.engine == "eagle2":
        from .eagle_fused import FusedEagle2Engine

        engine = FusedEagle2Engine(cfg, params,
                                   net_params=quantized_net(),
                                   max_cache_len=args.max_cache_len,
                                   eos_token_id=eos)
    else:
        samd_cfg = SamdConfig(draft_source=args.mode)
        engine = SamdEngine(
            cfg, params, samd_cfg,
            make_drafter(samd_cfg, cfg.vocab_size, static_sam=static_sam),
            max_cache_len=args.max_cache_len, eos_token_id=eos)
    return engine, tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, help="HF Llama checkpoint dir")
    p.add_argument("--sam", default=None, help="static corpus SAM (.npz)")
    p.add_argument("--mode", default="sam_only",
                   choices=["sam_only", "sam_hybrid"])
    p.add_argument("--engine", default="samd",
                   choices=["samd", "fused_sam", "pld", "token_recycle",
                            "fused_hybrid", "fused_sam_eagle2", "eagle2"],
                   help="samd = host SAM automata; fused_* = device loops; "
                        "fused_hybrid = SAM[Token Recycle]; "
                        "fused_sam_eagle2 = SAM[EAGLE-2]")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (2x context per chip; single-stream "
                        "engines)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "fp8", "int4"],
                   help="weight-only quantization (int8 is the fastest "
                        "serving config: 0.78x the bf16 step time on v5e, "
                        "2.2x less parameter HBM; int4 packs two nibbles "
                        "per byte — 4.4x less weight HBM, fits 13B-class "
                        "models on one 16 GB chip)")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--max-cache-len", type=int, default=2048)
    p.add_argument("--random-model", action="store_true")
    p.add_argument("--family", default="llama",
                   choices=("llama", "qwen2", "moe"),
                   help="with --random-model: model family (real "
                        "checkpoints dispatch on config.json model_type)")
    p.add_argument("--tiny", action="store_true",
                   help="with --random-model: tiny config (CPU smoke tests)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (never grabs the TPU)")
    args = p.parse_args()
    if args.cpu:
        from .testing import force_cpu

        force_cpu()
    if not args.random_model and not args.model:
        p.error("--model required (or --random-model for smoke testing)")

    from .config import GenerationConfig

    engine, tokenizer = build_engine(args)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           max_cache_len=args.max_cache_len)
    # conversation = list of [user_ids, assistant_ids] turns — the turn
    # structure backs the reference REPL's conversation commands
    # (/root/reference/samd/inference/cli.py:9-14): !!remove drops the last
    # exchange, !!regen re-generates it, !!save/!!load persist the turns.
    turns = []

    def history_ids():
        out = []
        for u, a in turns:
            out += u + a
        return out

    def run_turn(ids):
        """Generate + stream one assistant reply; returns its token ids."""
        print("ASSISTANT> ", end="", flush=True)
        out_ids = []
        if hasattr(engine, "stream_generate"):
            chunks = engine.stream_generate(ids, gen)
        else:  # fused engines emit whole segments
            chunks = [engine.generate(ids, gen).output_ids[len(ids):]]
        for chunk in chunks:
            out_ids.extend(chunk)
            if tokenizer is not None:
                print(tokenizer.decode(chunk, skip_special_tokens=True),
                      end="", flush=True)
            else:
                print(" ".join(map(str, chunk)), end=" ", flush=True)
        print()
        return out_ids

    print("samd_tpu chat — !!reset clears context, !!remove drops the last "
          "exchange, !!regen redoes it, !!save/!!load <path> persist the "
          "conversation, !!exit quits", file=sys.stderr)
    while True:
        try:
            line = input("USER> ")
        except (EOFError, KeyboardInterrupt):
            break
        cmd = line.strip()
        if cmd == "!!exit":
            break
        if cmd == "!!reset":
            turns = []
            continue
        if cmd == "!!remove":
            if turns:
                turns.pop()
            else:
                print("(nothing to remove)", file=sys.stderr)
            continue
        if cmd == "!!regen":
            if not turns:
                print("(nothing to regenerate)", file=sys.stderr)
                continue
            user_ids, _ = turns.pop()
            ids = history_ids() + user_ids
            turns.append([user_ids, run_turn(ids)])
            continue
        if cmd.startswith("!!save"):
            import json

            path = cmd[len("!!save"):].strip() or "conversation.json"
            with open(path, "w") as f:
                json.dump(turns, f)
            print(f"(saved {len(turns)} turns to {path})", file=sys.stderr)
            continue
        if cmd.startswith("!!load"):
            import json

            path = cmd[len("!!load"):].strip() or "conversation.json"
            try:
                with open(path) as f:
                    turns = [list(t) for t in json.load(f)]
                print(f"(loaded {len(turns)} turns from {path})",
                      file=sys.stderr)
            except (OSError, ValueError) as e:
                print(f"(load failed: {e})", file=sys.stderr)
            continue
        if tokenizer is not None:
            user_ids = tokenizer.encode(line)
        else:
            try:
                user_ids = [int(x) for x in line.split()]
            except ValueError:
                print("(token-id mode: enter space-separated ints)",
                      file=sys.stderr)
                continue
        ids = history_ids() + user_ids
        turns.append([user_ids, run_turn(ids)])


if __name__ == "__main__":
    main()
