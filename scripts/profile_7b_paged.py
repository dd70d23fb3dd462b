#!/usr/bin/env python
"""7B paged batched serving probe (standalone: the bench never runs 7B
batched in-process — an OOM wedges the tunneled backend, docs/PARITY.md).

Round-2 dense rows: 7B int8 B=4 M=16 = 224 tok/s; B=8 (dense int8-KV)
= 276.  Dense batched attention reads B x 512 MB of PADDED KV per step
(S=1024, 16 KB/token) — at B=8 that is 4.3 GB/step, rivaling the weight
stream.  The paged engine's kernel reads only live pages (~0.3 GB), and
int8 pages halve that again.

Usage: python scripts/profile_7b_paged.py [--b 8] [--quant-kv]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n-pages", type=int, default=0,
                    help="0 = sized from B (4 pages/slot + slack)")
    ap.add_argument("--quant-kv", action="store_true")
    ap.add_argument("--quantize", default="int8",
                    choices=("int8", "int4", "int4-samebase"),
                    help="weight dtype; int4 routes the batched forward "
                         "through the weight-streaming Pallas kernel; "
                         "int4-samebase requantizes the int8 row's exact "
                         "base weights (ops/quant.int4_requant_from_int8_"
                         "init) so tok/s+accept compare apples-to-apples")
    ap.add_argument("--model", default="7b", choices=("1b", "7b"),
                    help="1b reproduces the bench's paged-peak row shape")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.config import GenerationConfig
    from samd_tpu.fused_sam import FusedSamConfig, PagedBatchedFusedSamEngine
    from samd_tpu.models import llama_1b, llama_7b
    from samd_tpu.ops.quant import init_quantized_llama_params

    cfg7 = llama_7b() if args.model == "7b" else llama_1b()
    if args.quantize == "int4-samebase":
        from dataclasses import replace
        from samd_tpu.ops.quant import int4_requant_from_int8_init
        cfg7 = replace(cfg7, int4_impl="kernel")
        params7, _ = int4_requant_from_int8_init(cfg7, jax.random.PRNGKey(0))
    elif args.quantize == "int4":
        import jax.numpy as jnp
        from dataclasses import replace
        cfg7 = replace(cfg7, int4_impl="kernel")
        params7 = init_quantized_llama_params(cfg7, jax.random.PRNGKey(0),
                                              dtype=jnp.int4)
    else:
        params7 = init_quantized_llama_params(cfg7, jax.random.PRNGKey(0))
    B, M = args.b, args.m
    n_pages = args.n_pages or (4 * B + 8)
    MAX_CACHE, NEW = 1024, 128
    gen = GenerationConfig(max_new_tokens=NEW, max_cache_len=MAX_CACHE)
    warm = GenerationConfig(max_new_tokens=4, max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg7.vocab_size, size=96).tolist()
               for _ in range(4)]
    fc = FusedSamConfig(steps_per_call=16, n_predicts=M - 1)

    def mk(corpus=None):
        return PagedBatchedFusedSamEngine(
            cfg7, params7, fc, corpus=corpus, batch_size=B,
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,),
            n_pages=n_pages, page_size=128, quantized_kv=args.quant_kv,
            interpret=False)

    probe = mk()
    probe.add_request(prompts[0][:64], warm)
    probe.run()
    for p in prompts[:2]:
        probe.add_request(p, gen)
    corp = []
    for r in probe.run().values():
        corp += r.output_ids + [0]
    del probe
    eng = mk(corp)
    eng.add_request(prompts[0][:64], warm)
    eng.run()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for p in prompts * (2 * B // 4):
            eng.add_request(p, gen)
        res = eng.run()
        dt = time.perf_counter() - t0
        tok = sum(r.decode_tokens for r in res.values())
        steps = sum(r.decode_steps for r in res.values())
        if best is None or tok / dt > best[0]:
            best = (tok / dt, tok, steps, dt)
    tps, tok, steps, dt = best
    print(f"{args.model} {args.quantize} "
          f"paged{' int8-KV' if args.quant_kv else ''} "
          f"batched fused-sam "
          f"(B={B} M={M}, {n_pages} pages): {tok} tokens in {dt:.2f}s = "
          f"{tps:.1f} tok/s, accept {tok/max(steps,1):.2f}, "
          f"peak pages {eng.peak_pages}/{n_pages}", flush=True)


if __name__ == "__main__":
    main()
