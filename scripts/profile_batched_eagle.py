#!/usr/bin/env python
"""Batched SAM[EAGLE-2] throughput probe on the real TPU (bench
methodology: own-trajectory corpus probed first, best of N repeats).

The reference's strongest-accept configuration under continuous batching
(BatchedFusedHybridEagleEngine).  Batch-tuned tree defaults follow the
hybrid sweep (docs/PERFORMANCE.md "Block size is a batch-dependent knob"):
small block at B>=8, the 63-node single-stream tree is activation-bound.

Usage: python scripts/profile_batched_eagle.py [--b 8] [--int8]
    [--depth 4] [--topk 4] [--total 23] [--block 24]
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
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--topk", type=int, default=4)
    ap.add_argument("--total", type=int, default=23)
    ap.add_argument("--block", type=int, default=24)
    ap.add_argument("--n-predicts", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--paged", action="store_true",
                    help="target KV on the page pool (int8 pages with "
                         "--quant-kv)")
    ap.add_argument("--quant-kv", action="store_true")
    ap.add_argument("--model", default="1b", choices=("1b", "7b"),
                    help="7b requires --int8 (bf16 weights exceed HBM)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.config import GenerationConfig
    from samd_tpu.fused_hybrid import (
        BatchedFusedHybridEagleEngine,
        FusedHybridEagleConfig,
        PagedBatchedFusedHybridEagleEngine,
    )
    from samd_tpu.models import init_params, llama_1b, llama_7b

    cfg = llama_7b() if args.model == "7b" else llama_1b()
    net = None
    if args.int8:
        from samd_tpu.drafters.eagle.net import (EagleNetConfig,
                                                 init_eagle_params)
        from samd_tpu.ops.quant import (init_quantized_llama_params,
                                        quantize_eagle_params)

        # init directly in int8 (a 7B bf16 init would not fit the chip)
        params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0))
        net = quantize_eagle_params(init_eagle_params(
            EagleNetConfig.from_target(cfg), jax.random.PRNGKey(7)))
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    B = args.b
    MAX_CACHE, NEW = 1024, 128
    gen = GenerationConfig(max_new_tokens=NEW, max_cache_len=MAX_CACHE)
    warm = GenerationConfig(max_new_tokens=4, max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg.vocab_size, size=96).tolist()
               for _ in range(4)]
    hy = FusedHybridEagleConfig(
        steps_per_call=16, eagle_depth=args.depth, eagle_topk=args.topk,
        eagle_total=args.total, max_block=args.block,
        n_predicts=args.n_predicts)

    def mk(corpus=None):
        if args.paged:
            return PagedBatchedFusedHybridEagleEngine(
                cfg, params, hy, net_params=net, corpus=corpus,
                batch_size=B, max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,), n_pages=4 * B + 8, page_size=128,
                quantized_kv=args.quant_kv, interpret=False)
        return BatchedFusedHybridEagleEngine(
            cfg, params, hy, net_params=net, corpus=corpus, batch_size=B,
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,))

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
    for _ in range(args.repeats):
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
    pages = (f", peak pages {eng.peak_pages}/{4 * B + 8}"
             if args.paged else "")
    print(f"{args.model} {'paged ' if args.paged else ''}batched SAM[EAGLE-2]"
          f"{' int8' if args.int8 else ''}"
          f"{' int8-KV' if args.quant_kv else ''} "
          f"(B={B} block={args.block} tree={args.total}): {tok} tokens in "
          f"{dt:.2f}s = {tps:.1f} tok/s, accept {tok/max(steps,1):.2f}, "
          f"sam_steps {eng.sam_steps_total}/{eng.steps_total}{pages}",
          flush=True)


if __name__ == "__main__":
    main()
