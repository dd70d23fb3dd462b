#!/usr/bin/env python
"""Serving-front-end latency/throughput probe on the real TPU.

Drives samd_tpu.server.Scheduler over the paged batched fused-sam engine
with staggered client arrivals (Poisson-ish fixed stagger) and reports
aggregate throughput plus per-request latency percentiles — the serving
numbers the engine tables don't show (they measure saturated batches).

Usage: python scripts/profile_server.py [--b 8] [--n 24] [--stagger-ms 50]
    [--int8] [--new-tokens 128]
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=24, help="total requests")
    ap.add_argument("--stagger-ms", type=float, default=50.0)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--engine", default="paged", choices=("paged", "dense"))
    ap.add_argument("--inline-prefill", action="store_true",
                    help="prompts stream through the decode loop "
                         "(zero admission stall)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.config import GenerationConfig
    from samd_tpu.fused_sam import (BatchedFusedSamEngine, FusedSamConfig,
                                    PagedBatchedFusedSamEngine)
    from samd_tpu.models import init_params, llama_1b
    from samd_tpu.server import Scheduler

    cfg = llama_1b()
    if args.int8:
        from samd_tpu.ops.quant import init_quantized_llama_params

        params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0))
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    B = args.b
    MAX_CACHE = 1024
    gen = GenerationConfig(max_new_tokens=args.new_tokens,
                           max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg.vocab_size, size=96).tolist()
               for _ in range(4)]
    fs_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
    if args.engine == "paged":
        eng = PagedBatchedFusedSamEngine(
            cfg, params, fs_cfg, batch_size=B, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,), n_pages=4 * B + 8,
            page_size=128, inline_prefill=args.inline_prefill)
    else:
        eng = BatchedFusedSamEngine(
            cfg, params, fs_cfg, batch_size=B, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,),
            inline_prefill=args.inline_prefill)
    # compile all shapes before timing
    eng.add_request(prompts[0][:64],
                    GenerationConfig(max_new_tokens=4,
                                     max_cache_len=MAX_CACHE))
    eng.run()
    for p in prompts:
        eng.add_request(p, gen)
    eng.run()

    sched = Scheduler(eng)
    lat = [None] * args.n
    tok = [0] * args.n

    def client(i):
        t0 = time.perf_counter()
        out = sched.generate(prompts[i % len(prompts)], gen, timeout=600)
        lat[i] = time.perf_counter() - t0
        tok[i] = out.decode_tokens

    t_start = time.perf_counter()
    threads = []
    for i in range(args.n):
        th = threading.Thread(target=client, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(args.stagger_ms / 1e3)
    for th in threads:
        th.join(timeout=600)
    wall = time.perf_counter() - t_start
    sched.close()

    lat_ms = np.array([x * 1e3 for x in lat if x is not None])
    total = sum(tok)
    print(f"server probe{' int8' if args.int8 else ''} ({args.engine} "
          f"fused-sam{' inline-prefill' if args.inline_prefill else ''} "
          f"B={B}, {args.n} reqs @ {args.stagger_ms:.0f} ms stagger, "
          f"{args.new_tokens} tok each): {total} tokens in {wall:.2f}s = "
          f"{total/wall:.1f} tok/s aggregate; per-request latency "
          f"p50 {np.percentile(lat_ms, 50):.0f} ms, "
          f"p90 {np.percentile(lat_ms, 90):.0f} ms, "
          f"p99 {np.percentile(lat_ms, 99):.0f} ms "
          f"(isolated single request ≈ "
          f"{args.new_tokens / (total/wall/B) * 1e3:.0f} ms at the same "
          f"per-slot rate)", flush=True)


if __name__ == "__main__":
    main()
