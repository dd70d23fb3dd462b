#!/usr/bin/env python
"""Measure host-loop request interleaving on the real TPU.

Sequential SamdEngine (one blocking fetch per step, device idle during the
round trip) vs InterleavedSamdEngine with N lanes (fetches overlap).  Same
prompts, greedy, dynamic-SAM-only drafting (relative comparison — both sides
share the accept profile).

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_interleave.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import SamdEngine
    from samd_tpu.interleave import InterleavedSamdEngine
    from samd_tpu.models import init_params, llama_1b

    cfg = llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0))
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=60,
                          alpha=4.0, len_bias=0)
    MAX_CACHE = 1024
    gen = GenerationConfig(max_new_tokens=args.new_tokens,
                           max_cache_len=MAX_CACHE)
    warm = GenerationConfig(max_new_tokens=8, max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg.vocab_size, size=96).tolist()
               for _ in range(args.prompts)]
    kw = dict(max_cache_len=MAX_CACHE, eos_token_id=-1,
              prefill_buckets=(128,))

    seq = SamdEngine(cfg, params, samd_cfg,
                     make_drafter(samd_cfg, cfg.vocab_size), **kw)
    seq.generate(prompts[0][:64] + prompts[0][:32], warm)
    best = None
    exp = None
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        outs = [seq.generate(p, gen) for p in prompts]
        dt = time.perf_counter() - t0
        tok = sum(o.decode_tokens for o in outs)
        if best is None or dt < best:
            best, exp = dt, [o.output_ids for o in outs]
    seq_tps = tok / best
    print(f"sequential: {tok} tokens in {best:.2f}s = {seq_tps:.1f} tok/s")

    for n in args.lanes:
        inter = InterleavedSamdEngine(
            cfg, params, samd_cfg,
            lambda: make_drafter(samd_cfg, cfg.vocab_size), lanes=n, **kw)
        inter.add_request(prompts[0][:64] + prompts[0][:32], warm)
        inter.run()
        best_i = None
        got = None
        for _ in range(args.repeats):
            rids = [inter.add_request(p, gen) for p in prompts]
            t0 = time.perf_counter()
            res = inter.run()
            dt = time.perf_counter() - t0
            tok_i = sum(r.decode_tokens for r in res.values())
            if best_i is None or dt < best_i:
                best_i = dt
                got = [res[r].output_ids for r in rids]
        tps = tok_i / best_i
        equal = sum(int(a == b) for a, b in zip(exp, got))
        print(f"interleaved lanes={n}: {tok_i} tokens in {best_i:.2f}s = "
              f"{tps:.1f} tok/s ({tps / seq_tps:.2f}x), "
              f"outputs equal {equal}/{len(exp)}")


if __name__ == "__main__":
    main()
