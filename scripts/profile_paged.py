#!/usr/bin/env python
"""Paged vs dense continuous batching at B=4 on the real TPU (the bench's
run_batched methodology: own-trajectory corpus per engine class).

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_paged.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.batching import BatchedSamdEngine, PagedBatchedSamdEngine
    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.models import init_params, llama_1b
    from samd_tpu.sam import SamCursor, build_corpus_sam

    cfg = llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0))
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=60,
                          alpha=4.0, len_bias=0)
    MAX_CACHE = 1024
    gen = GenerationConfig(max_new_tokens=128, max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg.vocab_size, size=96).tolist()
               for _ in range(4)]

    def run_batched(engine_ctor, label):
        probe = engine_ctor(lambda: make_drafter(samd_cfg, cfg.vocab_size))
        probe.add_request(prompts[0][:64],
                          GenerationConfig(max_new_tokens=4,
                                           max_cache_len=MAX_CACHE))
        probe.run()
        for p in prompts[:2]:
            probe.add_request(p, gen)
        probe_out = [r.output_ids for r in probe.run().values()]
        own_sam = build_corpus_sam(probe_out, eos_token=0, topk=8)
        eng = engine_ctor(
            lambda: make_drafter(samd_cfg, cfg.vocab_size,
                                 static_sam=SamCursor(own_sam)))
        eng.add_request(prompts[0][:64],
                        GenerationConfig(max_new_tokens=4,
                                         max_cache_len=MAX_CACHE))
        eng.run()
        best = None
        for _ in range(2):
            for p in prompts * 2:
                eng.add_request(p, gen)
            t0 = time.perf_counter()
            res = eng.run()
            dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in res.values())
            steps = sum(r.decode_steps for r in res.values())
            if best is None or dt < best[0]:
                best = (dt, tok, steps)
        dt, tok, steps = best
        print(f"{label}: {tok} tokens in {dt:.2f}s = {tok/dt:.1f} tok/s, "
              f"accept {tok/max(steps,1):.2f}", flush=True)
        return tok / dt

    d = run_batched(
        lambda df: BatchedSamdEngine(
            cfg, params, samd_cfg, df, batch_size=4,
            max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,)),
        "dense batched (B=4)")
    p = run_batched(
        lambda df: PagedBatchedSamdEngine(
            cfg, params, samd_cfg, df, batch_size=4,
            max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,), n_pages=48, page_size=128,
            interpret=False),
        "paged batched (B=4, window mask)")
    print(f"paged/dense ratio: {p/d:.3f}")


if __name__ == "__main__":
    main()
