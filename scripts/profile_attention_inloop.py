#!/usr/bin/env python
"""In-loop attention-impl shootout at serving shapes.

Times the K-iteration forward loop (scripts/profile_step.py's methodology)
for (kv_layout, attention_impl, flash_block_s) variants at fixed hist_len,
to decide the default attention config for short-prefix decode.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_attention_inloop.py
"""

import argparse
import functools
import time
from dataclasses import replace

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--m", type=int, default=60)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--hist", type=int, default=128)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models import init_params, llama_1b
    from samd_tpu.models.llama import block_decode_mask, forward

    base_cfg = llama_1b()
    params = init_params(base_cfg, jax.random.PRNGKey(0))
    if args.int8:
        from samd_tpu.ops.quant import quantize_llama_params
        params = quantize_llama_params(params)

    S, M, K = args.s, args.m, args.steps
    tri = jnp.tril(jnp.ones((M, M), bool))
    chain_pos = jnp.arange(M, dtype=jnp.int32)
    hist_len0 = jnp.int32(args.hist)

    def timeit(name, cfg):
        kv_k, kv_v = init_kv_cache(cfg, 1, S)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def loop(params, kv_k, kv_v):
            def body(st):
                kv_k, kv_v, tok, i = st
                tokens = jnp.full((M,), tok, jnp.int32)
                s = jnp.arange(S)[None, None, :]
                mask = block_decode_mask(tri, hist_len0, S)
                mask = mask | (s == (hist_len0 + chain_pos)[None, :, None])
                logits, _, kv_k, kv_v = forward(
                    params, cfg, tokens[None], chain_pos[None, :] + hist_len0,
                    kv_k, kv_v, hist_len0, mask)
                tok = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                return kv_k, kv_v, tok, i + 1

            st = jax.lax.while_loop(lambda st: st[3] < K, body,
                                    (kv_k, kv_v, jnp.int32(5), jnp.int32(0)))
            return st[0], st[1], st[2]

        out = loop(params, kv_k, kv_v)
        kv_k, kv_v = out[0], out[1]
        np.asarray(out[2])
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = loop(params, kv_k, kv_v)
            kv_k, kv_v = out[0], out[1]
            np.asarray(out[2])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:40s} {1000*best/K:7.3f} ms/step", flush=True)

    print(f"config: S={S} M={M} K={K} hist={args.hist} int8={args.int8}")
    timeit("sd / xla (current default)",
           replace(base_cfg, kv_layout="sd", attention_impl="xla"))
    timeit("ds / xla",
           replace(base_cfg, kv_layout="ds", attention_impl="xla"))
    for bs in (512, 256, 128):
        timeit(f"ds / flash block={bs}",
               replace(base_cfg, kv_layout="ds", attention_impl="flash",
                       flash_block_s=bs))


if __name__ == "__main__":
    main()
