#!/usr/bin/env python
"""Test where the 1B forward's ~1.3 ms dtype-independent fixed cost lives.

Variants timed as K-iteration device while_loops (one blocking fetch each):
  base      — current forward (7 matmuls/layer: q,k,v,o,gate,up,down)
  fusedw    — qkv fused into one [H,(NH+2KH)D] matmul and gate+up into one
              [H,2I] matmul (4 matmuls/layer) — same bytes, fewer barriers
  s-sweep   — base at S in {256, 1024, 2048} (attention-cost check)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_forward_variants.py [--int8]
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--m", type=int, default=60)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models import init_params, llama_1b
    from samd_tpu.models.llama import (apply_rope, block_decode_mask, forward,
                                       rms_norm, rope_tables, _attention)
    from samd_tpu.ops.quant import QuantizedTensor, qmatmul

    cfg = llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.int8:
        from samd_tpu.ops.quant import quantize_llama_params
        params = quantize_llama_params(params)

    M, K = args.m, args.steps
    NH, KH, D, H, I = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                       cfg.hidden_size, cfg.intermediate_size)
    tri = jnp.tril(jnp.ones((M, M), bool))
    chain_pos = jnp.arange(M, dtype=jnp.int32)

    def cat(ws):
        if isinstance(ws[0], QuantizedTensor):
            return QuantizedTensor(
                q=jnp.concatenate([w.q for w in ws], axis=-1),
                scale=jnp.concatenate([w.scale for w in ws], axis=-1))
        return jnp.concatenate(ws, axis=-1)

    lp = params["layers"]
    fused_params = dict(params)
    fused_params["layers"] = {
        "attn_norm": lp["attn_norm"],
        "wqkv": cat([lp["wq"], lp["wk"], lp["wv"]]),
        "wo": lp["wo"],
        "mlp_norm": lp["mlp_norm"],
        "w_gate_up": cat([lp["w_gate"], lp["w_up"]]),
        "w_down": lp["w_down"],
    }

    def forward_fused(params, cfg, tokens, position_ids, kv_k, kv_v,
                      write_offset, attn_mask):
        B, T = tokens.shape
        h = params["embed"][tokens]
        cos, sin = rope_tables(position_ids, D, cfg.rope_theta)

        def write_kv(cache, block):
            return jax.lax.dynamic_update_slice(
                cache, block, (0, 0, write_offset, 0))

        def layer_step(carry, xs):
            h = carry
            lp, k_cache, v_cache = xs
            x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
            qkv = qmatmul(x, lp["wqkv"])
            q = qkv[..., :NH * D].reshape(B, T, NH, D)
            k = qkv[..., NH * D:(NH + KH) * D].reshape(B, T, KH, D)
            v = qkv[..., (NH + KH) * D:].reshape(B, T, KH, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            k_cache = write_kv(k_cache, k.transpose(0, 2, 1, 3))
            v_cache = write_kv(v_cache, v.transpose(0, 2, 1, 3))
            ctx = _attention(q, k_cache, v_cache, attn_mask, cfg)
            h = h + qmatmul(ctx, lp["wo"])
            x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
            gu = qmatmul(x, lp["w_gate_up"])
            gated = jax.nn.silu(gu[..., :I]) * gu[..., I:]
            h = h + qmatmul(gated, lp["w_down"])
            return h, (k_cache, v_cache)

        h, (kv_k, kv_v) = jax.lax.scan(layer_step, h,
                                       (params["layers"], kv_k, kv_v))
        h = rms_norm(h, params["final_norm"], cfg.rms_eps)
        head = params["lm_head"]
        if isinstance(head, QuantizedTensor):
            logits = jnp.dot(h, head.q.astype(h.dtype)
                             * head.scale.astype(h.dtype),
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(h, head, preferred_element_type=jnp.float32)
        return logits, h, kv_k, kv_v

    def make_loop(fwd, p, S):
        hist_len0 = jnp.int32(128)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def loop(params, kv_k, kv_v):
            def body(st):
                kv_k, kv_v, tok, i = st
                tokens = jnp.full((M,), tok, jnp.int32)
                s = jnp.arange(S)[None, None, :]
                mask = block_decode_mask(tri, hist_len0, S)
                mask = mask | (s == (hist_len0 + chain_pos)[None, :, None])
                logits, _, kv_k, kv_v = fwd(
                    params, cfg, tokens[None], chain_pos[None, :] + hist_len0,
                    kv_k, kv_v, hist_len0, mask)
                tok = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                return kv_k, kv_v, tok, i + 1

            st = jax.lax.while_loop(lambda st: st[3] < K, body,
                                    (kv_k, kv_v, jnp.int32(5), jnp.int32(0)))
            return st[0], st[1], st[2]

        return loop, p

    def timeit(name, fwd, p, S):
        kv_k, kv_v = init_kv_cache(cfg, 1, S)
        loop, p = make_loop(fwd, p, S)
        out = loop(p, kv_k, kv_v)
        kv_k, kv_v = out[0], out[1]
        np.asarray(out[2])
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = loop(p, kv_k, kv_v)
            kv_k, kv_v = out[0], out[1]
            np.asarray(out[2])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:34s} {1000*best/K:7.3f} ms/step")

    print(f"config: M={M} K={K} int8={args.int8}")
    timeit("base S=1024", forward, params, 1024)
    timeit("fusedw S=1024", forward_fused, fused_params, 1024)
    timeit("base S=256", forward, params, 256)
    timeit("base S=2048", forward, params, 2048)
    timeit("fusedw S=2048", forward_fused, fused_params, 2048)


if __name__ == "__main__":
    main()
