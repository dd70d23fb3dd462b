#!/usr/bin/env python
"""Decompose the fused-sam step time on the real TPU.

Times K-iteration device while_loops of successively larger slices of the
fused step body (forward only; +accept; +retrieval; full engine body) so the
per-step cost of each component is (loop_time / K) with zero dispatch noise.
Timing rule for the tunneled chip: block on a 1-element fetch, never
block_until_ready (CLAUDE.md).

Usage: python scripts/profile_step.py [--steps 64] [--s 1024] [--int8]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--m", type=int, default=60)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="packed-nibble int4 weights (ops/quant.Int4Tensor)")
    ap.add_argument("--model", default="1b", choices=("1b", "7b"),
                    help="7b implies --int8 (bf16 7B does not fit next to "
                         "anything else on a 16 GB chip)")
    ap.add_argument("--flash", action="store_true",
                    help="flash attention + ds KV layout (dead-tail skip)")
    ap.add_argument("--window", type=int, default=0,
                    help="static attention window (llama.forward "
                         "attn_window); 0 = full cache")
    ap.add_argument("--flash-block", type=int, default=512,
                    help="flash kernel KV block size (dead-tail skip "
                         "granularity; 7B wants small blocks — its KV is "
                         "16 KB/token so the padded tail costs ~3.8 ms)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.fused_base import make_retrieval_draft, load_corpus_buffer
    from samd_tpu.fused_sam import FusedSamConfig
    from samd_tpu.models import init_params, llama_1b, llama_7b
    from samd_tpu.models.llama import block_decode_mask, forward

    qdtype = jnp.int4 if args.int4 else jnp.int8
    if args.model == "7b":
        from samd_tpu.ops.quant import init_quantized_llama_params

        cfg = llama_7b()
        params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0),
                                             dtype=qdtype)
    else:
        cfg = llama_1b()
        params = init_params(cfg, jax.random.PRNGKey(0))
        if args.int8 or args.int4:
            from samd_tpu.ops.quant import quantize_llama_params
            params = quantize_llama_params(params, dtype=qdtype)
    if args.int4:
        # packed-int4 must go through the Pallas weight-streaming kernel —
        # the default XLA _deq4 fallback streams int8-parity bytes and
        # would misattribute ~2x weight traffic to "the int4 step"
        from dataclasses import replace as _dcr

        cfg = _dcr(cfg, int4_impl="kernel")
    if args.flash:
        from dataclasses import replace as _dcr

        cfg = _dcr(cfg, attention_impl="flash", kv_layout="ds",
                   flash_block_s=args.flash_block)

    S, M, K = args.s, args.m, args.steps
    fc = FusedSamConfig(n_predicts=M - 1, corpus_capacity=4096)
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    rng = np.random.default_rng(0)
    corpus_list = rng.integers(3, cfg.vocab_size, size=4096).tolist()
    corpus, corpus_len = load_corpus_buffer(corpus_list, fc.corpus_capacity)
    retrieve = make_retrieval_draft(
        S=S, corpus=corpus, corpus_len=corpus_len, max_ngram=fc.max_ngram,
        ext=fc.ext, len_bias=fc.len_bias, block=M)

    tri = jnp.tril(jnp.ones((M, M), bool))
    chain_pos = jnp.arange(M, dtype=jnp.int32)
    history0 = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=S).astype(np.int32))
    hist_len0 = jnp.int32(128)

    if args.window:
        raise SystemExit("--window was removed with llama.forward's "
                         "attn_window (a cache slice recovers nothing — "
                         "docs/PERFORMANCE.md); use cache_buckets instead")
    Wc = S

    def fwd_block(params, kv_k, kv_v, tokens, hist_len, draft_len):
        s = jnp.arange(Wc)[None, None, :]
        mask = block_decode_mask(tri, hist_len, Wc)
        in_block = (s >= hist_len) & (s < hist_len + M)
        mask = mask & (~in_block | (s < hist_len + draft_len))
        mask = mask | (s == (hist_len + chain_pos)[None, :, None])
        logits, _, kv_k, kv_v = forward(
            params, cfg, tokens[None], chain_pos[None, :] + hist_len,
            kv_k, kv_v, hist_len, mask)
        return logits, kv_k, kv_v

    # --- (a) forward only, K times (fixed tokens; carry a token to chain) --
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def loop_forward(params, kv_k, kv_v, history, hist_len):
        def body(st):
            kv_k, kv_v, tok, i = st
            tokens = jnp.full((M,), tok, jnp.int32)
            logits, kv_k, kv_v = fwd_block(params, kv_k, kv_v, tokens,
                                           hist_len, jnp.int32(M))
            tok = jnp.argmax(logits[0, 0]).astype(jnp.int32)
            return kv_k, kv_v, tok, i + 1

        st = jax.lax.while_loop(lambda st: st[3] < K, body,
                                (kv_k, kv_v, jnp.int32(5), jnp.int32(0)))
        return st[0], st[1], st[2]

    # --- (b) forward + greedy accept bookkeeping + history update ---------
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def loop_fwd_accept(params, kv_k, kv_v, history, hist_len):
        def body(st):
            kv_k, kv_v, history, hist_len, tok, i = st
            draft_tokens = jnp.full((M,), tok, jnp.int32)
            draft_len = jnp.int32(M)
            logits, kv_k, kv_v = fwd_block(params, kv_k, kv_v, draft_tokens,
                                           hist_len, draft_len)
            argmax_tok = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            in_draft = chain_pos < draft_len
            hit = (draft_tokens[1:] == argmax_tok[:-1]) & in_draft[1:]
            alen = jnp.cumprod(hit.astype(jnp.int32)).sum() + 1
            bonus = argmax_tok[alen - 1]
            history = jax.lax.dynamic_update_slice(history, draft_tokens,
                                                   (hist_len,))
            # keep hist_len fixed so K iterations see identical shapes/cost
            return kv_k, kv_v, history, hist_len, bonus, i + 1

        st = jax.lax.while_loop(lambda st: st[5] < K, body,
                                (kv_k, kv_v, history, hist_len,
                                 jnp.int32(5), jnp.int32(0)))
        return st[0], st[1], st[4]

    # --- (c) + retrieval (the full fused body minus the while plumbing) ---
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def loop_full(params, kv_k, kv_v, history, hist_len):
        def body(st):
            kv_k, kv_v, history, hist_len, tok, i = st
            match, use_dyn, draft_tokens, cont_avail = retrieve(
                history, hist_len, tok)
            n = jnp.minimum(fc.n_predicts + 1,
                            1 + (match.astype(jnp.float32)
                                 * fc.alpha).astype(jnp.int32))
            draft_len = jnp.where(match > 0,
                                  jnp.minimum(n, 1 + cont_avail),
                                  1).astype(jnp.int32)
            logits, kv_k, kv_v = fwd_block(
                params, kv_k, kv_v, jnp.maximum(draft_tokens, 0),
                hist_len, draft_len)
            argmax_tok = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            in_draft = chain_pos < draft_len
            hit = (draft_tokens[1:] == argmax_tok[:-1]) & in_draft[1:]
            alen = jnp.cumprod(hit.astype(jnp.int32)).sum() + 1
            bonus = argmax_tok[alen - 1]
            history = jax.lax.dynamic_update_slice(
                history, jnp.maximum(draft_tokens, 0), (hist_len,))
            return kv_k, kv_v, history, hist_len, bonus, i + 1

        st = jax.lax.while_loop(lambda st: st[5] < K, body,
                                (kv_k, kv_v, history, hist_len,
                                 jnp.int32(5), jnp.int32(0)))
        return st[0], st[1], st[4]

    # --- (d) retrieval only, K times ---------------------------------------
    @jax.jit
    def loop_retrieve(history, hist_len):
        def body(st):
            tok, i = st
            match, use_dyn, draft_tokens, cont_avail = retrieve(
                history, hist_len, tok)
            return draft_tokens[1] + match, i + 1

        st = jax.lax.while_loop(lambda st: st[1] < K, body,
                                (jnp.int32(5), jnp.int32(0)))
        return st[0]

    # --- (e) lm_head ablation: forward but argmax pre-head hidden ----------
    # (XLA dead-code-eliminates the head matmul when only `hidden` is
    # consumed, so loop_forward - loop_nohead = the head's per-step cost)
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def loop_nohead(params, kv_k, kv_v, history, hist_len):
        def body(st):
            kv_k, kv_v, tok, i = st
            tokens = jnp.full((M,), tok, jnp.int32)
            s = jnp.arange(Wc)[None, None, :]
            mask = block_decode_mask(tri, hist_len, Wc)
            mask = mask | (s == (hist_len + chain_pos)[None, :, None])
            _, hidden, kv_k, kv_v = forward(
                params, cfg, tokens[None], chain_pos[None, :] + hist_len,
                kv_k, kv_v, hist_len, mask)
            tok = (jnp.argmax(hidden[0, 0, :64]) + 3).astype(jnp.int32)
            return kv_k, kv_v, tok, i + 1

        st = jax.lax.while_loop(lambda st: st[3] < K, body,
                                (kv_k, kv_v, jnp.int32(5), jnp.int32(0)))
        return st[0], st[1], st[2]

    def timed(fn, *fetch_args, label=""):
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            # force a real fetch (block_until_ready is a no-op via tunnel)
            np.asarray(out[:1] if out.ndim else out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per = 1000 * best / K
        print(f"{label:34s} {per:7.3f} ms/step   ({best*1000:.1f} ms / {K})")
        return per

    # warm up each program once (compile), then time
    def run(name, jit_fn, nargs):
        nonlocal kv_k, kv_v
        if nargs == 5:
            out = jit_fn(params, kv_k, kv_v, history0, hist_len0)
            kv_k, kv_v = out[0], out[1]
            tok = out[2]
            np.asarray(tok)
            def call():
                nonlocal kv_k, kv_v
                out = jit_fn(params, kv_k, kv_v, history0, hist_len0)
                kv_k, kv_v = out[0], out[1]
                return out[2]
            return timed(call, label=name)
        else:
            tok = jit_fn(history0, hist_len0)
            np.asarray(tok)
            return timed(lambda: jit_fn(history0, hist_len0), label=name)

    print(f"config: S={S} M={M} K={K} int8={args.int8}")
    t_r = run("retrieval only", loop_retrieve, 2)
    t_f = run("forward only", loop_forward, 5)
    t_nh = run("forward minus lm_head (DCE'd)", loop_nohead, 5)
    t_fa = run("forward + accept + commit", loop_fwd_accept, 5)
    t_full = run("full body (retrieve+fwd+accept)", loop_full, 5)
    print(f"\nderived: lm_head = {t_f - t_nh:.3f} ms, "
          f"accept/commit = {t_fa - t_f:.3f} ms, "
          f"retrieval-in-body = {t_full - t_fa:.3f} ms "
          f"(standalone {t_r:.3f}), forward = {t_f:.3f} ms")


if __name__ == "__main__":
    main()
