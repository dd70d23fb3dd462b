#!/usr/bin/env python
"""Decompose the batched-hybrid (B=8) step time on the real TPU.

The int8 B=8 chain engine steps in ~24 ms; the hybrid in ~34 ms.  This
times K-iteration fori_loops of successively larger slices of the hybrid
body (profile_step.py methodology: block on a 1-element fetch):

  fwd        forward over the packed block only (chain mask)
  +accept    + vmapped tree unpack/masks/greedy accept
  +draft     + both drafters (retrieval scan + tree fill)
  +compact   + vmapped KV gather-compaction
  +harvest   + approx_max_k + table scatters (the full body)

Usage: PYTHONPATH=/root/repo python scripts/profile_batched_hybrid.py [--int8]
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.fused_base import harvest_topk, make_retrieval_draft
    from samd_tpu.fused_hybrid import (FusedHybridConfig, build_tr_topology,
                                       make_tr_draft)
    from samd_tpu.models import init_params, llama_1b
    from samd_tpu.models.llama import block_decode_mask, forward
    from samd_tpu.ops.treeops import unpack_draft
    from samd_tpu.verify import greedy_accept

    cfg = llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.int8:
        from samd_tpu.ops.quant import quantize_llama_params
        params = quantize_llama_params(params)

    B, S, K = args.b, args.s, args.steps
    hc = FusedHybridConfig()
    M = hc.max_block
    V = cfg.vocab_size
    tr_parents, tr_depths, _, tr_rank = build_tr_topology(hc.tree_nodes,
                                                          hc.topk)
    tr_draft = make_tr_draft(tr_parents, tr_depths, tr_rank, M)
    rng = np.random.default_rng(0)
    corpus, corpus_len = (jnp.asarray(
        rng.integers(3, V, size=hc.corpus_capacity), jnp.int32),
        jnp.int32(hc.corpus_capacity))
    retrieve = make_retrieval_draft(
        S=S, corpus=corpus, corpus_len=corpus_len, max_ngram=hc.max_ngram,
        ext=hc.ext, len_bias=hc.len_bias, block=M)
    chain_parents = jnp.concatenate([
        jnp.arange(-1, hc.n_predicts - 1, dtype=jnp.int32),
        jnp.arange(hc.n_predicts, M, dtype=jnp.int32)])
    tree_parents_packed = jnp.concatenate([
        jnp.asarray(tr_parents),
        jnp.arange(len(tr_parents), M, dtype=jnp.int32)])
    tri = jnp.tril(jnp.ones((M, M), bool))
    HIST = 128
    histories0 = jnp.asarray(rng.integers(3, V, size=(B, S)), jnp.int32)
    harvests0 = jnp.asarray(rng.integers(3, V, size=(B, V + 1, hc.topk)),
                            jnp.int32)
    seens0 = jnp.ones((B, V + 1), bool)
    static_draft = jnp.asarray(rng.integers(3, V, size=(B, M)), jnp.int32)

    def retrieval_draft(history, hist_len, start):
        match, _, raw, cont_avail = retrieve(history, hist_len, start)
        avail = jnp.minimum(cont_avail, hc.n_predicts - 1)
        keep = jnp.arange(M - 1) < avail
        tokens = jnp.concatenate([raw[:1],
                                  jnp.where(keep, raw[1:], -1)]
                                 ).astype(jnp.int32)
        return match, jnp.where(jnp.arange(M) < hc.n_predicts, tokens, -1)

    def make_loop(level):
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def loop(params, kv_k, kv_v, harvests, seens, histories):
            hist_lens = jnp.full((B,), HIST, jnp.int32)
            starts = histories[:, HIST - 1]

            def body(i, st):
                kv_k, kv_v, harvests, seens, acc = st
                if level >= 2:   # both drafters
                    matches, chain_tokens = jax.vmap(retrieval_draft)(
                        histories, hist_lens, starts)
                    use_sam = matches >= hc.len_threshold
                    tree_tokens = jax.vmap(tr_draft)(harvests, seens, starts)
                    draft_tokens = jnp.where(use_sam[:, None], chain_tokens,
                                             tree_tokens)
                    parents = jnp.where(use_sam[:, None],
                                        chain_parents[None],
                                        tree_parents_packed[None])
                else:
                    draft_tokens = static_draft
                    parents = jnp.broadcast_to(tree_parents_packed[None],
                                               (B, M))
                if level >= 1:   # tree unpack + accept
                    packed = jnp.stack([jnp.maximum(draft_tokens, 0),
                                        parents], axis=1)
                    toks, tree_mask, depths, paths = jax.vmap(
                        lambda d: unpack_draft(d, M))(packed)
                    masks = jax.vmap(
                        lambda tm, hl: block_decode_mask(tm, hl, S)[0]
                    )(tree_mask, hist_lens)
                    pos = depths + hist_lens[:, None]
                else:
                    toks = jnp.maximum(draft_tokens, 0)
                    masks = jax.vmap(
                        lambda hl: block_decode_mask(tri, hl, S)[0]
                    )(hist_lens)
                    pos = jnp.arange(M)[None] + hist_lens[:, None]
                logits, _, kv_k, kv_v = forward(
                    params, cfg, toks, pos, kv_k, kv_v, hist_lens, masks)
                if level >= 1:
                    res = jax.vmap(greedy_accept)(logits, draft_tokens,
                                                  paths)
                    path_nodes = res.path_nodes
                    out = res.next_token.astype(jnp.float32)
                else:
                    out = logits[:, -1, 0]
                    path_nodes = jnp.broadcast_to(jnp.arange(M)[None],
                                                  (B, M))
                if level >= 3:   # compaction
                    def compact(kv):
                        def one(kv_b, off, idx):
                            blk = jax.lax.dynamic_slice(
                                kv_b, (0, 0, off, 0),
                                (kv_b.shape[0], kv_b.shape[1], M,
                                 kv_b.shape[3]))
                            sel = jnp.take(blk, idx, axis=2)
                            return jax.lax.dynamic_update_slice(
                                kv_b, sel, (0, 0, off, 0))
                        return jax.vmap(one, in_axes=(1, 0, 0),
                                        out_axes=1)(kv, hist_lens,
                                                    path_nodes)
                    kv_k = compact(kv_k)
                    kv_v = compact(kv_v)
                if level >= 4:   # harvest
                    topk = harvest_topk(logits, hc.topk, True)
                    rows = jnp.where(draft_tokens >= 0, draft_tokens, V)
                    harvests = jax.vmap(lambda h, r, t: h.at[r].set(t))(
                        harvests, rows, topk)
                    seens = jax.vmap(
                        lambda s, r: s.at[r].set(True).at[V].set(False)
                    )(seens, rows)
                return kv_k, kv_v, harvests, seens, acc + out.sum()

            init = (kv_k, kv_v, harvests, seens, jnp.float32(0))
            return jax.lax.fori_loop(0, K, body, init)

        return loop

    labels = ["fwd", "+accept", "+draft", "+compact", "+harvest"]
    prev = None
    for level, label in enumerate(labels):
        loop = make_loop(level)
        kv_k, kv_v = init_kv_cache(cfg, B, S)
        out = loop(params, kv_k, kv_v, harvests0, seens0, histories0)
        np.asarray(out[4])
        best = 1e9
        for _ in range(args.repeats):
            kv_k, kv_v = init_kv_cache(cfg, B, S)
            t0 = time.perf_counter()
            out = loop(params, kv_k, kv_v, harvests0, seens0, histories0)
            np.asarray(out[4])
            best = min(best, time.perf_counter() - t0)
        ms = 1000 * best / K
        delta = "" if prev is None else f"  (+{ms - prev:.3f})"
        print(f"{label:9s} {ms:8.3f} ms/step{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
