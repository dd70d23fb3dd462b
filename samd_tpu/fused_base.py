"""Shared pieces of the fused device-resident engines."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused_sam import suffix_match


def make_retrieval_draft(*, S: int, corpus: jax.Array, corpus_len: jax.Array,
                         max_ngram: int, ext: int, len_bias: int,
                         block: int, corpus_index=None):
    """Build the shared history+corpus longest-suffix retrieval drafter.

    Returns ``draft(history, hist_len, start) -> (match, use_dyn, tokens
    [block], cont_avail)`` where ``tokens[0] == start`` and positions beyond
    the available continuation carry the raw (unclipped) gather — callers
    apply their own length policy (adaptive alpha, fixed n_predicts, ...).

    ``corpus_index`` (an ops.ngram_index.NgramIndex) switches the corpus
    search from the O(corpus) windowed scan to an O(bucket) index probe —
    required at reference corpus scale (millions of tokens).

    NOTE: the returned closure CAPTURES the corpus/index arrays, which a
    jitted caller inlines into its lowered module as dense literals — fine
    for profiling scripts, fatal at 1M-token scale through the tunnel's
    remote-compile body limit.  Engines use ``make_retrieval_partial``
    instead and pass the Partial through their fused jit as an argument."""
    fn = _retrieval_draft_argform(S=S, max_ngram=max_ngram, ext=ext,
                                  len_bias=len_bias, block=block)

    def draft(history, hist_len, start):
        return fn(corpus, corpus_len, corpus_index, history, hist_len,
                  start)

    return draft


def make_retrieval_partial(*, S: int, corpus: jax.Array,
                           corpus_len: jax.Array, max_ngram: int, ext: int,
                           len_bias: int, block: int, corpus_index=None):
    """``jax.tree_util.Partial`` form of ``make_retrieval_draft``: the
    corpus buffer + n-gram index bind as PYTREE children, so passing the
    Partial through a jitted fused function traces them as runtime
    ARGUMENTS instead of baking them into the lowered module (a
    closure-captured 1M-token indexed corpus inlined ~132 MB of dense
    literals and blew the tunnel's remote-compile request limit with
    HTTP 413 — r05).  Call signature of the Partial is identical to the
    closure form: ``retrieve(history, hist_len, start)``."""
    fn = _retrieval_draft_argform(S=S, max_ngram=max_ngram, ext=ext,
                                  len_bias=len_bias, block=block)
    return jax.tree_util.Partial(fn, corpus, corpus_len, corpus_index)


def _retrieval_draft_argform(*, S: int, max_ngram: int, ext: int,
                             len_bias: int, block: int):
    Q = max_ngram
    M = block

    def draft(corpus, corpus_len, corpus_index, history, hist_len, start):
        qidx = hist_len - (Q - 1) + jnp.arange(Q - 1)
        query = jnp.where(qidx >= 0, history[jnp.clip(qidx, 0, S - 1)], -1)
        query = jnp.concatenate([query, start[None]])
        tidx = hist_len - (Q - 1) - ext + jnp.arange(ext)
        tail = jnp.where(tidx >= 0, history[jnp.clip(tidx, 0, S - 1)], -1)
        tail_len = jnp.clip(hist_len - (Q - 1), 0, ext)
        m_dyn, e_dyn = suffix_match(history, hist_len, query, tail,
                                    tail_len, max_ngram=Q, ext=ext)
        if corpus_index is not None:
            from .ops.ngram_index import indexed_suffix_match

            m_cor, e_cor = indexed_suffix_match(
                corpus, corpus_len, corpus_index, query, tail, tail_len,
                max_ngram=Q, ext=ext)
        else:
            m_cor, e_cor = suffix_match(corpus, corpus_len, query, tail,
                                        tail_len, max_ngram=Q, ext=ext)
        m_cor_adj = m_cor - len_bias
        use_dyn = m_dyn >= m_cor_adj
        match = jnp.maximum(m_dyn, m_cor_adj)
        src = jnp.where(use_dyn, e_dyn, e_cor)
        src_len = jnp.where(use_dyn, hist_len, corpus_len)
        cidx = src + 1 + jnp.arange(M - 1)
        cont = jnp.where(use_dyn,
                         history[jnp.clip(cidx, 0, S - 1)],
                         corpus[jnp.clip(cidx, 0, corpus.shape[0] - 1)])
        cont_avail = jnp.clip(src_len - (src + 1), 0, M - 1)
        tokens = jnp.concatenate([start[None], cont]).astype(jnp.int32)
        return match, use_dyn, tokens, cont_avail

    return draft


def build_optional_index(corpus, cfg):
    """NgramIndex for an ``indexed`` fused config; None when disabled/empty."""
    if not getattr(cfg, "indexed", False) or corpus is None \
            or len(corpus) == 0:
        return None
    from .ops.ngram_index import build_ngram_index

    window = cfg.max_ngram + cfg.ext
    grams = tuple(g for g in cfg.index_grams if g <= window)
    return build_ngram_index(
        np.asarray(corpus[:cfg.corpus_capacity], np.int32),
        grams=grams, bucket_cap=cfg.index_bucket_cap,
        keep_latest=getattr(cfg, "index_keep_latest", 0))


def load_corpus_buffer(corpus, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Pack an optional token list into the fixed-capacity device buffer."""
    buf = np.full((capacity,), -1, np.int32)
    n = 0
    if corpus is not None and len(corpus) > 0:
        n = min(len(corpus), capacity)
        buf[:n] = np.asarray(corpus[:n], np.int32)
    return jnp.asarray(buf), jnp.int32(n)


def pack_ctrl(*scalars) -> jax.Array:
    """Pack a fused loop's per-call control scalars (hist_len, steps, done,
    ...) into one int32 vector inside the jit.

    Through the tunneled TPU every blocking host fetch costs ~10-35 ms;
    casting each returned scalar with ``int()`` separately made a
    steps_per_call segment pay 4+ round trips of pure latency. One packed
    vector = one transfer.
    """
    return jnp.stack([jnp.asarray(s).astype(jnp.int32) for s in scalars])


def finalize_generation(history: jax.Array, hist_len: int,
                        prompt_len: int, eos_token_id: int,
                        max_new_tokens: int) -> List[int]:
    """Fetch the committed history and apply the EOS/budget trim (shared
    tail of every fused engine's generate())."""
    out = np.asarray(history)[:hist_len].tolist()
    gen_part = out[prompt_len:]
    if eos_token_id in gen_part:
        gen_part = gen_part[:gen_part.index(eos_token_id) + 1]
    return out[:prompt_len] + gen_part[:max_new_tokens]


def init_history(input_ids: Sequence[int], S: int) -> jax.Array:
    history = jnp.zeros((S,), jnp.int32)
    return jax.lax.dynamic_update_slice(
        history, jnp.asarray(list(input_ids), jnp.int32), (0,))


def harvest_topk(logits, k: int, approx: bool):
    """Top-k token ids for the Token-Recycle harvest table.

    ``approx=True`` uses the TPU-optimized ``jax.lax.approx_max_k``
    (recall ~0.95): harvest ranking only shapes future DRAFTS — greedy
    losslessness is enforced by verification regardless — and the exact
    [rows, V] sort dominated the batched hybrid step (B·M = 512 rows over
    V=32k).  Exact ``lax.top_k`` remains for parity tests."""
    if approx:
        return jax.lax.approx_max_k(logits, k)[1].astype(jnp.int32)
    return jax.lax.top_k(logits, k)[1].astype(jnp.int32)
