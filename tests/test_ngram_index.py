"""n-gram hash index: exactness vs brute force, overflow bounds, end-to-end.

The index must return the same (longest, earliest-end) suffix match as the
O(corpus) windowed scan whenever its buckets don't overflow, and a *true*
(verified) match of possibly shorter length when they do.  Scale target:
reference-size corpora (millions of tokens,
/root/reference/tools/gen_sam_alpaca.py:19-44)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from samd_tpu.ops.ngram_index import (  # noqa: E402
    NgramIndex,
    build_ngram_index,
    indexed_suffix_match,
)

Q, EXT = 8, 56
W = Q + EXT


def brute_force_match(corpus, win):
    """Longest (earliest-end) match: corpus[e-j] == win[j] for j < run."""
    best_len, best_end = 0, 0
    for e in range(len(corpus)):
        run = 0
        while (run < len(win) and win[run] >= 0 and e - run >= 0
               and corpus[e - run] == win[run]):
            run += 1
        if run > best_len:
            best_len, best_end = run, e
    return best_len, best_end


def query_arrays(history, start):
    """Build (query[Q], tail[EXT], tail_len, win) from a history list."""
    hist = list(history)
    q = [-1] * Q
    q[-1] = start
    for j in range(min(Q - 1, len(hist))):
        q[Q - 2 - j] = hist[len(hist) - 1 - j]
    pre = hist[:max(0, len(hist) - (Q - 1))]
    tail = [-1] * EXT
    for j in range(min(EXT, len(pre))):
        tail[EXT - 1 - j] = pre[len(pre) - 1 - j]
    tail_len = min(EXT, len(pre))
    win = [start] + hist[::-1]
    win = win[:W] + [-1] * max(0, W - len(win))
    return (np.asarray(q, np.int32), np.asarray(tail, np.int32), tail_len,
            win)


def run_indexed(corpus, index, history, start):
    q, tail, tail_len, _ = query_arrays(history, start)
    m, e = indexed_suffix_match(
        jnp.asarray(corpus), jnp.int32(len(corpus)), index,
        jnp.asarray(q), jnp.asarray(tail), jnp.int32(tail_len),
        max_ngram=Q, ext=EXT)
    return int(m), int(e)


def test_build_shapes():
    corpus = np.arange(100, dtype=np.int32) % 7
    idx = build_ngram_index(corpus, grams=(8, 4, 2, 1), bucket_cap=4)
    assert isinstance(idx, NgramIndex)
    assert idx.grams == (8, 4, 2, 1)
    assert len(idx.tables) == 4
    for t in idx.tables:
        assert t.shape[1] == 4


def test_exact_vs_brute_force_random():
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 12, size=400).astype(np.int32)
    # huge cap => no overflow => exact
    idx = build_ngram_index(corpus, grams=(8, 4, 2, 1), bucket_cap=512)
    for trial in range(30):
        hlen = int(rng.integers(0, 40))
        # half the trials replay a random corpus slice so long matches exist
        if trial % 2 == 0 and hlen > 0:
            s = int(rng.integers(0, len(corpus) - hlen))
            history = corpus[s:s + hlen].tolist()
            start = int(corpus[s + hlen]) if s + hlen < len(corpus) else 0
        else:
            history = rng.integers(0, 12, size=hlen).tolist()
            start = int(rng.integers(0, 12))
        _, _, _, win = query_arrays(history, start)
        bf_len, bf_end = brute_force_match(corpus, win)
        m, e = run_indexed(corpus, idx, history, start)
        assert m == min(bf_len, W), (trial, m, bf_len)
        if m > 0:
            assert e == bf_end, (trial, e, bf_end)


def test_overflow_returns_true_shorter_match():
    # all-same-token corpus: every bucket overflows at cap=1
    corpus = np.zeros(200, np.int32)
    idx = build_ngram_index(corpus, grams=(8, 4, 2, 1), bucket_cap=1)
    history = [0] * 30
    m, e = run_indexed(corpus, idx, history, 0)
    # must be a true match: corpus[e - j] == win[j] for j < m
    assert m > 0
    for j in range(m):
        assert e - j >= 0 and corpus[e - j] == 0
    # exact answer is min(31, W) at end position 30; cap=1 keeps the earliest
    # position per bucket, so the match saturates at the stored prefix
    assert m <= min(31, W)


def test_no_match():
    corpus = np.arange(50, dtype=np.int32)
    idx = build_ngram_index(corpus, bucket_cap=8)
    m, e = run_indexed(corpus, idx, [1000, 1001], 999)
    assert m == 0


def test_single_token_match_earliest():
    corpus = np.asarray([5, 1, 5, 2, 5], np.int32)
    idx = build_ngram_index(corpus, bucket_cap=8)
    m, e = run_indexed(corpus, idx, [], 5)
    assert m == 1 and e == 0


def test_engine_equivalence_indexed_vs_scan():
    """Same corpus, no overflow: the indexed engine must take the same drafts
    (same steps, same outputs) as the brute-force scan engine."""
    from samd_tpu.config import GenerationConfig
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params, tiny_config

    cfg = tiny_config(vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.5)
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    prompt = list(np.random.default_rng(3).integers(2, 64, size=24))

    probe = FusedSamEngine(cfg, params,
                           FusedSamConfig(steps_per_call=8,
                                          corpus_capacity=1024),
                           max_cache_len=256, eos_token_id=-1,
                           prefill_buckets=(32,))
    corpus = probe.generate(prompt, gen).output_ids + [0]

    outs = {}
    for indexed in (False, True):
        fs = FusedSamEngine(
            cfg, params,
            FusedSamConfig(steps_per_call=8, corpus_capacity=1024,
                           indexed=indexed, index_bucket_cap=64),
            corpus=corpus, max_cache_len=256, eos_token_id=-1,
            prefill_buckets=(32,))
        out = fs.generate(prompt, gen)
        outs[indexed] = out
    assert outs[True].output_ids == outs[False].output_ids
    assert outs[True].decode_steps == outs[False].decode_steps


def test_large_corpus_build_fast():
    """Index build stays host-side-cheap at reference scale (vectorized)."""
    import time

    rng = np.random.default_rng(1)
    corpus = rng.integers(0, 32000, size=1_000_000).astype(np.int32)
    t0 = time.perf_counter()
    idx = build_ngram_index(corpus, grams=(8, 4, 2, 1), bucket_cap=8)
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"index build too slow: {dt:.1f}s"
    # probe a replayed slice: must find a full-window match
    s = 500_000
    history = corpus[s:s + 40].tolist()
    start = int(corpus[s + 40])
    m, e = run_indexed(corpus, idx, history, start)
    assert m >= Q
    assert e == s + 40 or corpus[e] == start


def test_engine_serves_1m_token_corpus():
    """VERDICT r01 item 3 'done' bar: the fused engine serves a >=1M-token
    corpus through the index (O(bucket) probes; the O(corpus) windowed scan
    would be hopeless) and still retrieves corpus continuations."""
    from samd_tpu.config import GenerationConfig
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params, tiny_config

    cfg = tiny_config(vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.5)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    prompt = list(np.random.default_rng(3).integers(2, 64, size=24))

    probe = FusedSamEngine(cfg, params,
                           FusedSamConfig(steps_per_call=8,
                                          corpus_capacity=1024),
                           max_cache_len=256, eos_token_id=-1,
                           prefill_buckets=(32,))
    traj = probe.generate(prompt, gen)
    # 1M-token corpus: noise + the model's own trajectory embedded
    rng = np.random.default_rng(9)
    big = rng.integers(0, 64, size=1 << 20).astype(np.int32)
    emb_at = 700_000
    doc = np.asarray(traj.output_ids + [0], np.int32)
    big[emb_at:emb_at + len(doc)] = doc

    fs = FusedSamEngine(
        cfg, params,
        FusedSamConfig(steps_per_call=8, corpus_capacity=1 << 20,
                       indexed=True, index_bucket_cap=8),
        corpus=big.tolist(), max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(32,))
    out = fs.generate(prompt, gen)
    # losslessness: same trajectory as the no-corpus probe (greedy)
    assert out.output_ids == traj.output_ids
    # the corpus must actually help: fewer verify steps than token count
    assert out.decode_steps < out.decode_tokens


def test_retrieval_partial_does_not_inline_corpus_into_module():
    """Engines pass corpus+index into their fused jits as Partial ARGS:
    the closure form inlines them into the lowered module as dense
    literals (a 1M-token indexed corpus inlined ~132 MB and blew the
    tunnel's remote-compile body limit with HTTP 413 — r05).  Pin both
    directions: the arg form lowers to a small module, the closure form
    demonstrably does not."""
    import jax
    import jax.numpy as jnp

    from samd_tpu.fused_base import (load_corpus_buffer,
                                     make_retrieval_draft,
                                     make_retrieval_partial)
    from samd_tpu.ops.ngram_index import build_ngram_index

    N = 1 << 17
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 100, size=N).astype(np.int32)
    corpus, clen = load_corpus_buffer(tokens.tolist(), N)
    index = build_ngram_index(tokens, grams=(8, 4, 2), bucket_cap=4)
    S = 64
    kw = dict(S=S, corpus=corpus, corpus_len=clen, max_ngram=8, ext=8,
              len_bias=0, block=8, corpus_index=index)
    hist = jnp.zeros((S,), jnp.int32)
    args = (hist, jnp.int32(4), jnp.int32(5))

    partial = make_retrieval_partial(**kw)
    arg_txt = jax.jit(lambda r, h, l, s: r(h, l, s)).lower(
        partial, *args).as_text()
    assert len(arg_txt) < 300_000, len(arg_txt)

    closure = make_retrieval_draft(**kw)
    closure_txt = jax.jit(closure).lower(*args).as_text()
    assert len(closure_txt) > 2_000_000, len(closure_txt)

    # and the two forms compute the same draft
    a = [np.asarray(x) for x in closure(*args)]
    b = [np.asarray(x) for x in jax.jit(
        lambda r, h, l, s: r(h, l, s))(partial, *args)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
