"""Inline prefill (BatchedFusedSamEngine(inline_prefill=True)): the prompt
streams through the fused decode loop as a forced-accept chain — zero
blocking fetch at admission, no dedicated prefill program.

fp32-exact tiny config: outputs must equal the one-shot-prefill engine's."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig
from samd_tpu.fused_sam import (
    BatchedFusedSamEngine,
    FusedSamConfig,
    FusedSamEngine,
)
from samd_tpu.models import init_params, tiny_config

FSCFG = FusedSamConfig(n_predicts=15, steps_per_call=6, corpus_capacity=256)
GEN = GenerationConfig(max_new_tokens=24, max_cache_len=256)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def _prompts(n, seed=7, longest=40):
    rng = np.random.default_rng(seed)
    # mix of shorter-than-block, block-boundary and multi-block prompts
    sizes = [5, 16, 17, 33, longest][:n]
    return [rng.integers(3, 128, size=s).tolist() for s in sizes]


def test_inline_prefill_matches_one_shot(tiny_model):
    cfg, params = tiny_model
    prompts = _prompts(5)

    oneshot = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                    max_cache_len=256, eos_token_id=-1,
                                    prefill_buckets=(64,))
    ids_a = [oneshot.add_request(p, GEN) for p in prompts]
    expected = oneshot.run()

    inline = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                   max_cache_len=256, eos_token_id=-1,
                                   prefill_buckets=(64,),
                                   inline_prefill=True)
    ids_b = [inline.add_request(p, GEN) for p in prompts]
    results = inline.run()
    for ra, rb, p in zip(ids_a, ids_b, prompts):
        assert results[rb].output_ids == expected[ra].output_ids, \
            f"prompt len {len(p)}"
        assert results[rb].decode_tokens == expected[ra].decode_tokens
        # prefill segments must not count as decode steps
        assert results[rb].decode_steps <= expected[ra].decode_steps + 1


def test_inline_prefill_matches_single_stream_with_corpus(tiny_model):
    cfg, params = tiny_model
    prompts = _prompts(3, seed=11)
    corpus = sum([p + [0] for p in prompts], [])

    single = FusedSamEngine(cfg, params, FSCFG, corpus=corpus,
                            max_cache_len=256, eos_token_id=-1,
                            prefill_buckets=(64,))
    refs = [single.generate(p, GEN).output_ids for p in prompts]

    inline = BatchedFusedSamEngine(cfg, params, FSCFG, corpus=corpus,
                                   batch_size=3, max_cache_len=256,
                                   eos_token_id=-1, prefill_buckets=(64,),
                                   inline_prefill=True)
    rids = [inline.add_request(p, GEN) for p in prompts]
    outs = inline.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid].output_ids == ref


def test_inline_prefill_eos_and_readmission(tiny_model):
    """EOS inside the prompt must NOT stop prefill; EOS generated after the
    prompt stops normally.  5 requests through 2 slots re-admit cleanly."""
    cfg, params = tiny_model
    prompts = _prompts(5, seed=13)
    eos = 7
    prompts[0][2] = eos  # eos token inside a prompt

    oneshot = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                    max_cache_len=256, eos_token_id=eos,
                                    prefill_buckets=(64,))
    ids_a = [oneshot.add_request(p, GEN) for p in prompts]
    expected = oneshot.run()

    inline = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                   max_cache_len=256, eos_token_id=eos,
                                   prefill_buckets=(64,),
                                   inline_prefill=True)
    ids_b = [inline.add_request(p, GEN) for p in prompts]
    results = inline.run()
    for ra, rb in zip(ids_a, ids_b):
        assert results[rb].output_ids == expected[ra].output_ids


def test_inline_prefill_sampling_falls_back(tiny_model):
    """Sampling requests use the classic one-shot prefill path (the first
    token draw needs the boundary logits); outputs stay deterministic."""
    cfg, params = tiny_model
    gen_s = GenerationConfig(max_new_tokens=12, max_cache_len=256,
                             greedy=False, temperature=0.8, seed=5)
    p = _prompts(1, seed=17)[0]

    def run(inline):
        eng = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                    max_cache_len=256, eos_token_id=-1,
                                    prefill_buckets=(64,),
                                    inline_prefill=inline)
        rid = eng.add_request(p, gen_s)
        return eng.run()[rid].output_ids

    assert run(True) == run(False)


def test_inline_prefill_paged_matches_dense(tiny_model):
    """Paged engine with inline prefill: pages grow through the ordinary
    per-segment pre-allocation (no scatter-prefill program); outputs equal
    the dense one-shot engine's, all pages returned."""
    from samd_tpu.fused_sam import PagedBatchedFusedSamEngine

    cfg, params = tiny_model
    prompts = _prompts(5, seed=23)

    oneshot = BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                    max_cache_len=256, eos_token_id=-1,
                                    prefill_buckets=(64,))
    ids_a = [oneshot.add_request(p, GEN) for p in prompts]
    expected = oneshot.run()

    paged = PagedBatchedFusedSamEngine(
        cfg, params, FSCFG, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(64,), n_pages=32, page_size=16,
        inline_prefill=True)
    ids_p = [paged.add_request(p, GEN) for p in prompts]
    results = paged.run()
    for ra, rp in zip(ids_a, ids_p):
        assert results[rp].output_ids == expected[ra].output_ids
    assert len(paged.pool._free) == 32


def test_inline_prefill_hybrid_matches_one_shot(tiny_model):
    """SAM[Token Recycle] hybrid with inline prefill: the per-block harvest
    covers the prompt rows exactly as the one-shot prefill scatter does, so
    outputs AND subsequent tree drafts match the one-shot engine's."""
    from samd_tpu.fused_hybrid import (
        BatchedFusedHybridEngine,
        FusedHybridConfig,
        PagedBatchedFusedHybridEngine,
    )

    cfg, params = tiny_model
    hy = FusedHybridConfig(max_ngram=4, ext=12, n_predicts=8,
                           len_threshold=2, len_bias=0, tree_nodes=13,
                           topk=4, max_block=16, corpus_capacity=1024,
                           steps_per_call=4)
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    prompts = _prompts(5, seed=29)

    oneshot = BatchedFusedHybridEngine(cfg, params, hy, batch_size=2,
                                       max_cache_len=256, eos_token_id=-1,
                                       prefill_buckets=(64,))
    ids_a = [oneshot.add_request(p, gen) for p in prompts]
    expected = oneshot.run()

    inline = BatchedFusedHybridEngine(cfg, params, hy, batch_size=2,
                                      max_cache_len=256, eos_token_id=-1,
                                      prefill_buckets=(64,),
                                      inline_prefill=True)
    ids_b = [inline.add_request(p, gen) for p in prompts]
    results = inline.run()
    for ra, rb, p in zip(ids_a, ids_b, prompts):
        assert results[rb].output_ids == expected[ra].output_ids, \
            f"prompt len {len(p)}"

    paged = PagedBatchedFusedHybridEngine(
        cfg, params, hy, batch_size=2, max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(64,), n_pages=32, page_size=16,
        inline_prefill=True)
    ids_p = [paged.add_request(p, gen) for p in prompts]
    results_p = paged.run()
    for ra, rp in zip(ids_a, ids_p):
        assert results_p[rp].output_ids == expected[ra].output_ids
    assert len(paged.pool._free) == 32
