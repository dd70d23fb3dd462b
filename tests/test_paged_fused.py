"""Paged batched FUSED engines: page-pool KV (bf16 + int8) must reproduce
the dense batched fused engines' outputs (round-2 verdict's top round-3
item — the peak-throughput path previously ran dense B×S_max KV).

Tiny config is fp32, so dense XLA attention and the paged flash kernel agree
to fp precision and the trajectories match exactly."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig
from samd_tpu.fused_sam import (
    BatchedFusedSamEngine,
    FusedSamConfig,
    PagedBatchedFusedSamEngine,
)
from samd_tpu.models import init_params, tiny_config

PAGE = 16


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def _prompts(n, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(3, 128, size=int(rng.integers(10, 24))).tolist()
            for _ in range(n)]


def _fscfg():
    return FusedSamConfig(n_predicts=15, steps_per_call=6,
                          corpus_capacity=256)


def test_paged_fused_sam_matches_dense(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    ps = _prompts(5)

    dense = BatchedFusedSamEngine(cfg, params, _fscfg(), batch_size=2,
                                  max_cache_len=256, eos_token_id=-1,
                                  prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedSamEngine(
        cfg, params, _fscfg(), batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=PAGE)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids
        assert results[rp].decode_tokens == expected[rd].decode_tokens
    # all pages recycled once every request finished
    assert len(paged.pool._free) == 32
    assert paged.live_kv_tokens() == 0


def test_paged_fused_sam_int8_pool_matches_dense_int8kv(tiny_model):
    """quantized_kv paged pool ≍ dense QuantizedKV cache: identical
    per-token quantization formula, so the int8 values agree bitwise and
    fp32 attention math keeps the trajectories equal."""
    from dataclasses import replace

    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    ps = _prompts(4, seed=11)

    dense = BatchedFusedSamEngine(
        replace(cfg, kv_quant=True), params, _fscfg(), batch_size=2,
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedSamEngine(
        cfg, params, _fscfg(), batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=PAGE,
        quantized_kv=True)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids


def test_paged_fused_sam_with_corpus_and_quant_weights(tiny_model):
    """INT8 weight-only params + corpus retrieval through the paged loop
    (the bench's peak configuration, now on pages)."""
    from samd_tpu.fused_sam import FusedSamEngine
    from samd_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny_model
    qparams = quantize_llama_params(params)
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    p = np.random.default_rng(6).integers(3, 128, size=20).tolist()
    probe = FusedSamEngine(cfg, qparams, _fscfg(), max_cache_len=256,
                           eos_token_id=-1, prefill_buckets=(32,))
    ref = probe.generate(p, gen)
    corpus = ref.output_ids + [0]

    paged = PagedBatchedFusedSamEngine(
        cfg, qparams, _fscfg(), corpus=corpus, batch_size=2,
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,),
        n_pages=32, page_size=PAGE)
    ids = [paged.add_request(p, gen) for _ in range(3)]
    results = paged.run()
    for rid in ids:
        assert results[rid].output_ids == ref.output_ids
        assert results[rid].decode_steps < ref.decode_steps or \
            results[rid].decode_steps <= 4


def test_paged_fused_sam_tight_pool_still_correct(tiny_model):
    """A pool too small for full segment pre-allocation shortens segments
    (per-slot capacity guards) but never corrupts outputs."""
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    ps = _prompts(3, seed=13)

    dense = BatchedFusedSamEngine(cfg, params, _fscfg(), batch_size=2,
                                  max_cache_len=256, eos_token_id=-1,
                                  prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    # 8 pages × 16 tokens = 128 pool tokens for 2 slots of up to ~48 live
    # tokens each + segment headroom — forces best-effort allocation
    paged = PagedBatchedFusedSamEngine(
        cfg, params, _fscfg(), batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=8, page_size=PAGE)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids


def test_paged_fused_hybrid_matches_dense(tiny_model):
    """Paged SAM[Token Recycle] (tree drafts → on-page compaction) must
    reproduce the dense batched hybrid's outputs, bf16 pool and int8 pool."""
    from dataclasses import replace

    from samd_tpu.fused_hybrid import (
        BatchedFusedHybridEngine,
        FusedHybridConfig,
        PagedBatchedFusedHybridEngine,
    )

    cfg, params = tiny_model
    hy_cfg = FusedHybridConfig(n_predicts=12, len_threshold=3,
                               tree_nodes=13, topk=4, steps_per_call=5,
                               corpus_capacity=256, max_block=16,
                               approx_harvest=False)
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    ps = _prompts(4, seed=21)

    dense = BatchedFusedHybridEngine(cfg, params, hy_cfg, batch_size=2,
                                     max_cache_len=256, eos_token_id=-1,
                                     prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedHybridEngine(
        cfg, params, hy_cfg, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=PAGE)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids
    assert len(paged.pool._free) == 32

    # int8 page pool vs dense QuantizedKV cache
    dense_q = BatchedFusedHybridEngine(
        replace(cfg, kv_quant=True), params, hy_cfg, batch_size=2,
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    ids_dq = [dense_q.add_request(p, gen) for p in ps]
    expected_q = dense_q.run()
    paged_q = PagedBatchedFusedHybridEngine(
        cfg, params, hy_cfg, batch_size=2, max_cache_len=256,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=32, page_size=PAGE,
        quantized_kv=True)
    ids_pq = [paged_q.add_request(p, gen) for p in ps]
    results_q = paged_q.run()
    for rd, rp in zip(ids_dq, ids_pq):
        assert results_q[rp].output_ids == expected_q[rd].output_ids


# ---------------------------------------------------------------------------
# packed-int4 weights through the batched + paged engines (VERDICT r4 #2/#4:
# int4 composed with the serving stories).  The forward's int4-kernel
# dispatch (models/llama.py) is batch-agnostic; these pin that the dense
# batched engine and the page-pool engine drive it to identical trajectories.
# ---------------------------------------------------------------------------

def _int4_cfg(**kw):
    """256-divisible contraction dims (the kernel's block constraint)."""
    from samd_tpu.models import ModelConfig

    return ModelConfig(vocab_size=512, hidden_size=256,
                       intermediate_size=512, num_layers=2, num_heads=4,
                       num_kv_heads=2, head_dim=64, dtype=jax.numpy.float32,
                       int4_impl="kernel_interpret", **kw)


@pytest.fixture(scope="module")
def int4_model():
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = _int4_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, quantize_llama_params(params, dtype=jax.numpy.int4)


def test_int4_kernel_paged_batched_fused_sam_matches_dense(int4_model):
    """Paged batched fused-sam on packed-int4 weights (Pallas kernel path)
    == dense batched fused-sam, bitwise per request."""
    cfg, q4 = int4_model
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=128)
    rng = np.random.default_rng(9)
    ps = [rng.integers(3, 512, size=int(rng.integers(10, 20))).tolist()
          for _ in range(3)]
    fscfg = FusedSamConfig(n_predicts=7, steps_per_call=6,
                           corpus_capacity=256)

    dense = BatchedFusedSamEngine(cfg, q4, fscfg, batch_size=2,
                                  max_cache_len=128, eos_token_id=-1,
                                  prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedSamEngine(
        cfg, q4, fscfg, batch_size=2, max_cache_len=128,
        eos_token_id=-1, prefill_buckets=(32,), n_pages=24, page_size=PAGE)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids
    assert len(paged.pool._free) == 24


def test_int4_kernel_paged_batched_hybrid_matches_dense(int4_model):
    """Paged batched SAM[Token Recycle] hybrid on packed-int4 weights ==
    dense batched hybrid (tree drafts + gather-compact on pages, int4
    kernel in the trunk)."""
    from samd_tpu.fused_hybrid import (BatchedFusedHybridEngine,
                                       FusedHybridConfig,
                                       PagedBatchedFusedHybridEngine)

    cfg, q4 = int4_model
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=128)
    rng = np.random.default_rng(13)
    ps = [rng.integers(3, 512, size=int(rng.integers(10, 18))).tolist()
          for _ in range(3)]
    hy_cfg = FusedHybridConfig(steps_per_call=4, tree_nodes=7,
                               n_predicts=6, max_block=8)

    dense = BatchedFusedHybridEngine(cfg, q4, hy_cfg, batch_size=2,
                                     max_cache_len=128, eos_token_id=-1,
                                     prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedHybridEngine(
        cfg, q4, hy_cfg, batch_size=2, max_cache_len=128, eos_token_id=-1,
        prefill_buckets=(32,), n_pages=24, page_size=PAGE)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids


def test_int4_kernel_paged_int8kv_pool_matches_dense_int8kv(int4_model):
    """int4 weights (Pallas kernel) × int8 KV pages — the bench's 7B
    production serving combination — matches the dense int4 engine with
    the dense int8 KV cache (identical per-token quantization formula)."""
    from dataclasses import replace

    cfg, q4 = int4_model
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=128)
    rng = np.random.default_rng(17)
    ps = [rng.integers(3, 512, size=int(rng.integers(10, 18))).tolist()
          for _ in range(3)]
    fscfg = FusedSamConfig(n_predicts=7, steps_per_call=6,
                           corpus_capacity=256)

    dense = BatchedFusedSamEngine(
        replace(cfg, kv_quant=True), q4, fscfg, batch_size=2,
        max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    ids_d = [dense.add_request(p, gen) for p in ps]
    expected = dense.run()

    paged = PagedBatchedFusedSamEngine(
        cfg, q4, fscfg, batch_size=2, max_cache_len=128, eos_token_id=-1,
        prefill_buckets=(32,), n_pages=24, page_size=PAGE,
        quantized_kv=True)
    ids_p = [paged.add_request(p, gen) for p in ps]
    results = paged.run()
    for rd, rp in zip(ids_d, ids_p):
        assert results[rp].output_ids == expected[rd].output_ids
