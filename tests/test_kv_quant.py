"""INT8 KV cache (cache.QuantizedKV): forward fidelity + engine equality.

The per-token-per-head scale is computed when a block is WRITTEN, so a
cache slot's dequantized value never depends on block grouping — incremental
decode reproduces one full forward bitwise (in exact arithmetic), and the
greedy-equality invariant holds against an AR oracle sharing the flag.
"""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.cache import QuantizedKV, compact_accepted, init_kv_cache
from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.models import forward, init_params, prefill_mask, tiny_config
from samd_tpu.models.llama import block_decode_mask


@pytest.fixture(scope="module")
def qmodel():
    cfg = replace(tiny_config(vocab_size=128), kv_quant=True)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.3)
    return cfg, params


def test_quantized_forward_close_to_fp(qmodel):
    cfg, params = qmodel
    cfg_fp = replace(cfg, kv_quant=False)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, 17)), jnp.int32)
    S = 64
    pos = jnp.arange(17)[None, :]
    mask = prefill_mask(1, 17, S)
    ref, _, _, _ = forward(params, cfg_fp, tokens, pos,
                           *init_kv_cache(cfg_fp, 1, S), jnp.int32(0), mask)
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    assert isinstance(kv_k, QuantizedKV)
    got, _, kv_k, _ = forward(params, cfg, tokens, pos, kv_k, kv_v,
                              jnp.int32(0), mask)
    assert kv_k.q.dtype == jnp.int8
    # int8 per-token cache: logits track the fp forward to quant noise
    # (cache values themselves are <0.4% relative error; softmax/layers
    # amplify to a few % of the logit range)
    delta = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert delta < 0.06 * np.max(np.abs(np.asarray(ref)))


def test_incremental_decode_matches_full_forward(qmodel):
    """Block-grouping independence: prefill 5 + 1-token decodes reproduce
    the one-shot forward (same per-token scales either way)."""
    cfg, params = qmodel
    rng = np.random.default_rng(1)
    T, S = 12, 32
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, T)), jnp.int32)
    full, _, _, _ = forward(params, cfg, tokens, jnp.arange(T)[None, :],
                            *init_kv_cache(cfg, 1, S), jnp.int32(0),
                            prefill_mask(1, T, S))
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    P = 5
    lp, _, kv_k, kv_v = forward(params, cfg, tokens[:, :P],
                                jnp.arange(P)[None, :], kv_k, kv_v,
                                jnp.int32(0), prefill_mask(1, P, S))
    steps = [np.asarray(lp)[0, i] for i in range(P)]
    chain = jnp.ones((1, 1), bool)
    for i in range(P, T):
        m = block_decode_mask(chain, jnp.int32(i), S)
        li, _, kv_k, kv_v = forward(params, cfg, tokens[:, i:i + 1],
                                    jnp.array([[i]]), kv_k, kv_v,
                                    jnp.int32(i), m)
        steps.append(np.asarray(li)[0, 0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(full)[0],
                               rtol=2e-4, atol=2e-4)


def test_compact_quantized_kv(qmodel):
    cfg, _ = qmodel
    kv_k, _ = init_kv_cache(cfg, 1, 32)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.integers(-127, 128, kv_k.q.shape), jnp.int8)
    s = jnp.asarray(rng.random(kv_k.scale.shape), jnp.float32)
    kv = QuantizedKV(q, s)
    out = compact_accepted(kv, jnp.int32(4), jnp.asarray([2, 0, 1]), 4)
    assert isinstance(out, QuantizedKV)
    np.testing.assert_array_equal(np.asarray(out.q)[..., 4, :],
                                  np.asarray(q)[..., 6, :])
    np.testing.assert_array_equal(np.asarray(out.scale)[..., 4],
                                  np.asarray(s)[..., 6])


def test_fused_sam_kv_quant_lossless(qmodel):
    """Greedy equality: int8-KV fused engine == int8-KV block-AR oracle."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg, params = qmodel
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, params, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    p = np.random.default_rng(3).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_hybrid_kv_quant_lossless(qmodel):
    """Tree drafts + compaction through the QuantizedKV dispatch."""
    from samd_tpu.fused_hybrid import FusedHybridConfig, FusedHybridEngine

    cfg, params = qmodel
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    hy = FusedHybridConfig(max_ngram=4, ext=12, n_predicts=8,
                           len_threshold=2, len_bias=0, tree_nodes=13,
                           topk=4, max_block=16, corpus_capacity=1024)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=16)
    eng = FusedHybridEngine(cfg, params, hy, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    p = np.random.default_rng(4).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_host_engine_kv_quant_lossless(qmodel):
    from samd_tpu.config import SamdConfig
    from samd_tpu.drafters import make_drafter

    cfg, params = qmodel
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    scfg = SamdConfig(draft_source="sam_only", max_predicts=8)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = SamdEngine(cfg, params, scfg, make_drafter(scfg, cfg.vocab_size),
                     max_cache_len=256, eos_token_id=-1,
                     prefill_buckets=(32,))
    p = np.random.default_rng(5).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_kv_quant_halves_bytes(qmodel):
    cfg, _ = qmodel
    kv_k, _ = init_kv_cache(cfg, 1, 256)
    kv_fp, _ = init_kv_cache(replace(cfg, kv_quant=False,
                                     dtype=jnp.bfloat16), 1, 256)
    qbytes = kv_k.q.size + kv_k.scale.size * 4
    # tiny D=16 makes the fp32 scale overhead 25% of the int8 bytes; at
    # serving head_dim=64 it is 6% (0.53x of bf16)
    assert qbytes < 0.7 * kv_fp.size * 2

def test_flash_kernel_quantized_matches_xla(qmodel):
    """int8-KV flash kernel (ds layout, interpret mode) == the XLA
    dequant path on the same quantized cache."""
    from samd_tpu.models.llama import _attention
    from samd_tpu.ops.pallas_attention import flash_block_attention

    cfg, params = qmodel
    cfg_ds = replace(cfg, kv_layout="ds")
    rng = np.random.default_rng(6)
    KH, D, S, T, NH = cfg.num_kv_heads, cfg.head_dim, 64, 5, cfg.num_heads
    cache_len = 23
    kv_k, kv_v = init_kv_cache(cfg_ds, 1, S)
    q8 = jnp.asarray(rng.integers(-127, 128, kv_k.q.shape[1:]), jnp.int8)
    s8 = jnp.asarray(0.01 + rng.random(kv_k.scale.shape[1:]), jnp.float32)
    k = QuantizedKV(q8, s8)
    v = QuantizedKV(
        jnp.asarray(rng.integers(-127, 128, kv_k.q.shape[1:]), jnp.int8),
        jnp.asarray(0.01 + rng.random(kv_k.scale.shape[1:]), jnp.float32))
    q = jnp.asarray(rng.standard_normal((1, T, NH, D)), jnp.float32)
    tree = jnp.tril(jnp.ones((T, T), bool))
    mask = block_decode_mask(tree, jnp.int32(cache_len), S)
    ref = _attention(q, k, v, mask, cfg_ds)
    got = flash_block_attention(q, k, v, mask, jnp.int32(cache_len + T),
                                block_s=32, pre_transposed=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_sam_kv_quant_flash_lossless(qmodel):
    """End-to-end: ds + int8 KV + flash_interpret engine == its own
    matching AR oracle."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg, params = qmodel
    cfg_f = replace(cfg, kv_layout="ds", attention_impl="flash_interpret",
                    flash_block_s=32)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    ar = ArBaseline(cfg_f, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg_f, params, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    p = np.random.default_rng(7).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_batched_fused_sam_kv_quant_lossless(qmodel):
    """Batched slots over an int8 KV pool (update_slot admission): every
    greedy output equals the int8-KV block-AR oracle's."""
    from samd_tpu.fused_sam import BatchedFusedSamEngine, FusedSamConfig

    cfg, params = qmodel
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(3, 128, size=int(rng.integers(10, 20))).tolist()
               for _ in range(3)]
    refs = [ar.generate(p, gen).output_ids for p in prompts]
    eng = BatchedFusedSamEngine(
        cfg, params, FusedSamConfig(n_predicts=7, steps_per_call=4),
        batch_size=2, max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(32,))
    rids = [eng.add_request(p, gen) for p in prompts]
    outs = eng.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid].output_ids == ref


def test_batched_hybrid_kv_quant_lossless(qmodel):
    """Batched trees + int8-KV compaction (compact_accepted_batched)."""
    from samd_tpu.fused_hybrid import (BatchedFusedHybridEngine,
                                       FusedHybridConfig)

    cfg, params = qmodel
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    hy = FusedHybridConfig(max_ngram=4, ext=12, n_predicts=8,
                           len_threshold=2, len_bias=0, tree_nodes=13,
                           topk=4, max_block=16, corpus_capacity=1024,
                           steps_per_call=4)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=16)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(3, 128, size=int(rng.integers(10, 20))).tolist()
               for _ in range(3)]
    refs = [ar.generate(p, gen).output_ids for p in prompts]
    eng = BatchedFusedHybridEngine(cfg, params, hy, batch_size=2,
                                   max_cache_len=256, eos_token_id=-1,
                                   prefill_buckets=(32,))
    rids = [eng.add_request(p, gen) for p in prompts]
    outs = eng.run()
    for rid, ref in zip(rids, refs):
        assert outs[rid].output_ids == ref


def test_flash_foldkv_quantized_matches_xla():
    """int8-KV through the block-major fold-KV kernel (KH>=8, the 7B-class
    path: one [KH, 2, block] scale DMA + [KH, D, block] KV DMAs per
    block)."""
    from samd_tpu.models import tiny_config
    from samd_tpu.models.llama import _attention, block_decode_mask
    from samd_tpu.ops.pallas_attention import flash_block_attention

    cfg = replace(tiny_config(num_kv_heads=4), num_heads=8, num_kv_heads=8,
                  kv_quant=True, kv_layout="ds")
    rng = np.random.default_rng(9)
    KH, D, S, T, NH = 8, cfg.head_dim, 128, 5, 8
    cache_len = 37
    kv_k, _ = init_kv_cache(cfg, 1, S)
    def mk():
        return QuantizedKV(
            jnp.asarray(rng.integers(-127, 128, kv_k.q.shape[1:]), jnp.int8),
            jnp.asarray(0.01 + rng.random(kv_k.scale.shape[1:]),
                        jnp.float32))
    k, v = mk(), mk()
    q = jnp.asarray(rng.standard_normal((1, T, NH, D)), jnp.float32)
    tree = jnp.tril(jnp.ones((T, T), bool))
    mask = block_decode_mask(tree, jnp.int32(cache_len), S)
    ref = _attention(q, k, v, mask, cfg)
    got = flash_block_attention(q, k, v, mask, jnp.int32(cache_len + T),
                                block_s=512, pre_transposed=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
