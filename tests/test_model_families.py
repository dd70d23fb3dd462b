"""Qwen2 and Mixtral model families: HF numerical parity + engine equality.

The reference serves these targets through its vendored tree-mask modeling
files (SURVEY.md §2: modeling_qwen2_kv.py, modeling_mixtral_kv.py ×1199/1398
LoC each); here both are the SAME functional forward as Llama — Qwen2 adds
qkv biases, Mixtral swaps the MLP for a dense-computed top-k MoE — so every
engine (they only call models.forward) serves them unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.cache import init_kv_cache
from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.models import (
    forward,
    init_params,
    prefill_mask,
    tiny_moe_config,
    tiny_qwen2_config,
)
from samd_tpu.models.loader import convert_state_dict


# ----------------------------------------------------------------------
# HF numerical parity (fp32, CPU)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_qwen2():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=1000000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = tiny_qwen2_config()
    return model, cfg, convert_state_dict(model.state_dict(), cfg)


@pytest.fixture(scope="module")
def hf_mixtral():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = MixtralForCausalLM(hf_cfg).eval()
    cfg = tiny_moe_config()
    return model, cfg, convert_state_dict(model.state_dict(), cfg)


def _assert_prefill_matches_hf(model, cfg, params, seed):
    import torch

    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 17), dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    S = 64
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    logits, _, _, _ = forward(
        params, cfg, jnp.asarray(tokens, jnp.int32),
        jnp.arange(17)[None, :], kv_k, kv_v, jnp.int32(0),
        prefill_mask(1, 17, S))
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_qwen2_forward_matches_hf(hf_qwen2):
    _assert_prefill_matches_hf(*hf_qwen2, seed=0)


def test_mixtral_forward_matches_hf(hf_mixtral):
    _assert_prefill_matches_hf(*hf_mixtral, seed=1)


def test_from_hf_config_families():
    from samd_tpu.models import from_hf_config

    class _C:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, rms_norm_eps=1e-6,
                max_position_embeddings=512)
    q = from_hf_config(_C(model_type="qwen2", rope_theta=1e6, **base))
    assert q.attn_bias and q.num_experts == 0
    m = from_hf_config(_C(model_type="mixtral", num_local_experts=8,
                          num_experts_per_tok=2, **base))
    assert m.num_experts == 8 and not m.attn_bias
    ll = from_hf_config(_C(model_type="llama", **base))
    assert not ll.attn_bias and ll.num_experts == 0


# ----------------------------------------------------------------------
# Engines serve the new families unchanged (greedy equality vs block-AR)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("family", ["qwen2", "moe"])
def test_fused_sam_greedy_equality(family):
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg = tiny_qwen2_config() if family == "qwen2" else tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(3))
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, params, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    p = np.random.default_rng(4).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_moe_forward_quantized_close():
    """INT8 weight-only on the expert stacks (dequant einsum form) tracks
    the fp32 forward."""
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(5))
    qparams = quantize_llama_params(params)
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 9)),
                         jnp.int32)
    S = 32
    pos = jnp.arange(9)[None, :]
    mask = prefill_mask(1, 9, S)
    ref, _, _, _ = forward(params, cfg, tokens, pos,
                           *init_kv_cache(cfg, 1, S), jnp.int32(0), mask)
    got, _, _, _ = forward(qparams, cfg, tokens, pos,
                           *init_kv_cache(cfg, 1, S), jnp.int32(0), mask)
    # int8 per-channel weights: logits agree to quantization noise
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 0.15


# ----------------------------------------------------------------------
# Expert-parallel sharding (ep mesh axis)
# ----------------------------------------------------------------------

def test_moe_expert_parallel_matches_unsharded():
    from samd_tpu.parallel import make_mesh, shard_params
    from samd_tpu.parallel.sharding import check_shardable, kv_spec
    from jax.sharding import NamedSharding

    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    T, S = 11, 32
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, T)),
                         jnp.int32)
    pos = jnp.arange(T)[None, :]
    mask = prefill_mask(1, T, S)
    ref, _, _, _ = forward(params, cfg, tokens, pos,
                           *init_kv_cache(cfg, 1, S), jnp.int32(0), mask)

    mesh = make_mesh(8, ep=4)  # ep=4 × tp=2
    check_shardable(cfg, mesh)
    sharded = shard_params(params, mesh, cfg)
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    s = NamedSharding(mesh, kv_spec())
    kv_k, kv_v = jax.device_put(kv_k, s), jax.device_put(kv_v, s)
    got, _, _, _ = jax.jit(forward, static_argnums=1)(
        sharded, cfg, tokens, pos, kv_k, kv_v, jnp.int32(0), mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("family", ["qwen2", "moe"])
def test_hybrid_greedy_equality(family):
    """Tree drafts (Token-Recycle hybrid) through the family forwards."""
    from samd_tpu.fused_hybrid import FusedHybridConfig, FusedHybridEngine

    cfg = tiny_qwen2_config() if family == "qwen2" else tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(8))
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    hy = FusedHybridConfig(max_ngram=4, ext=12, n_predicts=8,
                           len_threshold=2, len_bias=0, tree_nodes=13,
                           topk=4, max_block=16, corpus_capacity=1024)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=16)
    eng = FusedHybridEngine(cfg, params, hy, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    p = np.random.default_rng(9).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids
