"""Flash block-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.models.configs import ModelConfig
from samd_tpu.models.llama import _attention, block_decode_mask
from samd_tpu.ops.pallas_attention import flash_block_attention
from samd_tpu.sam.trees import ancestor_closure


def make_case(T, NH, KH, D, S, cache_len, seed=0):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, T, NH, D), jnp.float32)
    k = jax.random.normal(k2, (1, KH, S, D), jnp.float32)
    v = jax.random.normal(k3, (1, KH, S, D), jnp.float32)
    parents = np.full(T, -1, np.int32)
    r = np.random.default_rng(seed)
    for i in range(1, T):
        parents[i] = r.integers(0, i)
    tree = jnp.asarray(ancestor_closure(parents))
    mask = block_decode_mask(tree, jnp.int32(cache_len), S)
    return q, k, v, mask, cache_len + T


@pytest.mark.parametrize("T,NH,KH,D,S,cache_len", [
    (8, 4, 4, 16, 128, 40),     # MHA
    (8, 8, 2, 16, 128, 40),     # GQA G=4
    (16, 4, 2, 32, 256, 100),   # bigger
    (8, 4, 2, 16, 128, 120),    # kv_limit == S boundary
    (8, 8, 8, 16, 128, 40),     # KH>=8: block-major fold-KV kernel (7B-class)
    (16, 16, 8, 32, 256, 180),  # fold-KV, GQA, deeper prefix
])
def test_matches_xla(T, NH, KH, D, S, cache_len):
    q, k, v, mask, kv_limit = make_case(T, NH, KH, D, S, cache_len)
    cfg = ModelConfig(vocab_size=1, hidden_size=NH * D, intermediate_size=1,
                      num_layers=1, num_heads=NH, num_kv_heads=KH, head_dim=D,
                      dtype=jnp.float32)
    ref = _attention(q, k[0][None], v[0][None], mask, cfg)
    got = flash_block_attention(q, k, v, mask, jnp.int32(kv_limit),
                                block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dead_tail_not_required(monkeypatch):
    """Garbage beyond kv_limit must not affect the result.  (Finite poison:
    masked probabilities are exactly 0, and 0 * finite == 0; stale KV slots
    in the cache are always finite.)"""
    q, k, v, mask, kv_limit = make_case(8, 4, 4, 16, 128, 40, seed=1)
    got1 = flash_block_attention(q, k, v, mask, jnp.int32(kv_limit),
                                 block_s=64, interpret=True)
    k2 = k.at[:, :, kv_limit:, :].set(1e30)
    v2 = v.at[:, :, kv_limit:, :].set(-1e30)
    got2 = flash_block_attention(q, k2, v2, mask, jnp.int32(kv_limit),
                                 block_s=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))


def test_engine_with_flash_attention_equality():
    """Full engine with the flash kernel (interpret mode) must match the
    XLA-attention engine exactly in fp32."""
    import dataclasses

    import jax as _jax

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import SamdEngine
    from samd_tpu.models import init_params, tiny_config

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, _jax.random.PRNGKey(0), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=128)
    prompt = np.random.default_rng(0).integers(3, 128, size=16).tolist()

    outs = []
    for impl in ("xla", "flash_interpret"):
        mcfg = dataclasses.replace(cfg, attention_impl=impl)
        eng = SamdEngine(mcfg, params, samd_cfg,
                         make_drafter(samd_cfg, cfg.vocab_size),
                         max_cache_len=128, eos_token_id=-1,
                         prefill_buckets=(32,))
        outs.append(eng.generate(prompt, gen))
    assert outs[0].output_ids == outs[1].output_ids
    assert outs[0].accept_length_per_step == outs[1].accept_length_per_step
