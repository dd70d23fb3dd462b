"""Fused device-resident Token-Recycle engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.models import init_params, tiny_config
from samd_tpu.token_recycle_fused import (
    FusedTokenRecycleConfig,
    FusedTokenRecycleEngine,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def test_fused_tr_equals_ar(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    tr = FusedTokenRecycleEngine(
        cfg, params, FusedTokenRecycleConfig(num_nodes=25, topk=4,
                                             steps_per_call=8),
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    rng = np.random.default_rng(0)
    for seed in range(3):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = tr.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens
        assert out.decode_steps <= ref.decode_steps


def test_fused_tr_accelerates_on_deterministic_stream(tiny_model):
    """Zero-weight model: argmax is always token 0; once 0 -> top-K is
    harvested, every tree path is a 0-chain and whole paths are accepted."""
    cfg, params = tiny_model
    zero_params = jax.tree.map(jnp.zeros_like, params)
    gen = GenerationConfig(max_new_tokens=40, max_cache_len=512)
    tr = FusedTokenRecycleEngine(
        cfg, zero_params, FusedTokenRecycleConfig(num_nodes=25, topk=4,
                                                  steps_per_call=8),
        max_cache_len=512, eos_token_id=-1, prefill_buckets=(64,))
    p = np.random.default_rng(1).integers(3, 128, size=24).tolist()
    out = tr.generate(p, gen)
    assert out.output_ids[len(p):] == [0] * 40
    assert out.decode_steps < 20, out.decode_steps


def test_fused_tr_eos(tiny_model):
    cfg, params = tiny_model
    probe = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                       prefill_buckets=(32,))
    rng = np.random.default_rng(2)
    p = rng.integers(3, 128, size=16).tolist()
    ref = probe.generate(p, GenerationConfig(max_new_tokens=12,
                                             max_cache_len=256))
    eos = ref.output_ids[len(p) + 5]
    tr = FusedTokenRecycleEngine(
        cfg, params, FusedTokenRecycleConfig(num_nodes=25, topk=4,
                                             steps_per_call=8),
        max_cache_len=256, eos_token_id=eos, prefill_buckets=(32,))
    out = tr.generate(p, GenerationConfig(max_new_tokens=40,
                                          max_cache_len=256))
    gen_part = out.output_ids[len(p):]
    assert eos in gen_part
    assert gen_part.index(eos) == len(gen_part) - 1
