"""Transposed ("ds") KV-cache layout: [L, B, KH, D, S] — the flash kernel's
native layout (no per-layer transpose).  Greedy outputs must match the
default "sd" layout exactly on CPU fp32, through both the host engine and
the fused engine, and through the flash kernel in interpreter mode."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import SamdEngine
from samd_tpu.models import init_params, tiny_config

MAX_CACHE = 256


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def _run_engine(cfg, params, prompt):
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=12)
    eng = SamdEngine(cfg, params, samd_cfg,
                     make_drafter(samd_cfg, cfg.vocab_size),
                     max_cache_len=MAX_CACHE, eos_token_id=-1,
                     prefill_buckets=(32,))
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=MAX_CACHE)
    return eng.generate(prompt, gen)


def test_host_engine_ds_equals_sd(model):
    cfg, params = model
    prompt = np.random.default_rng(0).integers(3, 128, size=20).tolist()
    ref = _run_engine(cfg, params, prompt)
    out = _run_engine(replace(cfg, kv_layout="ds"), params, prompt)
    assert out.output_ids == ref.output_ids
    assert out.accept_length_per_step == ref.accept_length_per_step


def test_fused_sam_ds_equals_sd(model):
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg, params = model
    prompt = np.random.default_rng(1).integers(3, 128, size=20).tolist()
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=MAX_CACHE)
    outs = {}
    for layout in ("sd", "ds"):
        eng = FusedSamEngine(
            replace(cfg, kv_layout=layout),
            params, FusedSamConfig(n_predicts=11, steps_per_call=4),
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(32,))
        outs[layout] = eng.generate(prompt, gen)
    assert outs["ds"].output_ids == outs["sd"].output_ids
    assert outs["ds"].decode_steps == outs["sd"].decode_steps


def test_flash_kernel_pre_transposed(model):
    """flash_block_attention(pre_transposed=True) on a ds cache matches the
    XLA attention (interpret mode on CPU)."""
    from samd_tpu.models.llama import _attention
    from samd_tpu.ops.pallas_attention import flash_block_attention

    cfg, _ = model
    rng = np.random.default_rng(2)
    T, S = 8, 128
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = jnp.asarray(rng.normal(size=(1, T, NH, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, KH, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, KH, S, D)), jnp.float32)
    cache_len = 40
    s = jnp.arange(S)[None, None, :]
    t = jnp.arange(T)[None, :, None]
    mask = (s < cache_len) | ((s >= cache_len) & (s <= cache_len + t))
    mask = jnp.broadcast_to(mask, (1, T, S))

    ref = _attention(q, k, v, mask, cfg)
    out = flash_block_attention(
        q, k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2), mask,
        jnp.int32(cache_len + T), block_s=128, pre_transposed=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_sam_ds_flash_interpret(model):
    """End-to-end: fused engine with ds layout + flash kernel (interpret)
    equals the sd/XLA trajectory."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg, params = model
    prompt = np.random.default_rng(3).integers(3, 128, size=20).tolist()
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=MAX_CACHE)
    ref = FusedSamEngine(
        cfg, params, FusedSamConfig(n_predicts=11, steps_per_call=4),
        max_cache_len=MAX_CACHE, eos_token_id=-1,
        prefill_buckets=(32,)).generate(prompt, gen)
    cfg_ds = replace(cfg, kv_layout="ds", attention_impl="flash_interpret")
    out = FusedSamEngine(
        cfg_ds, params, FusedSamConfig(n_predicts=11, steps_per_call=4),
        max_cache_len=MAX_CACHE, eos_token_id=-1,
        prefill_buckets=(32,)).generate(prompt, gen)
    assert out.output_ids == ref.output_ids
