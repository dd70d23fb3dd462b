"""Fused EAGLE-2 engine tests."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig
from samd_tpu.eagle_fused import FusedEagle2Engine
from samd_tpu.engine import ArBaseline
from samd_tpu.models import init_params, tiny_config


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def test_fused_eagle2_equals_ar(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    eng = FusedEagle2Engine(cfg, params, depth=3, topk=4, total_tokens=15,
                            steps_per_call=6, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    rng = np.random.default_rng(0)
    for seed in range(3):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = eng.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens


def test_fused_eagle2_quantized_equals_quantized_ar(tiny_model):
    """INT8 target weights: the EAGLE expansion's lm_head ranking must
    consume the QuantizedTensor (pre-dequant form) and the engine stays
    lossless vs the int8 AR baseline (tiny config is fp32-exact)."""
    from samd_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny_model
    qparams = quantize_llama_params(params)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    ar = ArBaseline(cfg, qparams, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    eng = FusedEagle2Engine(cfg, qparams, depth=3, topk=4, total_tokens=15,
                            steps_per_call=6, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    p = np.random.default_rng(3).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_fused_eagle2_quantized_net_lossless(tiny_model):
    """Fully-quantized expansion (int8 draft net AND target): drafter weight
    quality never affects greedy losslessness — outputs must equal the int8
    AR baseline's exactly (fp32-exact tiny config)."""
    from samd_tpu.drafters.eagle.net import EagleNetConfig, init_eagle_params
    from samd_tpu.ops.quant import quantize_eagle_params, \
        quantize_llama_params

    cfg, params = tiny_model
    qparams = quantize_llama_params(params)
    qnet = quantize_eagle_params(init_eagle_params(
        EagleNetConfig.from_target(cfg), jax.random.PRNGKey(7)))
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    ar = ArBaseline(cfg, qparams, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    eng = FusedEagle2Engine(cfg, qparams, net_params=qnet, depth=3, topk=4,
                            total_tokens=15, steps_per_call=6,
                            max_cache_len=256, eos_token_id=-1,
                            prefill_buckets=(32,))
    p = np.random.default_rng(5).integers(3, 128, size=20).tolist()
    assert eng.generate(p, gen).output_ids == ar.generate(p, gen).output_ids


def test_fused_eagle2_matches_host_eagle2(tiny_model):
    """The fused engine and the host Eagle2 hybrid drafter share draft-net
    math; with the same net weights they should accept comparably.  We check
    output equality (both equal AR) and that the fused loop runs multi-step
    segments."""
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    eng = FusedEagle2Engine(cfg, params, depth=3, topk=4, total_tokens=15,
                            steps_per_call=4, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    p = np.random.default_rng(1).integers(3, 128, size=18).tolist()
    out = eng.generate(p, gen)
    assert out.decode_tokens == 24
    assert out.decode_steps <= 24


def test_fused_eagle2_eos(tiny_model):
    cfg, params = tiny_model
    probe = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                       prefill_buckets=(32,))
    p = np.random.default_rng(2).integers(3, 128, size=16).tolist()
    ref = probe.generate(p, GenerationConfig(max_new_tokens=12,
                                             max_cache_len=256))
    eos = ref.output_ids[len(p) + 5]
    eng = FusedEagle2Engine(cfg, params, depth=3, topk=4, total_tokens=15,
                            steps_per_call=6, max_cache_len=256,
                            eos_token_id=eos, prefill_buckets=(32,))
    out = eng.generate(p, GenerationConfig(max_new_tokens=40,
                                           max_cache_len=256))
    gen_part = out.output_ids[len(p):]
    assert eos in gen_part
    assert gen_part.index(eos) == len(gen_part) - 1


@pytest.mark.parametrize("mode,knobs", [
    ("rejection", dict(temperature=0.8, top_p=0.9)),
    ("typical", dict(temperature=0.8)),
    ("nucleus", dict(temperature=0.8, top_p=0.9)),
])
def test_fused_eagle2_sampling_runs(tiny_model, mode, knobs):
    """Sampling modes run through the fused loop, stay in-vocab and are
    deterministic per seed."""
    cfg, params = tiny_model
    eng = FusedEagle2Engine(cfg, params, depth=3, topk=4, total_tokens=15,
                            steps_per_call=6, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256,
                           greedy=False, accept_mode=mode, seed=9, **knobs)
    p = np.random.default_rng(1).integers(3, 128, size=20).tolist()
    out1 = eng.generate(p, gen)
    out2 = eng.generate(p, gen)
    assert out1.output_ids == out2.output_ids
    assert len(out1.output_ids) > len(p)
    assert all(0 <= t < cfg.vocab_size for t in out1.output_ids)
