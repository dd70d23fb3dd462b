"""Fused hybrid (SAM retrieval + Token-Recycle tree) engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.fused_hybrid import FusedHybridConfig, FusedHybridEngine
from samd_tpu.models import init_params, tiny_config


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def small_cfg(**kw):
    base = dict(n_predicts=12, tree_nodes=15, topk=4, max_block=16,
                steps_per_call=6, corpus_capacity=256)
    base.update(kw)
    return FusedHybridConfig(**base)


def test_hybrid_equals_ar(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    eng = FusedHybridEngine(cfg, params, small_cfg(), max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    rng = np.random.default_rng(0)
    for seed in range(3):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = eng.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens


def test_hybrid_uses_retrieval_with_corpus(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    p = np.random.default_rng(1).integers(3, 128, size=20).tolist()
    probe = FusedHybridEngine(cfg, params, small_cfg(), max_cache_len=256,
                              eos_token_id=-1, prefill_buckets=(32,))
    ref = probe.generate(p, gen)
    corpus = ref.output_ids + [0]
    eng = FusedHybridEngine(cfg, params, small_cfg(len_bias=0), corpus=corpus,
                            max_cache_len=256, eos_token_id=-1,
                            prefill_buckets=(32,))
    out = eng.generate(p, gen)
    assert out.output_ids == ref.output_ids
    assert out.decode_steps < ref.decode_steps
    assert eng.sam_steps > 0  # the retrieval branch fired


def test_hybrid_tree_branch_on_deterministic_stream(tiny_model):
    """Zero-weight model: once 0→topK is harvested, the Token-Recycle tree
    accepts whole paths even before the 0-run is long enough for retrieval."""
    cfg, params = tiny_model
    zero_params = jax.tree.map(jnp.zeros_like, params)
    eng = FusedHybridEngine(cfg, zero_params, small_cfg(), max_cache_len=512,
                            eos_token_id=-1, prefill_buckets=(64,))
    p = np.random.default_rng(2).integers(3, 128, size=24).tolist()
    out = eng.generate(p, GenerationConfig(max_new_tokens=40,
                                           max_cache_len=512))
    assert out.output_ids[len(p):] == [0] * 40
    assert out.decode_steps < 20


def test_hybrid_sampling_mode(tiny_model):
    """Seeded sampling is reproducible on a fresh engine (the harvest table
    deliberately persists across requests, like the reference's TokenRecycle
    cache, so repeat runs on one engine may draft differently)."""
    cfg, params = tiny_model
    p = np.random.default_rng(3).integers(3, 128, size=18).tolist()
    gen1 = GenerationConfig(max_new_tokens=20, max_cache_len=256,
                            greedy=False, temperature=0.8, seed=5)

    def fresh():
        return FusedHybridEngine(cfg, params, small_cfg(), max_cache_len=256,
                                 eos_token_id=-1, prefill_buckets=(32,))

    a = fresh().generate(p, gen1)
    b = fresh().generate(p, gen1)
    assert a.output_ids == b.output_ids
    assert a.decode_tokens == 20
    gen2 = GenerationConfig(max_new_tokens=20, max_cache_len=256,
                            greedy=False, temperature=0.8, seed=6)
    c = fresh().generate(p, gen2)
    assert c.output_ids != a.output_ids


def test_hybrid_eagle_equals_ar(tiny_model):
    from samd_tpu.fused_hybrid import (
        FusedHybridEagleConfig,
        FusedHybridEagleEngine,
    )

    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    hy = FusedHybridEagleConfig(n_predicts=12, eagle_depth=3, eagle_topk=4,
                                eagle_total=15, max_block=16,
                                steps_per_call=6, corpus_capacity=256)
    eng = FusedHybridEagleEngine(cfg, params, hy, max_cache_len=256,
                                 eos_token_id=-1, prefill_buckets=(32,))
    rng = np.random.default_rng(10)
    for seed in range(2):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = eng.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens


def test_hybrid_eagle_uses_retrieval_with_corpus(tiny_model):
    from samd_tpu.fused_hybrid import (
        FusedHybridEagleConfig,
        FusedHybridEagleEngine,
    )

    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    hy = FusedHybridEagleConfig(n_predicts=12, eagle_depth=3, eagle_topk=4,
                                eagle_total=15, max_block=16,
                                steps_per_call=6, corpus_capacity=256,
                                len_bias=0)
    p = np.random.default_rng(11).integers(3, 128, size=20).tolist()
    probe = FusedHybridEagleEngine(cfg, params, hy, max_cache_len=256,
                                   eos_token_id=-1, prefill_buckets=(32,))
    ref = probe.generate(p, gen)
    corpus = ref.output_ids + [0]
    eng = FusedHybridEagleEngine(cfg, params, hy, corpus=corpus,
                                 max_cache_len=256, eos_token_id=-1,
                                 prefill_buckets=(32,))
    out = eng.generate(p, gen)
    assert out.output_ids == ref.output_ids
    assert out.decode_steps < ref.decode_steps
    assert eng.sam_steps > 0


def test_hybrid_cache_buckets_match_full_cache(tiny_model):
    """FusedHybridConfig.cache_buckets: window program == full-cache
    program (fp32 tiny config)."""
    import numpy as np

    from samd_tpu.config import GenerationConfig

    cfg, params = tiny_model
    base = dict(n_predicts=12, len_threshold=3, tree_nodes=13, topk=4,
                steps_per_call=5, corpus_capacity=256, max_block=16,
                approx_harvest=False)
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=256)
    prompts = [np.random.default_rng(23).integers(3, 128, size=16).tolist()
               for _ in range(2)]
    full = FusedHybridEngine(cfg, params, FusedHybridConfig(**base),
                             max_cache_len=256, eos_token_id=-1,
                             prefill_buckets=(32,))
    win = FusedHybridEngine(
        cfg, params,
        FusedHybridConfig(**base, cache_buckets=(64, 128)),
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    for p in prompts:
        assert win.generate(p, gen).output_ids == \
            full.generate(p, gen).output_ids
    assert any(k[1] == 64 for k in win._fused_sampling)
