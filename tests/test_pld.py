"""Device-resident PLD engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.models import init_params, tiny_config
from samd_tpu.pld import PldConfig, PldEngine, pld_draft


def test_pld_draft_finds_longest_ngram():
    history = jnp.asarray([5, 6, 7, 9, 5, 6, 7, 8, 1, 5, 6, 0, 0, 0, 0, 0],
                          jnp.int32)
    hist_len = jnp.int32(11)  # ... 1, 5, 6
    # query tail: [5, 6, 7] (start=7): 3-gram [5,6,7] occurs at 0 and 4
    tokens, dlen = pld_draft(history, hist_len, jnp.int32(7),
                             max_ngram=3, n_predicts=5)
    assert int(tokens[0]) == 7
    # first occurrence at 0 -> continuation [9, 5, 6, 7, 8]
    assert tokens[1:].tolist() == [9, 5, 6, 7, 8]
    assert int(dlen) == 6


def test_pld_draft_no_match():
    history = jnp.asarray([1, 2, 3, 0, 0, 0], jnp.int32)
    tokens, dlen = pld_draft(history, jnp.int32(3), jnp.int32(9),
                             max_ngram=3, n_predicts=4)
    assert int(dlen) == 1
    assert int(tokens[0]) == 9


def test_pld_draft_continuation_clipped_to_history():
    history = jnp.asarray([1, 2, 3, 1, 2, 0, 0, 0], jnp.int32)
    # query tail [1, 2, 3]? start=3, hist tail [1,2]: 3-gram [1,2,3] at 0
    tokens, dlen = pld_draft(history, jnp.int32(5), jnp.int32(3),
                             max_ngram=3, n_predicts=6)
    # continuation after position 2: [1, 2] only (hist_len=5)
    assert int(dlen) == 3
    assert tokens.tolist()[:3] == [3, 1, 2]


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def test_pld_equals_ar(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=40, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    pld = PldEngine(cfg, params, PldConfig(steps_per_call=8),
                    max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    rng = np.random.default_rng(0)
    for seed in range(3):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = pld.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens


def test_pld_accelerates_on_repetitive_generation(tiny_model):
    """When the generation replays history n-grams, PLD must accept multiple
    tokens per step.  A zero-weight model generates token 0 forever (argmax
    tie-break), a deterministic fully-repetitive stream."""
    cfg, params = tiny_model
    zero_params = jax.tree.map(jnp.zeros_like, params)
    gen = GenerationConfig(max_new_tokens=40, max_cache_len=512)
    ar = ArBaseline(cfg, zero_params, max_cache_len=512, eos_token_id=-1,
                    prefill_buckets=(64,))
    pld = PldEngine(cfg, zero_params, PldConfig(steps_per_call=8),
                    max_cache_len=512, eos_token_id=-1,
                    prefill_buckets=(64,))
    p = np.random.default_rng(1).integers(3, 128, size=24).tolist()
    ref = ar.generate(p, gen)
    assert ref.output_ids[len(p):] == [0] * 40
    out = pld.generate(p, gen)
    assert out.output_ids == ref.output_ids
    # 40 tokens in a handful of steps (first few steps build up the 0-run)
    assert out.decode_steps <= 12, out.decode_steps


def test_pld_eos_stops(tiny_model):
    cfg, params = tiny_model
    probe = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                       prefill_buckets=(32,))
    rng = np.random.default_rng(2)
    p = rng.integers(3, 128, size=16).tolist()
    ref = probe.generate(p, GenerationConfig(max_new_tokens=12,
                                             max_cache_len=256))
    eos = ref.output_ids[len(p) + 5]
    pld = PldEngine(cfg, params, PldConfig(steps_per_call=8),
                    max_cache_len=256, eos_token_id=eos,
                    prefill_buckets=(32,))
    out = pld.generate(p, GenerationConfig(max_new_tokens=40,
                                           max_cache_len=256))
    gen_part = out.output_ids[len(p):]
    assert eos in gen_part
    assert gen_part.index(eos) == len(gen_part) - 1
