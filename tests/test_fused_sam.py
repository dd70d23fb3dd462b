"""Fused device-resident SAM-style retrieval engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine, suffix_match
from samd_tpu.models import init_params, tiny_config


def test_suffix_match_basic():
    buf = jnp.asarray([4, 5, 6, 7, 1, 4, 5, 6, 0, 0], jnp.int32)
    # query window (Q=4): [.., 4, 5, 6] with -1 pad
    q = jnp.asarray([-1, 4, 5, 6], jnp.int32)
    tail = jnp.full((8,), -1, jnp.int32)
    m, e = suffix_match(buf, jnp.int32(8), q, tail, jnp.int32(0),
                        max_ngram=4, ext=8)
    assert int(m) == 3
    assert int(e) == 2  # first occurrence of [4,5,6] ends at index 2


def test_suffix_match_extension():
    # long repeat: [1..6, 9, 1..6]; query = last 3 [4,5,6], ext context [1,2,3]
    buf = jnp.asarray([1, 2, 3, 4, 5, 6, 9, 1, 2, 3, 4, 5, 6, 0, 0, 0],
                      jnp.int32)
    q = jnp.asarray([4, 5, 6], jnp.int32)
    tail = jnp.asarray([-1, -1, -1, -1, -1, 1, 2, 3], jnp.int32)
    m, e = suffix_match(buf, jnp.int32(13), q, tail, jnp.int32(3),
                        max_ngram=3, ext=8)
    # window match of 3 at end=5 (first), extended by the [1,2,3] context
    assert int(e) == 5
    assert int(m) == 6


def test_suffix_match_no_match():
    buf = jnp.asarray([1, 2, 3, 0], jnp.int32)
    q = jnp.asarray([-1, 7, 8], jnp.int32)
    tail = jnp.full((4,), -1, jnp.int32)
    m, e = suffix_match(buf, jnp.int32(3), q, tail, jnp.int32(0),
                        max_ngram=3, ext=4)
    assert int(m) == 0


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def test_fused_sam_equals_ar(tiny_model):
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    eng = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=15, steps_per_call=8),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    rng = np.random.default_rng(0)
    for seed in range(3):
        p = rng.integers(3, 128, size=20).tolist()
        ref = ar.generate(p, gen)
        out = eng.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens


def test_fused_sam_corpus_accelerates(tiny_model):
    """With a corpus containing the model's own continuation, the engine must
    retrieve long drafts and finish in far fewer steps — and still match the
    AR output exactly."""
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=40, max_cache_len=512)
    ar = ArBaseline(cfg, params, max_cache_len=512, eos_token_id=-1,
                    prefill_buckets=(64,))
    p = np.random.default_rng(1).integers(3, 128, size=24).tolist()
    ref = ar.generate(p, gen)

    corpus = ref.output_ids + [0]
    eng = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=31, steps_per_call=8,
                                        len_bias=0),
                         corpus=corpus, max_cache_len=512, eos_token_id=-1,
                         prefill_buckets=(64,))
    out = eng.generate(p, gen)
    assert out.output_ids == ref.output_ids
    assert out.decode_steps <= 6, out.decode_steps  # 40 tokens, long drafts

    # without the corpus: no retrieval, step-per-token
    eng2 = FusedSamEngine(cfg, params,
                          FusedSamConfig(n_predicts=31, steps_per_call=8),
                          max_cache_len=512, eos_token_id=-1,
                          prefill_buckets=(64,))
    out2 = eng2.generate(p, gen)
    assert out2.output_ids == ref.output_ids
    assert out2.decode_steps > out.decode_steps


def test_fused_sam_eos(tiny_model):
    cfg, params = tiny_model
    probe = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                       prefill_buckets=(32,))
    p = np.random.default_rng(2).integers(3, 128, size=16).tolist()
    ref = probe.generate(p, GenerationConfig(max_new_tokens=12,
                                             max_cache_len=256))
    eos = ref.output_ids[len(p) + 5]
    eng = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=15, steps_per_call=8),
                         max_cache_len=256, eos_token_id=eos,
                         prefill_buckets=(32,))
    out = eng.generate(p, GenerationConfig(max_new_tokens=40,
                                           max_cache_len=256))
    gen_part = out.output_ids[len(p):]
    assert eos in gen_part
    assert gen_part.index(eos) == len(gen_part) - 1


def test_batched_fused_sam_matches_single(tiny_model):
    from samd_tpu.fused_sam import BatchedFusedSamEngine

    cfg, params = tiny_model
    fscfg = FusedSamConfig(n_predicts=15, steps_per_call=6,
                           corpus_capacity=256)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 128, size=int(rng.integers(10, 24))).tolist()
               for _ in range(5)]

    single = FusedSamEngine(cfg, params, fscfg, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in prompts]

    batched = BatchedFusedSamEngine(cfg, params, fscfg, batch_size=2,
                                    max_cache_len=256, eos_token_id=-1,
                                    prefill_buckets=(32,))
    ids = [batched.add_request(p, gen) for p in prompts]
    results = batched.run()
    assert set(results) == set(ids)
    for rid, exp in zip(ids, expected):
        assert results[rid].output_ids == exp.output_ids, f"request {rid}"
        assert results[rid].decode_tokens == exp.decode_tokens


def test_batched_fused_sam_quantized_matches_single(tiny_model):
    """The peak-throughput serving config (INT8 + continuous batching,
    bench.py): batched int8 outputs equal single-stream int8 outputs
    (tiny config is fp32-exact, so the programs agree bitwise here)."""
    from samd_tpu.fused_sam import BatchedFusedSamEngine
    from samd_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny_model
    qparams = quantize_llama_params(params)
    fscfg = FusedSamConfig(n_predicts=15, steps_per_call=6,
                           corpus_capacity=256)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(3, 128, size=12).tolist() for _ in range(3)]

    single = FusedSamEngine(cfg, qparams, fscfg, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in prompts]

    batched = BatchedFusedSamEngine(cfg, qparams, fscfg, batch_size=2,
                                    max_cache_len=256, eos_token_id=-1,
                                    prefill_buckets=(32,))
    ids = [batched.add_request(p, gen) for p in prompts]
    results = batched.run()
    for rid, exp in zip(ids, expected):
        assert results[rid].output_ids == exp.output_ids, f"request {rid}"


def test_batched_fused_sam_with_corpus(tiny_model):
    from samd_tpu.fused_sam import BatchedFusedSamEngine

    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    p = np.random.default_rng(6).integers(3, 128, size=20).tolist()
    fscfg = FusedSamConfig(n_predicts=15, steps_per_call=6,
                           corpus_capacity=256)
    probe = FusedSamEngine(cfg, params, fscfg, max_cache_len=256,
                           eos_token_id=-1, prefill_buckets=(32,))
    ref = probe.generate(p, gen)
    corpus = ref.output_ids + [0]

    batched = BatchedFusedSamEngine(cfg, params, fscfg, corpus=corpus,
                                    batch_size=2, max_cache_len=256,
                                    eos_token_id=-1, prefill_buckets=(32,))
    ids = [batched.add_request(p, gen) for _ in range(3)]
    results = batched.run()
    for rid in ids:
        assert results[rid].output_ids == ref.output_ids
        assert results[rid].decode_steps < ref.decode_steps or \
            results[rid].decode_steps <= 4


def test_fused_sam_sampling(tiny_model):
    """Sampling mode: seed-deterministic, different seeds diverge, budget
    respected."""
    cfg, params = tiny_model
    eng = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=15, steps_per_call=8,
                                        corpus_capacity=256),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    p = np.random.default_rng(7).integers(3, 128, size=20).tolist()
    gen1 = GenerationConfig(max_new_tokens=24, max_cache_len=256,
                            greedy=False, temperature=0.8, seed=1)
    out_a = eng.generate(p, gen1)
    out_b = eng.generate(p, gen1)
    assert out_a.output_ids == out_b.output_ids
    assert out_a.decode_tokens == 24
    gen2 = GenerationConfig(max_new_tokens=24, max_cache_len=256,
                            greedy=False, temperature=0.8, seed=99)
    out_c = eng.generate(p, gen2)
    assert out_c.output_ids != out_a.output_ids


def test_fused_sam_posterior_accept_modes(tiny_model):
    """Typical/nucleus chain acceptance run through the fused loop
    (chain_posterior_accept), seed-deterministic and in-vocab."""
    cfg, params = tiny_model
    eng = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=15, steps_per_call=8,
                                        corpus_capacity=256),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    p = np.random.default_rng(8).integers(3, 128, size=20).tolist()
    for mode, knobs in (("typical", dict(temperature=0.8)),
                        ("nucleus", dict(temperature=0.8, top_p=0.9))):
        gen = GenerationConfig(max_new_tokens=16, max_cache_len=256,
                               greedy=False, accept_mode=mode, seed=3,
                               **knobs)
        a = eng.generate(p, gen)
        b = eng.generate(p, gen)
        assert a.output_ids == b.output_ids, mode
        assert all(0 <= t < cfg.vocab_size for t in a.output_ids), mode


def test_cache_buckets_match_full_cache(tiny_model):
    """cache_buckets: a bucketed-cache program must produce the same
    tokens as the full-cache program (tiny config is fp32-exact, so the
    narrower softmax reduction cannot flip anything here)."""
    cfg, params = tiny_model
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(3, 128, size=16).tolist() for _ in range(3)]

    full = FusedSamEngine(cfg, params,
                          FusedSamConfig(n_predicts=15, steps_per_call=6,
                                         corpus_capacity=256),
                          max_cache_len=256, eos_token_id=-1,
                          prefill_buckets=(32,))
    expected = [full.generate(p, gen) for p in prompts]

    win = FusedSamEngine(cfg, params,
                         FusedSamConfig(n_predicts=15, steps_per_call=6,
                                        corpus_capacity=256,
                                        cache_buckets=(64, 128)),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    # need = 16 + 24 + 16 = 56 -> the 64-token window bucket
    for p, exp in zip(prompts, expected):
        out = win.generate(p, gen)
        assert out.output_ids == exp.output_ids
        assert out.decode_tokens == exp.decode_tokens
    assert (None, 64) in win._fused_sampling  # the window program ran
