"""End-to-end engine tests: greedy output equality of speculative decoding vs
the autoregressive baseline (the reference's strongest correctness check,
evaluation/equal.py promoted to CI per SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.models import init_params, tiny_config
from samd_tpu.sam import build_corpus_sam


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


@pytest.fixture(scope="module")
def ar_engine(tiny_model):
    cfg, params = tiny_model
    return ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                      prefill_buckets=(32, 64))


def prompt_ids(seed=0, n=20, vocab=128):
    rng = np.random.default_rng(seed)
    return rng.integers(3, vocab, size=n).tolist()


def make_engine(tiny_model, samd_cfg, static_sam=None):
    cfg, params = tiny_model
    drafter = make_drafter(samd_cfg, cfg.vocab_size, static_sam=static_sam)
    return SamdEngine(cfg, params, samd_cfg, drafter, max_cache_len=256,
                      eos_token_id=-1, prefill_buckets=(32, 64))


GEN = GenerationConfig(max_new_tokens=48, max_cache_len=256)


def test_ar_baseline_runs(ar_engine):
    out = ar_engine.generate(prompt_ids(), GEN)
    assert out.decode_tokens == 48
    assert out.decode_steps == 48
    assert all(a == 1 for a in out.accept_length_per_step)


@pytest.mark.parametrize("max_predicts", [8, 24])
def test_sam_only_greedy_equality(tiny_model, ar_engine, max_predicts):
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=max_predicts,
                          alpha=4.0, len_bias=0)
    engine = make_engine(tiny_model, samd_cfg)
    for seed in range(3):
        p = prompt_ids(seed)
        ref = ar_engine.generate(p, GEN)
        out = engine.generate(p, GEN)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
        assert out.decode_tokens == ref.decode_tokens
        assert sum(out.accept_length_per_step) == out.decode_tokens
        # speculative decoding should need no more steps than AR
        assert out.decode_steps <= ref.decode_steps


def test_sam_only_with_static_corpus(tiny_model, ar_engine):
    # Build the corpus from the model's own greedy output: maximal overlap,
    # so the static SAM should supply long drafts.
    p = prompt_ids(7)
    ref = ar_engine.generate(p, GEN)
    corpus = [ref.output_ids]
    static_sam = build_corpus_sam(corpus, eos_token=0, topk=8)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=16,
                          len_bias=0)
    engine = make_engine(tiny_model, samd_cfg, static_sam=static_sam)
    out = engine.generate(p, GEN)
    assert out.output_ids == ref.output_ids
    # with a perfectly matching corpus the engine must beat AR clearly
    assert out.decode_steps < ref.decode_steps / 2
    assert "sam_static" in engine.stats.source_counts or \
           "sam_dyn" in engine.stats.source_counts


def test_hybrid_token_recycle_equality(tiny_model, ar_engine):
    samd_cfg = SamdConfig(draft_source="sam_hybrid", max_predicts=24,
                          n_predicts=12, len_threshold=5, len_bias=5,
                          tree_method="token_recycle")
    engine = make_engine(tiny_model, samd_cfg)
    for seed in (1, 4):
        p = prompt_ids(seed)
        ref = ar_engine.generate(p, GEN)
        out = engine.generate(p, GEN)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
    assert "token_recycle" in engine.stats.source_counts


def test_eos_truncation(tiny_model):
    cfg, params = tiny_model
    # pick the first greedily generated token as a fake EOS
    probe = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                       prefill_buckets=(32, 64))
    p = prompt_ids(2)
    ref = probe.generate(p, GenerationConfig(max_new_tokens=10,
                                             max_cache_len=256))
    eos = ref.output_ids[len(p) + 4]
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8,
                          len_bias=0)
    drafter = make_drafter(samd_cfg, cfg.vocab_size)
    engine = SamdEngine(cfg, params, samd_cfg, drafter, max_cache_len=256,
                        eos_token_id=eos, prefill_buckets=(32, 64))
    out = engine.generate(p, GEN)
    gen_part = out.output_ids[len(p):]
    assert eos in gen_part
    assert gen_part.index(eos) == len(gen_part) - 1  # stops right after EOS


def test_stream_generate_matches_generate(tiny_model, ar_engine):
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8,
                          len_bias=0)
    engine = make_engine(tiny_model, samd_cfg)
    p = prompt_ids(3)
    full = engine.generate(p, GEN)
    chunks = []
    for chunk in engine.stream_generate(p, GEN):
        chunks.extend(chunk)
    assert p + chunks == full.output_ids


def test_sampling_accept_temperature(tiny_model):
    """Sampling path must produce valid output and be reproducible by seed."""
    cfg, params = tiny_model
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    engine = make_engine(tiny_model, samd_cfg)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256, greedy=False,
                           temperature=0.8, seed=123)
    p = prompt_ids(5)
    out1 = engine.generate(p, gen)
    out2 = engine.generate(p, gen)
    assert out1.output_ids == out2.output_ids  # deterministic per seed
    assert out1.decode_tokens == 24
    gen2 = GenerationConfig(max_new_tokens=24, max_cache_len=256, greedy=False,
                            temperature=0.8, seed=7)
    out3 = engine.generate(p, gen2)
    assert out3.output_ids != out1.output_ids  # different seed → different path
