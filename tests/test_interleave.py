"""InterleavedSamdEngine: lane-multiplexed host decoding must be bitwise
identical to sequential SamdEngine runs (fp32 tiny config, CPU backend)."""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.interleave import InterleavedSamdEngine
from samd_tpu.models import init_params, tiny_config
from samd_tpu.sam import SamCursor, build_corpus_sam


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    return cfg, params, samd_cfg


def prompts(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(3, 128, size=int(rng.integers(10, 24))).tolist()
            for _ in range(n)]


def test_interleaved_matches_sequential(setup):
    cfg, params, samd_cfg = setup
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=128)
    ps = prompts(5, seed=1)

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in ps]

    inter = InterleavedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        lanes=2, max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    rids = [inter.add_request(p, gen) for p in ps]
    results = inter.run()
    assert set(results) == set(rids)
    for rid, exp in zip(rids, expected):
        got = results[rid]
        assert got.output_ids == exp.output_ids, f"request {rid}"
        assert got.decode_tokens == exp.decode_tokens
        assert got.accept_length_per_step == exp.accept_length_per_step


def test_interleaved_shared_corpus(setup):
    """Lanes sharing one static corpus SAM through per-lane cursors."""
    cfg, params, samd_cfg = setup
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128)
    ps = prompts(4, seed=2)
    corpus = [prompts(1, seed=9)[0] * 3]
    sam = build_corpus_sam(corpus, eos_token=0, topk=4)

    single = SamdEngine(
        cfg, params, samd_cfg,
        make_drafter(samd_cfg, cfg.vocab_size, static_sam=SamCursor(sam)),
        max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in ps]

    inter = InterleavedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size,
                             static_sam=SamCursor(sam)),
        lanes=3, max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    rids = [inter.add_request(p, gen) for p in ps]
    results = inter.run()
    for rid, exp in zip(rids, expected):
        assert results[rid].output_ids == exp.output_ids


def test_interleaved_sampling_deterministic(setup):
    """Sampling requests: same seed → same tokens as a sequential run."""
    cfg, params, samd_cfg = setup
    ps = prompts(3, seed=3)
    gens = [GenerationConfig(max_new_tokens=12, max_cache_len=128,
                             greedy=False, temperature=0.8, seed=s)
            for s in (1, 2, 3)]

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    expected = [single.generate(p, g) for p, g in zip(ps, gens)]

    inter = InterleavedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        lanes=2, max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    rids = [inter.add_request(p, g) for p, g in zip(ps, gens)]
    results = inter.run()
    for rid, exp in zip(rids, expected):
        assert results[rid].output_ids == exp.output_ids


def test_interleaved_single_lane_and_eos(setup):
    """lanes=1 degenerates to sequential; EOS mid-stream frees the lane for
    the queued request."""
    cfg, params, samd_cfg = setup
    gen = GenerationConfig(max_new_tokens=20, max_cache_len=128)
    ps = prompts(3, seed=4)
    eos = ps[0][-1]  # likely to appear

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=eos,
                        prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in ps]

    inter = InterleavedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        lanes=1, max_cache_len=128, eos_token_id=eos, prefill_buckets=(32,))
    rids = [inter.add_request(p, gen) for p in ps]
    results = inter.run()
    for rid, exp in zip(rids, expected):
        assert results[rid].output_ids == exp.output_ids


def test_interleaved_tree_drafter(setup):
    """Harvest-consuming drafter (token_recycle) through the lanes."""
    cfg, params, _ = setup
    samd_cfg = SamdConfig(draft_source="tree", tree_method="token_recycle",
                          max_predicts=8, n_predicts=8)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128)
    ps = prompts(3, seed=5)

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    expected = [single.generate(p, gen) for p in ps]

    inter = InterleavedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        lanes=2, max_cache_len=128, eos_token_id=-1, prefill_buckets=(32,))
    rids = [inter.add_request(p, gen) for p in ps]
    results = inter.run()
    for rid, exp in zip(rids, expected):
        assert results[rid].output_ids == exp.output_ids
    assert inter.stats.source_counts  # aggregated over lanes
