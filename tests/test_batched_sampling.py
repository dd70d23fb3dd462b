"""Sampling in the batched engines (VERDICT r01 item 6).

Correctness bar:
  * greedy requests mixed into a sampling batch stay EXACTLY oracle-equal
    (the mixed-mode accept select must not perturb greedy slots);
  * sampling requests are deterministic per seed and vary across seeds;
  * both BatchedSamdEngine and BatchedFusedSamEngine accept all
    GenerationConfig accept modes through one compiled program per
    signature.
"""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline
from samd_tpu.models import init_params, tiny_config

MAX_CACHE = 256
M = 12


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(7)
    return [rng.integers(3, 128, size=20).tolist() for _ in range(4)]


@pytest.fixture(scope="module")
def oracle_outs(model, prompts):
    cfg, params = model
    oracle = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                        eos_token_id=-1, prefill_buckets=(32,), block_size=M)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=MAX_CACHE)
    return [oracle.generate(p, gen).output_ids for p in prompts]


def _batched_host(model):
    from samd_tpu.batching import BatchedSamdEngine

    cfg, params = model
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=M)
    return BatchedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        batch_size=4, max_cache_len=MAX_CACHE, eos_token_id=-1,
        prefill_buckets=(32,))


def _batched_fused(model):
    from samd_tpu.fused_sam import BatchedFusedSamEngine, FusedSamConfig

    cfg, params = model
    return BatchedFusedSamEngine(
        cfg, params, FusedSamConfig(n_predicts=M - 1, steps_per_call=4),
        batch_size=4, max_cache_len=MAX_CACHE, eos_token_id=-1,
        prefill_buckets=(32,))


def _batched_paged(model):
    from samd_tpu.batching import PagedBatchedSamdEngine

    cfg, params = model
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=M)
    return PagedBatchedSamdEngine(
        cfg, params, samd_cfg,
        lambda: make_drafter(samd_cfg, cfg.vocab_size),
        batch_size=4, max_cache_len=MAX_CACHE, eos_token_id=-1,
        prefill_buckets=(32,), n_pages=80, page_size=16)


@pytest.mark.parametrize("make_engine",
                         [_batched_host, _batched_fused, _batched_paged],
                         ids=["host", "fused", "paged"])
def test_mixed_batch_greedy_slots_lossless(model, prompts, oracle_outs,
                                           make_engine):
    eng = make_engine(model)
    greedy = GenerationConfig(max_new_tokens=16, max_cache_len=MAX_CACHE)
    samp = GenerationConfig(max_new_tokens=16, max_cache_len=MAX_CACHE,
                            greedy=False, temperature=0.9, seed=3)
    rids = [eng.add_request(prompts[0], greedy),
            eng.add_request(prompts[1], samp),
            eng.add_request(prompts[2], greedy),
            eng.add_request(prompts[3], samp)]
    res = eng.run()
    assert res[rids[0]].output_ids == oracle_outs[0]
    assert res[rids[2]].output_ids == oracle_outs[2]
    for i in (1, 3):
        out = res[rids[i]].output_ids
        assert len(out) > len(prompts[i])
        vocab = model[0].vocab_size
        assert all(0 <= t < vocab for t in out)


@pytest.mark.parametrize("make_engine", [_batched_host, _batched_fused],
                         ids=["host", "fused"])
def test_sampling_deterministic_per_seed(model, prompts, make_engine):
    outs = []
    for _ in range(2):
        eng = make_engine(model)
        gen = GenerationConfig(max_new_tokens=12, max_cache_len=MAX_CACHE,
                               greedy=False, temperature=0.8, seed=11)
        rid = eng.add_request(prompts[0], gen)
        outs.append(eng.run()[rid].output_ids)
    assert outs[0] == outs[1]

    eng = make_engine(model)
    gen2 = GenerationConfig(max_new_tokens=12, max_cache_len=MAX_CACHE,
                            greedy=False, temperature=0.8, seed=12)
    rid = eng.add_request(prompts[0], gen2)
    other = eng.run()[rid].output_ids
    # different seed should (overwhelmingly) differ somewhere
    assert other != outs[0]


@pytest.mark.parametrize("make_engine", [_batched_host, _batched_fused],
                         ids=["host", "fused"])
@pytest.mark.parametrize("mode,knobs", [
    ("typical", dict(temperature=0.8)),
    ("nucleus", dict(temperature=0.8, top_p=0.9)),
])
def test_accept_modes_run(model, prompts, make_engine, mode, knobs):
    eng = make_engine(model)
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=MAX_CACHE,
                           greedy=False, accept_mode=mode, seed=5, **knobs)
    rid = eng.add_request(prompts[0], gen)
    out = eng.run()[rid].output_ids
    assert len(out) > len(prompts[0])


def test_conflicting_signatures_rejected(model, prompts):
    eng = _batched_host(model)
    g1 = GenerationConfig(max_new_tokens=8, max_cache_len=MAX_CACHE,
                          greedy=False, temperature=0.8)
    g2 = GenerationConfig(max_new_tokens=8, max_cache_len=MAX_CACHE,
                          greedy=False, temperature=0.5)
    eng.add_request(prompts[0], g1)
    eng.add_request(prompts[1], g2)
    with pytest.raises(ValueError, match="signature"):
        eng.run()
