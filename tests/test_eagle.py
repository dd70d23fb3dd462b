"""EAGLE-2 drafter tests: net shapes, expansion validity, engine equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.drafters.eagle.drafter import make_eagle2
from samd_tpu.drafters.eagle.net import (
    EagleNetConfig,
    eagle_forward,
    init_eagle_kv,
    init_eagle_params,
)
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.models import init_params, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


def test_eagle_forward_shapes(setup):
    cfg, params = setup
    ecfg = EagleNetConfig.from_target(cfg)
    ep = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    kv_k, kv_v = init_eagle_kv(ecfg, 1, 32)
    T = 4
    embeds = jnp.ones((1, T, cfg.hidden_size))
    hidden = jnp.ones((1, T, cfg.hidden_size))
    pos = jnp.arange(T)[None]
    mask = jnp.ones((1, T, 32), bool)
    h, kv_k, kv_v = eagle_forward(ep, ecfg, embeds, hidden, pos, kv_k, kv_v,
                                  jnp.int32(0), mask)
    assert h.shape == (1, T, cfg.hidden_size)
    assert not bool(jnp.isnan(h).any())


def test_expand_produces_valid_tree(setup):
    cfg, params = setup
    samd_cfg = SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                          max_predicts=24, eagle_depth=3, eagle_topk=4,
                          eagle_total_tokens=15)
    drafter = make_eagle2(cfg, params, samd_cfg)
    # simulate prompt observation
    P = 6
    hidden = jax.random.normal(jax.random.PRNGKey(2),
                               (P, cfg.hidden_size))
    drafter.observe_prompt_hidden(list(range(3, 3 + P)), hidden)
    assert drafter.stable_len == P - 1

    draft = drafter.lookup(start_token=7)
    packed = np.asarray(draft.packed)
    assert packed.shape == (2, 24)
    tokens, parents = packed[0], packed[1]
    n = draft.num_nodes
    assert n == 16
    assert tokens[0] == 7 and parents[0] == -1
    # topological: parents precede children; padding is self-parented
    for i in range(1, n):
        assert 0 <= parents[i] < i
    for i in range(n, 24):
        assert parents[i] == i
    # deterministic
    packed2 = np.asarray(drafter.lookup(start_token=7).packed)
    assert (packed2 == packed).all()


def test_expand_scores_are_ancestor_closed(setup):
    """Every selected node's parent must be selected (structural invariant)."""
    cfg, params = setup
    samd_cfg = SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                          max_predicts=40, eagle_depth=4, eagle_topk=5,
                          eagle_total_tokens=30)
    drafter = make_eagle2(cfg, params, samd_cfg)
    hidden = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.hidden_size))
    drafter.observe_prompt_hidden([5, 6, 8, 9], hidden)
    for start in (3, 50, 100):
        packed = np.asarray(drafter.lookup(start).packed)
        parents = packed[1]
        for i in range(1, drafter.total + 1):
            assert 0 <= parents[i] < i


def test_hybrid_eagle2_engine_equality(setup):
    cfg, params = setup
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    samd_cfg = SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                          max_predicts=20, eagle_depth=3, eagle_topk=4,
                          eagle_total_tokens=15, n_predicts=12,
                          len_threshold=5, len_bias=5)
    engine = SamdEngine(
        cfg, params, samd_cfg,
        make_drafter(samd_cfg, cfg.vocab_size, model_cfg=cfg, params=params),
        max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    gen = GenerationConfig(max_new_tokens=40, max_cache_len=256)
    rng = np.random.default_rng(0)
    for seed in range(2):
        p = rng.integers(3, 128, size=18).tolist()
        ref = ar.generate(p, gen)
        out = engine.generate(p, gen)
        assert out.output_ids == ref.output_ids, f"seed {seed}"
    assert "eagle2" in engine.stats.source_counts


def test_eagle1_static_tree_equality(setup):
    cfg, params = setup
    from samd_tpu.drafters.eagle.eagle1 import make_eagle1
    from samd_tpu.drafters.sam_drafter import AdaptiveSelector

    samd_cfg = SamdConfig(draft_source="sam_hybrid", tree_method="eagle",
                          max_predicts=30, n_predicts=12,
                          len_threshold=5, len_bias=5)
    e1 = make_eagle1(cfg, params, samd_cfg)
    # levels contiguous after relabeling
    depths = e1.node_depths
    assert (np.diff(depths) >= 0).all()
    sel = AdaptiveSelector(samd_cfg, tree_drafter=e1)
    engine = SamdEngine(cfg, params, samd_cfg, sel, max_cache_len=256,
                        eos_token_id=-1, prefill_buckets=(32,))
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    rng = np.random.default_rng(1)
    p = rng.integers(3, 128, size=16).tolist()
    ref = ar.generate(p, gen)
    out = engine.generate(p, gen)
    assert out.output_ids == ref.output_ids
    assert "eagle" in engine.stats.source_counts
