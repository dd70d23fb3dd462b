"""Typical- and nucleus-posterior acceptance (verify.typical_accept /
verify.nucleus_accept), the reference's alternative sampling-acceptance rules
(/root/reference/evaluation/model/token_recycle/utils.py:235-320).

Unlike speculative rejection sampling these rules are NOT distribution
preserving by design — they trade exactness for acceptance rate.  The
testable properties are the masks themselves:

  * typical: a drafted token is accepted iff its parent-node probability
    clears min(posterior_threshold, exp(-entropy) * posterior_alpha).
  * nucleus: a drafted token is accepted iff it equals the parent node's
    top-p sample; every emitted token lies in the parent's top-p support.
  * both: best row = longest accepted run, likelihood tie-break; bonus token
    sampled from the last accepted node.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.verify import nucleus_accept, typical_accept

V = 16


def peaked_logits(rows, peak_ids, scale=8.0):
    """[rows, V] logits strongly peaked at peak_ids[r]."""
    x = np.zeros((rows, V), np.float32)
    for r, p in enumerate(peak_ids):
        x[r, p] = scale
    return jnp.asarray(x)


def test_top_p_warp_matches_reference_semantics():
    """The top-p warp keeps exactly the smallest set of top tokens whose
    cumulative probability reaches top_p (HF TopPLogitsWarper semantics,
    reference evaluation/model/token_recycle/utils.py:245-260).  Regression:
    the round-3 threshold picked the smallest CUT logit (the global min),
    making the warp a no-op — every token stayed in the nucleus."""
    from samd_tpu.verify import _process_logits

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 50)).astype(np.float32) * 3
    for top_p in (0.3, 0.9):
        out = np.asarray(_process_logits(jnp.asarray(logits), 1.0, top_p, 0))
        for r in range(len(logits)):
            row = logits[r]
            idx = np.argsort(-row)
            pr = np.exp(row[idx] - row[idx].max())
            pr /= pr.sum()
            # keep iff preceding mass <= top_p (reference remove-then-shift
            # semantics; a token whose preceding mass EQUALS top_p stays)
            keep = (np.cumsum(pr) - pr) <= top_p
            expect = np.full_like(row, -np.inf)
            expect[idx[keep]] = row[idx[keep]]
            assert np.allclose(out[r], expect), (top_p, r)
            assert np.isfinite(out[r]).sum() == keep.sum()


# ---------------------------------------------------------------------------
# typical acceptance
# ---------------------------------------------------------------------------

def test_typical_accepts_confident_match():
    # node 0 confidently predicts token 3; draft proposes 3 at depth 1
    logits = peaked_logits(2, [3, 5])
    draft = jnp.asarray([7, 3], jnp.int32)
    retrieve = jnp.asarray([[0, 1]], jnp.int32)
    res = typical_accept(logits, draft, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0)
    assert int(res.accept_len) == 2
    assert int(res.accepted_tokens[1]) == 3
    # bonus comes from node 1's peaked distribution
    assert int(res.next_token) == 5


def test_typical_rejects_low_probability_token():
    logits = peaked_logits(2, [3, 5])   # low-entropy: threshold is tight
    draft = jnp.asarray([7, 9], jnp.int32)   # 9 has ~0 prob under node 0
    retrieve = jnp.asarray([[0, 1]], jnp.int32)
    res = typical_accept(logits, draft, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0)
    assert int(res.accept_len) == 1
    # bonus from the root's distribution
    assert int(res.next_token) == 3


def test_typical_entropy_loosens_threshold():
    # uniform (max-entropy) parent: exp(-entropy)*alpha ~ alpha/V << 1/V?
    # With V=16, exp(-log 16)*0.09 = 0.09/16 ≈ 0.0056 < uniform prob 0.0625,
    # so ANY drafted token passes under a uniform parent.
    logits = jnp.zeros((2, V), jnp.float32)
    draft = jnp.asarray([7, 11], jnp.int32)
    retrieve = jnp.asarray([[0, 1]], jnp.int32)
    res = typical_accept(logits, draft, retrieve, jax.random.PRNGKey(1),
                         temperature=1.0)
    assert int(res.accept_len) == 2


def test_typical_picks_longest_then_most_likely_row():
    # two paths: row 0 matches 0 deep (draft 9 vs peak 3), row 1 matches
    # 2 deep (node 0 peaks at 3 = node 2's draft, node 2 peaks at 5 =
    # node 3's draft)
    logits = peaked_logits(4, [3, 5, 5, 0])
    draft = jnp.asarray([7, 9, 3, 5], jnp.int32)  # nodes 0..3
    retrieve = jnp.asarray([[0, 1, -1], [0, 2, 3]], jnp.int32)
    res = typical_accept(logits, draft, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0)
    assert int(res.best_path) == 1
    assert int(res.accept_len) == 3


def test_typical_padded_rows_cannot_win():
    logits = peaked_logits(3, [3, 5, 2])
    draft = jnp.asarray([7, 3, 3], jnp.int32)
    # row 1 does not start at the root — must never win
    retrieve = jnp.asarray([[0, 1], [2, 2]], jnp.int32)
    res = typical_accept(logits, draft, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0)
    assert int(res.best_path) == 0


# ---------------------------------------------------------------------------
# nucleus acceptance
# ---------------------------------------------------------------------------

def test_nucleus_accepts_only_parent_sample():
    # parent node 0 is deterministic (peak 3 dominates at top_p=0.5):
    # draft 3 accepted, draft anything else rejected
    logits = peaked_logits(3, [3, 5, 6])
    retrieve = jnp.asarray([[0, 1], [0, 2]], jnp.int32)
    draft_hit = jnp.asarray([7, 3, 9], jnp.int32)
    res = nucleus_accept(logits, draft_hit, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0, top_p=0.5)
    assert int(res.accept_len) == 2
    assert int(res.accepted_tokens[1]) == 3

    draft_miss = jnp.asarray([7, 9, 11], jnp.int32)
    res = nucleus_accept(logits, draft_miss, retrieve, jax.random.PRNGKey(0),
                         temperature=1.0, top_p=0.5)
    assert int(res.accept_len) == 1


def test_nucleus_bonus_in_top_p_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, V)).astype(np.float32) * 3)
    draft = jnp.asarray([7, 0], jnp.int32)
    retrieve = jnp.asarray([[0, 1]], jnp.int32)
    top_p = 0.6

    def bonus_and_node(key):
        res = nucleus_accept(logits, draft, retrieve, key,
                             temperature=1.0, top_p=top_p)
        last = res.path_nodes[res.accept_len - 1]
        return res.next_token, last

    keys = jax.random.split(jax.random.PRNGKey(1), 512)
    toks, lasts = jax.vmap(bonus_and_node)(keys)
    from samd_tpu.verify import _process_logits

    warped = np.asarray(_process_logits(logits, 1.0, top_p, 0))
    for t, n in zip(np.asarray(toks), np.asarray(lasts)):
        assert np.isfinite(warped[n, t]), (t, n)


def test_nucleus_shared_parent_consistency():
    """Two children of one parent proposing the same token must agree
    (one sample per node, not per path)."""
    logits = jnp.zeros((3, V), jnp.float32)
    draft = jnp.asarray([7, 4, 4], jnp.int32)
    retrieve = jnp.asarray([[0, 1], [0, 2]], jnp.int32)
    for seed in range(16):
        res = nucleus_accept(logits, draft, retrieve,
                             jax.random.PRNGKey(seed),
                             temperature=1.0, top_p=1.0)
        # either both rows accept (same sample) or both reject; accept_len
        # tells which — there is no mixed state to observe, so just check
        # the result is well-formed and the accepted token is 4 when len==2
        if int(res.accept_len) == 2:
            assert int(res.accepted_tokens[1]) == 4


# ---------------------------------------------------------------------------
# engine integration: accept_mode runs end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,knobs", [
    ("typical", dict(posterior_threshold=0.3, posterior_alpha=0.09)),
    ("nucleus", dict(top_p=0.9)),
])
def test_engine_accept_mode_generates(mode, knobs):
    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import SamdEngine
    from samd_tpu.models import init_params, tiny_config

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8)
    drafter = make_drafter(samd_cfg, cfg.vocab_size)
    eng = SamdEngine(cfg, params, samd_cfg, drafter, max_cache_len=128,
                     eos_token_id=-1, prefill_buckets=(32,))
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128,
                           greedy=False, temperature=0.8, accept_mode=mode,
                           **knobs)
    prompt = list(range(2, 18))
    out = eng.generate(prompt, gen)
    assert len(out.output_ids) > 0
    assert all(0 <= t < cfg.vocab_size for t in out.output_ids)
