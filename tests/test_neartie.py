"""Near-tie audit: divergences are classified by canonical-column logit gap."""

import jax
import numpy as np
import pytest

from samd_tpu.config import GenerationConfig
from samd_tpu.engine import ArBaseline
from samd_tpu.evaluation.neartie import NearTieAuditor, first_divergence
from samd_tpu.models import init_params, tiny_config


def test_first_divergence():
    assert first_divergence([1, 2, 3], [1, 2, 3]) == -1
    assert first_divergence([1, 2, 3], [1, 9, 3]) == 1
    assert first_divergence([1, 2], [1, 2, 3]) == -1  # prefix-equal


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    ar = ArBaseline(cfg, params, max_cache_len=128, eos_token_id=-1,
                    prefill_buckets=(32,))
    prompt = np.random.default_rng(3).integers(3, 128, size=16).tolist()
    out = ar.generate(prompt, GenerationConfig(max_new_tokens=24,
                                               max_cache_len=128))
    auditor = NearTieAuditor(cfg, params, max_cache_len=128)
    return auditor, out.output_ids, len(prompt)


def test_equal_outputs_audit_clean(setup):
    auditor, oracle, _ = setup
    r = auditor.audit([oracle], [list(oracle)])
    assert r["misses"] == 0 and r["near_tie_confirmed"] is True


def test_runner_up_divergence_measured(setup):
    """Engine committed the runner-up token: the audit's gap must equal the
    canonical top-2 gap, and the tie classification must follow tau."""
    auditor, oracle, plen = setup
    j = plen + 7
    _, top2v, top2i = auditor.logits_at(oracle[:j])
    assert int(top2i[0]) == oracle[j]   # canonical argmax = oracle's token
    engine = list(oracle)
    engine[j] = int(top2i[1])           # flip to the runner-up
    r = auditor.audit([oracle], [engine], tau=1e9)
    d = r["details"][0]
    assert d["pos"] == j and d["near_tie"] is True
    assert d["gap"] == pytest.approx(d["canonical_top2_gap"], abs=1e-4)
    # with a strict tau the same flip is NOT blessed as a near-tie
    r2 = auditor.audit([oracle], [engine], tau=1e-9)
    assert r2["near_tie_confirmed"] is False


def test_garbage_token_flagged_as_bug(setup):
    """A clearly-wrong committed token (large gap) must not be blessed."""
    auditor, oracle, plen = setup
    engine = list(oracle)
    j = plen + 3
    engine[j] = (oracle[j] + 7) % 128
    r = auditor.audit([oracle], [engine])
    assert r["misses"] == 1
    assert r["near_tie_confirmed"] is False
    assert abs(r["details"][0]["gap"]) > 0.08
