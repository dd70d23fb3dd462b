"""Statistical correctness of speculative rejection sampling.

The defining property of speculative sampling: the marginal distribution of
emitted tokens equals direct sampling from the target distribution, no matter
what the draft proposes.  Verified empirically over thousands of seeds
(vmapped), for chain and tree drafts, with and without temperature warping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.verify import _process_logits, sampling_accept

V = 8
N_TRIALS = 4000
TV_TOL = 0.05


def emitted_token(logits, draft_tokens, retrieve, key, **kw):
    """The token generated at position 1 (accepted draft or bonus)."""
    res = sampling_accept(logits, draft_tokens, retrieve, key, **kw)
    return jnp.where(res.accept_len >= 2, res.accepted_tokens[1],
                     res.next_token)


def total_variation(counts, probs):
    freq = counts / counts.sum()
    return 0.5 * np.abs(freq - probs).sum()


def run_trials(logits, draft_tokens, retrieve, **kw):
    keys = jax.random.split(jax.random.PRNGKey(0), N_TRIALS)
    toks = jax.vmap(lambda k: emitted_token(
        jnp.asarray(logits), jnp.asarray(draft_tokens),
        jnp.asarray(retrieve), k, **kw))(keys)
    return np.bincount(np.asarray(toks), minlength=V)


@pytest.mark.parametrize("draft_tok", [0, 3])  # likely vs unlikely proposal
def test_chain_draft_preserves_distribution(draft_tok):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, V)).astype(np.float32) * 2
    target = np.asarray(jax.nn.softmax(jnp.asarray(logits[0])))
    draft = np.asarray([5, draft_tok], np.int32)
    retrieve = np.asarray([[0, 1]], np.int32)
    counts = run_trials(logits, draft, retrieve,
                        temperature=1.0, top_p=0.0, top_k=0)
    assert total_variation(counts, target) < TV_TOL


def test_tree_draft_preserves_distribution():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, V)).astype(np.float32) * 2
    target = np.asarray(jax.nn.softmax(jnp.asarray(logits[0])))
    # two children of the root proposing different tokens
    draft = np.asarray([5, int(np.argmax(target)), 2], np.int32)
    retrieve = np.asarray([[0, 1], [0, 2]], np.int32)
    counts = run_trials(logits, draft, retrieve,
                        temperature=1.0, top_p=0.0, top_k=0)
    assert total_variation(counts, target) < TV_TOL


def test_temperature_warping_applies():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, V)).astype(np.float32) * 2
    temp = 0.5
    warped = np.asarray(_process_logits(jnp.asarray(logits[0]), temp, 0.0, 0))
    target = np.asarray(jax.nn.softmax(jnp.asarray(warped)))
    draft = np.asarray([5, 1], np.int32)
    retrieve = np.asarray([[0, 1]], np.int32)
    counts = run_trials(logits, draft, retrieve,
                        temperature=temp, top_p=0.0, top_k=0)
    assert total_variation(counts, target) < TV_TOL


def test_top_k_warping_restricts_support():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, V)).astype(np.float32) * 2
    k = 3
    top_ids = set(np.argsort(logits[0])[-k:].tolist())
    draft = np.asarray([5, 0], np.int32)
    retrieve = np.asarray([[0, 1]], np.int32)
    counts = run_trials(logits, draft, retrieve,
                        temperature=1.0, top_p=0.0, top_k=k)
    emitted = set(np.nonzero(counts)[0].tolist())
    assert emitted <= top_ids


def test_fused_chain_sampler_preserves_distribution():
    """chain_sampling_accept (fused engines) must also be
    distribution-preserving: the emitted token at position 1 is either the
    accepted draft token or the residual-sampled bonus."""
    from samd_tpu.fused_sam import chain_sampling_accept

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(3, V)).astype(np.float32) * 2)
    target = np.asarray(jax.nn.softmax(logits[0]))
    draft = jnp.asarray([5, 2, 6], jnp.int32)

    def emitted(key):
        alen, bonus = chain_sampling_accept(logits, draft, jnp.int32(3), key)
        return jnp.where(alen >= 2, draft[1], bonus)

    keys = jax.random.split(jax.random.PRNGKey(0), N_TRIALS)
    toks = jax.vmap(emitted)(keys)
    counts = np.bincount(np.asarray(toks), minlength=V)
    assert total_variation(counts, target) < TV_TOL
