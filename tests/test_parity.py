"""Retrieval-parity: fused windowed/indexed match == exact automaton.

Quantifies the divergence VERDICT r01 asked for: on identical trajectories
the windowed scan and the n-gram index must reproduce the exact automaton's
(match_len, end_pos) up to the window cap; and because the adaptive draft
length 1 + 4*match saturates at match=15 (< cap 64), the cap never shortens
a draft."""

import numpy as np
import pytest

pytest.importorskip("jax")

from samd_tpu.evaluation.parity import parity_report  # noqa: E402
from samd_tpu.ops.ngram_index import build_ngram_index  # noqa: E402


def make_workload(seed=0, corpus_size=4000, steps=150, vocab=64):
    rng = np.random.default_rng(seed)
    chunks = []
    while sum(len(c) for c in chunks) < corpus_size:
        doc = rng.integers(0, vocab, size=100).tolist()
        chunks.append(doc * int(rng.integers(1, 4)))
    corpus = [t for c in chunks for t in c][:corpus_size]
    traj = []
    while len(traj) < steps:
        if rng.random() < 0.5:
            s = int(rng.integers(0, len(corpus) - 60))
            traj += corpus[s:s + 30]
        else:
            traj += rng.integers(0, vocab, size=15).tolist()
    return corpus, traj[:steps]


def test_windowed_matches_exact_automaton():
    corpus, traj = make_workload()
    rep = parity_report(corpus, traj)
    assert rep["match_agreement"] == 1.0
    assert rep["match_and_end_agreement"] == 1.0
    assert rep["mean_draft_len_delta"] == 0.0


def test_indexed_matches_exact_automaton():
    corpus, traj = make_workload(seed=1)
    idx = build_ngram_index(corpus, bucket_cap=32)
    rep = parity_report(corpus, traj, index=idx)
    assert rep["match_agreement"] == 1.0
    assert rep["match_and_end_agreement"] == 1.0


def test_indexed_small_bucket_degrades_gracefully():
    """With tiny buckets on a repetitive corpus the index may return shorter
    matches, never longer/false ones; draft-length delta stays bounded."""
    corpus, traj = make_workload(seed=2, vocab=8)  # heavy repetition
    idx = build_ngram_index(corpus, bucket_cap=1)
    rep = parity_report(corpus, traj, index=idx)
    assert rep["mean_match_delta_capped"] >= 0.0  # only under-matches
    assert rep["match_agreement"] >= 0.5
