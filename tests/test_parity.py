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


def test_dense_grams_restore_adversarial_agreement():
    """Round-2 verdict #7: sparse grams (8,4,2,1) degraded to ~0.76 match
    agreement on repetitive corpora (short matches of length 3/5/6/7 fell
    between gram sizes).  Dense coverage (every size 1..max_ngram) serves
    each length from its own bucket: agreement must be ~1 even at cap 8."""
    corpus, traj = make_workload(seed=2, vocab=8)  # heavy repetition
    sparse = build_ngram_index(corpus, bucket_cap=8, grams=(8, 4, 2, 1))
    dense = build_ngram_index(corpus, bucket_cap=8,
                              grams=(32, 16, 8, 7, 6, 5, 4, 3, 2, 1))
    rep_s = parity_report(corpus, traj, index=sparse)
    rep_d = parity_report(corpus, traj, index=dense)
    assert rep_d["match_agreement"] >= 0.95
    assert rep_d["match_agreement"] >= rep_s["match_agreement"]
    assert rep_d["mean_draft_len_delta"] <= 0.05


def test_dual_probe_tables():
    """keep_latest adds LATEST-position tables; results remain exact-or-
    shorter and at least as good as the earliest-only probe."""
    corpus, traj = make_workload(seed=3, vocab=8)
    base = build_ngram_index(corpus, bucket_cap=4, grams=(8, 4, 2, 1))
    dual = build_ngram_index(corpus, bucket_cap=4, grams=(8, 4, 2, 1),
                             keep_latest=4)
    rep_b = parity_report(corpus, traj, index=base)
    rep_d = parity_report(corpus, traj, index=dual)
    assert rep_d["match_agreement"] >= rep_b["match_agreement"]
    assert rep_d["mean_match_delta_capped"] >= 0.0  # never over-matches
