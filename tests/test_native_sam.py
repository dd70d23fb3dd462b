"""Parity tests: C++ SAM engine vs the Python reference implementation."""

import random

import numpy as np
import pytest

from samd_tpu.sam import SuffixAutomaton, build_corpus_sam
from samd_tpu.sam.native import NativeSuffixAutomaton, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def random_tokens(rng, n, vocab):
    return [rng.randrange(vocab) for _ in range(n)]


@pytest.mark.parametrize("vocab,n", [(3, 200), (16, 400), (1000, 400)])
def test_match_parity(vocab, n):
    rng = random.Random(vocab + n)
    text = random_tokens(rng, n, vocab)
    py = SuffixAutomaton()
    cc = NativeSuffixAutomaton()
    py.feed(text, grow=True)
    cc.feed(text, grow=True)
    assert cc.num_states == py.num_states
    assert len(cc) == len(py)
    py.reset_cursor()
    cc.reset_cursor()
    for t in random_tokens(rng, 100, vocab):
        assert cc.peek(t) == py.peek(t)
        py.advance_cursor(t)
        cc.advance_cursor(t)
        assert (cc.cur_state, cc.cur_length) == (py.cur_state, py.cur_length)


def test_sequence_draft_parity():
    rng = random.Random(5)
    text = random_tokens(rng, 300, 6)
    py = SuffixAutomaton()
    cc = NativeSuffixAutomaton()
    py.feed(text, grow=True)
    cc.feed(text, grow=True)
    for _ in range(50):
        probe = random_tokens(rng, rng.randrange(1, 8), 6)
        py.reset_cursor()
        cc.reset_cursor()
        py.feed(probe, grow=False)
        cc.feed(probe, grow=False)
        s = py.cur_state
        assert cc.cur_state == s
        for widen, pad in [(False, False), (True, True), (True, False)]:
            assert (cc.sequence_draft(s, 99, 12, widen=widen, pad=pad)
                    == py.sequence_draft(s, 99, 12, widen=widen, pad=pad))


def test_counts_and_tree_draft_parity():
    rng = random.Random(9)
    corpus = [random_tokens(rng, 80, 5) for _ in range(6)]
    py = build_corpus_sam(corpus, eos_token=0, topk=4)
    cc = NativeSuffixAutomaton(track_counts=True)
    cc.index_corpus(corpus, eos_token=0)
    cc.finalize_topk(4)
    py_arr = np.asarray(py._occ)
    cc_arr = cc.to_arrays()["occ"]
    assert (py_arr == cc_arr).all()
    for _ in range(30):
        probe = random_tokens(rng, rng.randrange(1, 6), 5)
        py.reset_cursor()
        cc.reset_cursor()
        py.feed(probe, grow=False)
        cc.feed(probe, grow=False)
        s = py.cur_state
        pt, pp = py.tree_draft(s, 42, 16, 4)
        ct, cp = cc.tree_draft(s, 42, 16, 4)
        assert ct == pt
        assert cp == pp


def test_serialization_cross_engine(tmp_path):
    """Arrays exported by C++ load into the Python engine and vice versa."""
    from samd_tpu.sam.serialize import from_arrays, to_arrays

    rng = random.Random(11)
    corpus = [random_tokens(rng, 60, 7) for _ in range(4)]
    cc = NativeSuffixAutomaton(track_counts=True)
    cc.index_corpus(corpus, eos_token=0)
    arrays = cc.to_arrays()

    py = from_arrays(arrays)
    py2 = build_corpus_sam(corpus, eos_token=0, topk=4)
    assert py.num_states == py2.num_states
    assert py._link == py2._link
    assert py._trans == py2._trans

    # python -> native
    cc2 = NativeSuffixAutomaton.from_arrays(to_arrays(py2))
    assert cc2.num_states == py2.num_states
    probe = random_tokens(rng, 40, 7)
    for t in probe:
        py2.advance_cursor(t)
        cc2.advance_cursor(t)
        assert (cc2.cur_state, cc2.cur_length) == (py2.cur_state, py2.cur_length)
    # imported native automaton can keep growing
    cc2.feed([1, 2, 3], grow=True)
    assert cc2.num_states >= py2.num_states


def test_native_in_engine_equality():
    """Full engine run with native SAMs matches the Python-SAM run."""
    import jax

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters.sam_drafter import AdaptiveSelector
    from samd_tpu.engine import SamdEngine
    from samd_tpu.models import init_params, tiny_config

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    prompt = random_tokens(random.Random(0), 20, 128)

    outs = []
    for dyn_cls in (SuffixAutomaton, NativeSuffixAutomaton):
        sel = AdaptiveSelector(samd_cfg)
        sel.dyn = dyn_cls(track_text=True, track_counts=False)
        eng = SamdEngine(cfg, params, samd_cfg, sel, max_cache_len=256,
                         eos_token_id=-1, prefill_buckets=(32,))
        outs.append(eng.generate(prompt, gen))
    assert outs[0].output_ids == outs[1].output_ids
    assert outs[0].accept_length_per_step == outs[1].accept_length_per_step


def test_sam_cursor_over_native_engine():
    """SamCursor (shared-corpus per-request cursors) must behave identically
    over the C++ engine and the Python engine."""
    from samd_tpu.sam import SamCursor

    rng = random.Random(21)
    corpus = [random_tokens(rng, 60, 6) for _ in range(4)]
    py = build_corpus_sam(corpus, eos_token=0, topk=4)
    cc = NativeSuffixAutomaton(track_counts=True)
    cc.index_corpus(corpus, eos_token=0)
    cc.finalize_topk(4)

    cur_py, cur_cc = SamCursor(py), SamCursor(cc)
    for t in random_tokens(rng, 80, 6):
        assert cur_cc.peek(t) == cur_py.peek(t)
        cur_py.advance_cursor(t)
        cur_cc.advance_cursor(t)
        assert (cur_cc.cur_state, cur_cc.cur_length) == \
            (cur_py.cur_state, cur_py.cur_length)
    s = cur_py.cur_state
    assert cur_cc.tree_draft(s, 9, 12, 4) == cur_py.tree_draft(s, 9, 12, 4)
    assert cur_cc.sequence_draft(s, 9, 8) == cur_py.sequence_draft(s, 9, 8)
