"""Property tests for the suffix-automaton engine against brute-force oracles.

The reference has no automated tests for its SAMs (SURVEY.md §4); these
property tests pin down the exact semantics the engine must provide:
longest-suffix matching, first-occurrence continuation retrieval, occurrence
counts, and frequency-tree drafting.
"""

import random

import numpy as np
import pytest

from samd_tpu.sam import (
    SuffixAutomaton,
    build_corpus_sam,
    load_sam,
    save_sam,
)


# ----------------------------------------------------------------------
# Brute-force oracles
# ----------------------------------------------------------------------

def brute_longest_suffix_match(text, query):
    """Length of the longest suffix of `query` occurring in `text`, and the
    end index (0-based, inclusive) of its first occurrence."""
    for length in range(len(query), 0, -1):
        suffix = query[-length:]
        for start in range(len(text) - length + 1):
            if text[start:start + length] == suffix:
                return length, start + length - 1
    return 0, -1


def brute_count(text, pattern):
    if not pattern:
        return 0
    return sum(
        1 for i in range(len(text) - len(pattern) + 1)
        if text[i:i + len(pattern)] == pattern
    )


def random_tokens(rng, n, vocab):
    return [rng.randrange(vocab) for _ in range(n)]


# ----------------------------------------------------------------------
# Matching
# ----------------------------------------------------------------------

@pytest.mark.parametrize("vocab,n", [(2, 60), (3, 120), (8, 200), (50, 200)])
def test_match_length_oracle(vocab, n):
    rng = random.Random(vocab * 1000 + n)
    text = random_tokens(rng, n, vocab)
    sam = SuffixAutomaton()
    sam.feed(text, grow=False)  # empty automaton: cursor stays at root
    assert sam.cur_length == 0

    sam.reset()
    sam.feed(text, grow=True)
    sam.reset_cursor()
    query = random_tokens(rng, 40, vocab)
    for i, t in enumerate(query):
        sam.advance_cursor(t)
        expect_len, _ = brute_longest_suffix_match(text, query[:i + 1])
        assert sam.cur_length == expect_len, f"mismatch at position {i}"


def test_online_growth_matches_self():
    # While growing over its own stream, the match length after each token is
    # the longest suffix of the prefix occurring in the prefix *excluding the
    # new token* (the cursor advances before extension: reference add_tokens,
    # /root/reference/samd/sam/dyn_sam.py:84-88).
    rng = random.Random(7)
    stream = random_tokens(rng, 150, 4)
    sam = SuffixAutomaton()
    for i, t in enumerate(stream):
        prev_text = stream[:i]
        sam.advance_cursor(t)
        expect_len, _ = brute_longest_suffix_match(prev_text, stream[:i + 1])
        assert sam.cur_length == expect_len
        sam.extend(t)


def test_peek_does_not_move_cursor():
    sam = SuffixAutomaton()
    sam.feed([1, 2, 3, 1, 2], grow=True)
    sam.reset_cursor()
    sam.feed([1, 2], grow=False)
    state, length = sam.peek(3)
    assert length == 3
    assert sam.cur_length == 2
    # peek again gives the same answer
    assert sam.peek(3) == (state, length)


def test_match_resets_to_root_on_unknown_token():
    sam = SuffixAutomaton()
    sam.feed([1, 1, 2, 1], grow=True)
    sam.reset_cursor()
    sam.feed([1, 2], grow=False)
    assert sam.cur_length == 2
    sam.advance_cursor(999)  # token never seen
    assert (sam.cur_state, sam.cur_length) == (0, 0)


# ----------------------------------------------------------------------
# Continuation retrieval (sequence drafts)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(5))
def test_continuation_is_valid_occurrence(seed):
    rng = random.Random(seed)
    text = random_tokens(rng, 300, 5)
    sam = SuffixAutomaton()
    sam.feed(text, grow=True)
    sam.reset_cursor()
    query = random_tokens(rng, 30, 5)
    for i, t in enumerate(query):
        sam.advance_cursor(t)
        if sam.cur_length == 0:
            continue
        # The matched suffix must actually occur ending at first_end.
        end = sam._first_end[sam.cur_state]
        L = sam.cur_length
        assert end - L + 1 >= 0
        assert text[end - L + 1:end + 1] == query[i + 1 - L:i + 1]
    # full-stream check: continuation after a known substring
    sub_start = rng.randrange(len(text) - 20)
    sub = text[sub_start:sub_start + 10]
    sam.reset_cursor()
    sam.feed(sub, grow=False)
    assert sam.cur_length >= 10 or sam.cur_length == 10
    _, first_end = brute_longest_suffix_match(text, sub)
    cont = sam.continuation(sam.cur_state, 5)
    # continuation comes from the first occurrence of the matched suffix
    L = sam.cur_length
    end = sam._first_end[sam.cur_state]
    assert text[end - L + 1:end + 1] == sub[-L:] if L <= len(sub) else True
    assert cont == text[end + 1:end + 6]


def test_sequence_draft_hybrid_semantics():
    # hybrid: widen via suffix links until n_predicts tokens remain, pad with 0
    text = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    sam = SuffixAutomaton()
    sam.feed(text, grow=True)
    sam.reset_cursor()
    sam.feed([7, 8], grow=False)
    draft = sam.sequence_draft(sam.cur_state, start_token=99, n_predicts=5,
                               widen=True, pad=True)
    assert draft[0] == 99
    assert len(draft) == 5
    assert draft[1:3] == [9, 10]
    assert draft[3:] == [0, 0]  # padded


def test_sequence_draft_widen_finds_earlier_occurrence():
    # match ends near the end of text; widening climbs to a shorter suffix
    # whose first occurrence has more continuation.
    text = [5, 1, 2, 3, 4, 9, 9, 9, 9, 1, 2, 3]
    sam = SuffixAutomaton()
    sam.feed(text, grow=True)
    sam.reset_cursor()
    sam.feed([1, 2, 3], grow=False)
    assert sam.cur_length == 3
    # Without widening, continuation after the *first* occurrence of [1,2,3]
    # (ends at index 4? no — first occurrence is positions 1..3, ends at 3).
    cont = sam.continuation(sam.cur_state, 4)
    assert cont == [4, 9, 9, 9]
    draft = sam.sequence_draft(sam.cur_state, 0, 5, widen=True, pad=True)
    assert draft == [0, 4, 9, 9, 9]


def test_sequence_draft_sam_only_no_padding():
    text = [1, 2, 3]
    sam = SuffixAutomaton()
    sam.feed(text, grow=True)
    sam.reset_cursor()
    sam.feed([2, 3], grow=False)
    draft = sam.sequence_draft(sam.cur_state, 42, 10, widen=False, pad=False)
    assert draft == [42]  # nothing follows the first occurrence of [2,3]


# ----------------------------------------------------------------------
# Occurrence counts + frequency trees
# ----------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(4))
def test_occurrence_counts_oracle(seed):
    rng = random.Random(100 + seed)
    text = random_tokens(rng, 200, 3)
    sam = SuffixAutomaton(track_counts=True)
    sam.feed(text, grow=True)
    # For every state, occ == number of occurrences of its longest string.
    for s in range(1, sam.num_states):
        L = sam._len[s]
        end = sam._first_end[s]
        pattern = text[end - L + 1:end + 1]
        assert sam._occ[s] == brute_count(text, pattern), f"state {s}"


def test_topk_transitions_ordered_by_count():
    corpus = [[1, 2, 3], [1, 2, 4], [1, 2, 3], [1, 5]]
    sam = build_corpus_sam(corpus, eos_token=0, topk=2)
    # From the state for "1 2", the most frequent next token is 3 (twice).
    sam.reset_cursor()
    sam.feed([1, 2], grow=False)
    top = sam._topk[sam.cur_state]
    assert top[0][0] == 3
    assert len(top) <= 2


def test_tree_draft_structure():
    corpus = [[1, 2, 3, 4], [1, 2, 3, 5], [1, 2, 6]] * 3
    sam = build_corpus_sam(corpus, eos_token=0, topk=8)
    sam.reset_cursor()
    sam.feed([1], grow=False)
    state, match = sam.peek(2)
    assert match == 2
    tokens, parents = sam.tree_draft(state, start_token=2, n_nodes=10, k=4)
    assert len(tokens) == len(parents) <= 10
    assert parents[0] == -1
    assert tokens[0] == 2
    # every parent precedes its child
    for i in range(1, len(parents)):
        assert 0 <= parents[i] < i
    # the highest-probability child of "1 2" is 3 (2/3 of continuations)
    assert tokens[1] == 3


def test_tree_draft_depth_budget():
    # chain corpus: deep tree; per-depth cap must hold
    corpus = [list(range(1, 30))] * 2
    sam = build_corpus_sam(corpus, eos_token=0, topk=8)
    tokens, parents = sam.tree_draft(0, start_token=1, n_nodes=20, k=1)
    from samd_tpu.sam.trees import node_depths
    depths = node_depths(np.asarray(parents))
    _, counts = np.unique(depths, return_counts=True)
    assert (counts <= 1).all()


# ----------------------------------------------------------------------
# Serialization
# ----------------------------------------------------------------------

def test_serialize_roundtrip(tmp_path):
    rng = random.Random(3)
    corpus = [random_tokens(rng, 50, 6) for _ in range(5)]
    sam = build_corpus_sam(corpus, eos_token=0, topk=4)
    path = tmp_path / "sam.npz"
    save_sam(sam, path)
    loaded = load_sam(path, topk=4)
    assert loaded.num_states == sam.num_states
    assert loaded.text == sam.text
    assert loaded._link == sam._link
    assert loaded._occ == sam._occ
    # behavioral equivalence on lookups
    query = random_tokens(rng, 30, 6)
    for t in query:
        sam.advance_cursor(t)
        loaded.advance_cursor(t)
        assert (sam.cur_state, sam.cur_length) == (loaded.cur_state, loaded.cur_length)
    # loaded automaton can keep growing
    loaded.extend(3)
    assert loaded.num_states >= sam.num_states


def test_reset_clears_index():
    sam = SuffixAutomaton()
    sam.feed([1, 2, 3], grow=True)
    sam.reset()
    assert sam.num_states == 1
    assert len(sam) == 0
    assert sam.peek(1) == (0, 0)
