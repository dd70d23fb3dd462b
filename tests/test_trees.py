"""Tests for draft-tree buffer construction."""

import numpy as np
import pytest

from samd_tpu.sam.trees import (
    adjacency_to_parents,
    ancestor_closure,
    build_tree_buffers,
    chain_buffers,
    leaf_paths,
    node_depths,
    parents_to_adjacency,
)


def small_tree():
    #        0
    #      / | \
    #     1  2  3
    #    /|     |
    #   4 5     6
    return np.array([-1, 0, 0, 0, 1, 1, 3], dtype=np.int32)


def test_node_depths():
    assert node_depths(small_tree()).tolist() == [0, 1, 1, 1, 2, 2, 2]


def test_ancestor_closure():
    m = ancestor_closure(small_tree())
    assert m[4].tolist() == [True, True, False, False, True, False, False]
    assert m[0].tolist() == [True] + [False] * 6
    assert m[6, 3] and m[6, 0] and not m[6, 1]


def test_leaf_paths_natural_and_reversed():
    p = small_tree()
    natural = leaf_paths(p)
    assert natural.tolist() == [[0, 2, -1], [0, 1, 4], [0, 1, 5], [0, 3, 6]]
    rev = leaf_paths(p, reverse_leaf_order=True)
    assert rev.tolist() == [[0, 3, 6], [0, 1, 5], [0, 1, 4], [0, 2, -1]]


def test_build_tree_buffers_padding():
    tokens = [10, 11, 12, 13, 14, 15, 16]
    buf = build_tree_buffers(tokens, small_tree(), max_nodes=10, max_paths=6,
                             max_depth=5)
    assert buf.tokens.shape == (10,)
    assert buf.attn_mask.shape == (10, 10)
    assert buf.position_ids.shape == (10,)
    assert buf.retrieve_indices.shape == (6, 5)
    assert buf.num_nodes == 7
    # padding nodes: self-only mask, position 0, never retrieved
    assert buf.attn_mask[8, 8] and not buf.attn_mask[8, :8].any()
    assert (buf.retrieve_indices < 7).all()
    assert buf.tokens[7:].tolist() == [0, 0, 0]
    # rows beyond real leaves fully padded
    assert (buf.retrieve_indices[4:] == -1).all()


def test_chain_buffers_is_causal():
    buf = chain_buffers([5, 6, 7], max_nodes=5, max_depth=5)
    assert buf.position_ids[:3].tolist() == [0, 1, 2]
    m = buf.attn_mask[:3, :3]
    assert (m == np.tril(np.ones((3, 3), dtype=bool))).all()
    assert buf.retrieve_indices.shape == (1, 5)
    assert buf.retrieve_indices[0].tolist() == [0, 1, 2, -1, -1]


def test_adjacency_roundtrip():
    adj = [[1, 2, 3], [4, 5], [], [6], [], [], []]
    parents = adjacency_to_parents(adj)
    assert parents.tolist() == small_tree().tolist()
    assert parents_to_adjacency(parents) == adj


def test_overflow_raises():
    with pytest.raises(ValueError):
        build_tree_buffers([1, 2, 3], [-1, 0, 1], max_nodes=2, max_paths=2,
                           max_depth=5)
    with pytest.raises(ValueError):
        chain_buffers([1, 2, 3], max_nodes=5, max_depth=2)
