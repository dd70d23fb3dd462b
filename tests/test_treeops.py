"""In-jit tree-buffer construction must match the host (numpy) reference."""

import numpy as np

import jax
import jax.numpy as jnp

from samd_tpu.ops.treeops import (
    depths_from_parents,
    pack_draft_host,
    paths_from_parents,
    tree_mask_from_parents,
    unpack_draft,
)
from samd_tpu.sam.trees import ancestor_closure, leaf_paths, node_depths


def tree():
    return np.array([-1, 0, 0, 0, 1, 1, 3], dtype=np.int32)


def test_mask_matches_numpy():
    p = tree()
    got = np.asarray(jax.jit(tree_mask_from_parents)(jnp.asarray(p)))
    assert (got == ancestor_closure(p)).all()


def test_depths_match_numpy():
    p = tree()
    got = np.asarray(jax.jit(depths_from_parents)(jnp.asarray(p)))
    assert (got == node_depths(p)).all()


def test_paths_cover_all_nodes():
    p = tree()
    depths = node_depths(p)
    got = np.asarray(paths_from_parents(
        jnp.asarray(p), jnp.asarray(depths), 4))
    # row i ends at node i and walks the ancestor chain
    assert got[4].tolist() == [0, 1, 4, -1]
    assert got[6].tolist() == [0, 3, 6, -1]
    assert got[0].tolist() == [0, -1, -1, -1]
    # leaf rows reproduce the numpy leaf enumeration
    numpy_paths = leaf_paths(p, pad_to_depth=4)
    for row in numpy_paths:
        leaf = max(r for r in row if r >= 0)
        assert got[leaf].tolist() == row.tolist()


def test_padding_self_parent_isolated():
    packed = pack_draft_host([5, 6], [-1, 0], max_nodes=4)
    assert packed[1].tolist() == [-1, 0, 2, 3]
    tokens, mask, depths, paths = jax.jit(
        lambda d: unpack_draft(d, 4))(jnp.asarray(packed))
    mask = np.asarray(mask)
    # padding nodes see only themselves
    assert mask[2].tolist() == [False, False, True, False]
    assert mask[3].tolist() == [False, False, False, True]
    # real chain is causal
    assert mask[1].tolist() == [True, True, False, False]
    paths = np.asarray(paths)
    assert paths[1].tolist() == [0, 1, -1, -1]
    # padding rows are self-only paths
    assert paths[2].tolist()[0] == 2


def test_random_trees_match_numpy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(2, 20))
        parents = np.full(n, -1, np.int32)
        for i in range(1, n):
            parents[i] = rng.integers(0, i)
        jp = jnp.asarray(parents)
        mask = np.asarray(tree_mask_from_parents(jp))
        assert (mask == ancestor_closure(parents)).all()
        depths = np.asarray(depths_from_parents(jp))
        assert (depths == node_depths(parents)).all()
        D = int(depths.max()) + 1
        paths = np.asarray(paths_from_parents(jp, jnp.asarray(depths), D))
        for i in range(n):
            expect = []
            x = i
            while x != -1:
                expect.append(x)
                x = int(parents[x])
            expect = expect[::-1] + [-1] * (D - len(expect))
            assert paths[i].tolist() == expect
