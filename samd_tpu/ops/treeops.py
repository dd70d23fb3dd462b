"""In-jit draft-tree buffer construction from a parent-index vector.

The host→device interface for a draft is just two int32 vectors — ``tokens``
and ``parents`` — packed into one array.  The attention mask (ancestor
closure), node depths, and root→node retrieval paths are derived *inside* the
jitted step.  Rationale:

  * One small h2d transfer per decode step instead of four (tokens, [M,M]
    mask, positions, [R,D] retrieve): on pod/tunnel deployments each transfer
    is an RPC, and the reference's per-step host work building these buffers
    (/root/reference/samd_sam_only/sam/dyn_sam.py:123-155) disappears.
  * All ops are O(M·D) vector gathers/scans over tiny arrays — free next to
    the model forward.

Padding convention: padding node *i* has ``parents[i] == i`` (self-parent),
giving it a self-only mask row, and sits after all real nodes.  Real nodes
obey ``parents[i] < i`` (parents precede children), ``parents[0] == -1``.

Retrieval rows exist for EVERY node (row *i* = root→*i* path), not only
leaves.  An internal node's row is a strict prefix of its leaf extensions, so
it can never strictly win acceptance, and equal-length winners carry
identical token sequences (matching the argmax chain pins the tokens), so
output equality is preserved while the leaf-enumeration step disappears.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def tree_mask_from_parents(parents: jax.Array) -> jax.Array:
    """[M] int32 -> [M, M] bool ancestor-closure mask (self included)."""
    M = parents.shape[0]
    eye = jnp.eye(M, dtype=bool)

    def step(mask, i):
        p = parents[i]
        parent_row = jnp.where(p >= 0, mask[jnp.maximum(p, 0)],
                               jnp.zeros((M,), bool))
        row = parent_row | eye[i]
        return mask.at[i].set(row), None

    mask, _ = jax.lax.scan(step, jnp.zeros((M, M), bool), jnp.arange(M))
    return mask


def depths_from_parents(parents: jax.Array) -> jax.Array:
    """[M] int32 -> [M] int32 node depths (root = 0)."""
    M = parents.shape[0]

    def step(depth, i):
        p = parents[i]
        d = jnp.where(p >= 0, depth[jnp.maximum(p, 0)] + 1, 0)
        # self-parent padding nodes read their own (unwritten = 0) slot and
        # get depth 1 — harmless, they are masked out of acceptance.
        return depth.at[i].set(d), None

    depth, _ = jax.lax.scan(step, jnp.zeros((M,), jnp.int32), jnp.arange(M))
    return depth


def paths_from_parents(parents: jax.Array, depths: jax.Array,
                       max_depth: int) -> jax.Array:
    """[M] int32 -> [M, max_depth] int32: row i = node ids on the root→i
    path (padded with -1).  Requires depth(i) < max_depth for real nodes."""
    M = parents.shape[0]

    def step(anc, _):
        nxt = jnp.where(anc >= 0, parents[jnp.maximum(anc, 0)], -1)
        return nxt, anc

    # ancestors[k, i] = k-th ancestor of i (k=0 -> i itself), -1 past root
    _, ancestors = jax.lax.scan(step, jnp.arange(M, dtype=jnp.int32),
                                None, length=max_depth)          # [D, M]
    # path position j holds the ancestor at distance depth(i) - j
    j = jnp.arange(max_depth)[None, :]                           # [1, D]
    dist = depths[:, None] - j                                   # [M, D]
    k = jnp.clip(dist, 0, max_depth - 1)
    rows = jnp.take_along_axis(ancestors.T, k, axis=1)           # [M, D]
    return jnp.where(dist >= 0, rows, -1).astype(jnp.int32)


def unpack_draft(draft: jax.Array, max_depth: int,
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """draft: [2, M] int32 (row 0 tokens, row 1 parents) →
    (tokens [M], tree_mask [M, M], position_ids/depths [M], paths [M, D])."""
    tokens, parents = draft[0], draft[1]
    mask = tree_mask_from_parents(parents)
    depths = depths_from_parents(parents)
    paths = paths_from_parents(parents, depths, max_depth)
    return tokens, mask, depths, paths


def pack_draft_host(tokens, parents, max_nodes: int):
    """Host-side packing (numpy) of a draft into the [2, M] device layout,
    padding with self-parent nodes."""
    import numpy as np

    n = len(tokens)
    if n > max_nodes:
        raise ValueError(f"draft has {n} nodes > max_nodes={max_nodes}")
    out = np.empty((2, max_nodes), np.int32)
    out[0, :n] = tokens
    out[0, n:] = 0
    out[1, :n] = parents
    out[1, n:] = np.arange(n, max_nodes)
    return out
