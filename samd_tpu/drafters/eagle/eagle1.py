"""EAGLE-1 drafter: static choice-tree drafts from the one-layer draft net.

Reference (/root/reference/samd/tree_model/eagle/eagle_model.py:783-845):
the tree topology is fixed ahead of time (``tree_choices`` rank-paths,
config/eagle.json); drafting walks the tree level by level, filling each node
with the rank-r prediction of its parent's draft-net logits, feeding each
level through the draft net with per-level tree masks.

TPU-native: the topology is compile-time static, so the whole level loop
unrolls into one jitted program with constant gather/scatter indices and a
precomputed ancestor mask; output is the engine's packed [2, M] draft."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Draft
from ..tree_topology import child_ranks, rank_probability_tree
from ...sam.trees import ancestor_closure, node_depths
from .drafter import Eagle2Drafter
from .net import EagleNetConfig, eagle_forward, init_eagle_params


class Eagle1Drafter(Eagle2Drafter):
    """Shares the stable-KV machinery of Eagle2Drafter; only the expansion
    differs (static topology instead of score-selected)."""

    def __init__(self, net_params: Dict, net_cfg: EagleNetConfig,
                 embed_table, lm_head, *, max_nodes: int,
                 parents: Optional[np.ndarray] = None, topk: int = 4,
                 max_draft_cache: int = 2048,
                 extend_buckets: Sequence[int] = (16, 64, 128, 256, 512,
                                                 1024, 2048)):
        if parents is None:
            parents = rank_probability_tree(26, branching=topk)
        parents = np.asarray(parents, np.int32)
        # Relabel nodes in (depth, index) order so each level occupies a
        # contiguous slot range — the per-level KV writes are then single
        # dynamic_update_slices.
        d = node_depths(parents)
        order = np.lexsort((np.arange(len(parents)), d))
        new_pos = np.empty(len(parents), np.int32)
        new_pos[order] = np.arange(len(parents), dtype=np.int32)
        relabeled = np.full(len(parents), -1, np.int32)
        for i, p in enumerate(parents):
            if p >= 0:
                relabeled[new_pos[i]] = new_pos[p]
        self.parents_np = relabeled
        self.n_nodes = len(parents)
        if self.n_nodes > max_nodes:
            raise ValueError("topology larger than verify block")
        self.rank_topk = topk
        # child rank r of node p = rank-r suggestion of p's logits
        self.children = child_ranks(self.parents_np)
        self.node_depths = node_depths(self.parents_np)
        self.anc_mask_np = ancestor_closure(self.parents_np)
        super().__init__(net_params, net_cfg, embed_table, lm_head,
                         max_nodes=max_nodes, depth=int(self.node_depths.max()),
                         topk=topk, total_tokens=self.n_nodes - 1,
                         max_draft_cache=max_draft_cache,
                         extend_buckets=extend_buckets)

    def _build_expand(self):
        cfg, S = self.cfg, self.S
        N = self.n_nodes
        M = self.max_nodes
        K = self.rank_topk
        depths = self.node_depths
        max_depth = int(depths.max())
        # static per-level node index lists
        levels = [np.nonzero(depths == d)[0] for d in range(max_depth + 1)]
        parents_np = self.parents_np
        anc = self.anc_mask_np  # [N, N]
        # rank of each node among its parent's children
        rank = np.zeros(N, np.int32)
        for p, childs in enumerate(self.children):
            for r, c in enumerate(childs):
                rank[c] = r

        def head_logp(h):
            return jnp.dot(h, self.head, preferred_element_type=jnp.float32)

        @jax.jit
        def expand(params, embed, kv_k, kv_v, stable_len, last_hidden,
                   start_token):
            s_idx = jnp.arange(S)[None, :]
            tokens = jnp.zeros((N,), jnp.int32).at[0].set(start_token)
            hidden = jnp.zeros((N, cfg.hidden_size), cfg.dtype)
            # forward level by level (static unroll)
            for d in range(max_depth + 1):
                nodes = levels[d]
                if d > 0:
                    # fill this level's tokens from parent logits
                    par = parents_np[nodes]
                    lp = head_logp(hidden[par])            # [n_d, V]
                    topv = jax.lax.top_k(lp, K)[1]         # [n_d, K]
                    tokens = tokens.at[nodes].set(
                        topv[jnp.arange(len(nodes)), rank[nodes]]
                        .astype(jnp.int32))
                # draft-net forward for this level (prev hidden = parent's
                # draft hidden; root uses the target's last hidden state)
                if d == 0:
                    prev = last_hidden[None]
                else:
                    prev = hidden[parents_np[nodes]]
                # mask: prefix + static ancestors among tree slots
                rel = jnp.clip(s_idx - stable_len, 0, N - 1)
                in_tree = (s_idx >= stable_len) & (s_idx < stable_len + N)
                tree_m = jnp.asarray(anc[nodes])           # [n_d, N]
                tm = jnp.take_along_axis(
                    tree_m, jnp.broadcast_to(rel, (len(nodes), S)), axis=1)
                mask = ((s_idx < stable_len) | (in_tree & tm))[None]
                pos = (stable_len + d) * jnp.ones((1, len(nodes)), jnp.int32)
                h, kv_k, kv_v = eagle_forward(
                    params, cfg, embed[tokens[nodes]][None], prev[None], pos,
                    kv_k, kv_v, stable_len + int(nodes[0]), mask)
                hidden = hidden.at[nodes].set(h[0].astype(cfg.dtype))
            packed = jnp.stack([
                jnp.concatenate([tokens, jnp.zeros((M - N,), jnp.int32)]),
                jnp.concatenate([jnp.asarray(parents_np),
                                 jnp.arange(N, M, dtype=jnp.int32)]),
            ])
            return packed, kv_k, kv_v

        return expand

    def lookup(self, start_token: int) -> Draft:
        packed, self.kv_k, self.kv_v = self._expand_fn(
            self.params, self.embed, self.kv_k, self.kv_v,
            jnp.int32(self.stable_len), self.last_hidden,
            jnp.int32(start_token))
        return Draft(packed=packed, num_nodes=self.n_nodes, source="eagle")


def make_eagle1(model_cfg, params, samd_cfg, *, net_params=None,
                key=None) -> Eagle1Drafter:
    net_cfg = EagleNetConfig.from_target(model_cfg)
    if net_params is None:
        net_params = init_eagle_params(
            net_cfg, key if key is not None else jax.random.PRNGKey(7))
    head = (params["embed"].T if model_cfg.tie_embeddings
            else params["lm_head"])
    parents = None
    if samd_cfg.tree_adjacency is not None:
        from ...sam.trees import adjacency_to_parents
        parents = adjacency_to_parents(samd_cfg.tree_adjacency)
    return Eagle1Drafter(net_params, net_cfg, params["embed"], head,
                         max_nodes=samd_cfg.max_predicts, parents=parents)
