"""Token-Recycle drafter: trainless model-based tree drafts.

Harvests the top-K next-token predictions for every token position the target
model ever scored (prefill + every verify block) and fills a static draft tree
with them: the i-th child of a node holds the rank-i prediction for the node's
token.  Reference: /root/reference/samd/tree_model/token_recycle/token_recycle.py.

TPU-native changes:
  * The token→top-K map is a dense ``[vocab, K]`` int32 numpy array plus a
    seen-bitmap, not a Python dict — updates are vectorized slice-assignments
    of the device-computed top-K harvest, ~free on the host.
  * The static tree's mask/positions/retrieve buffers are built once, padded
    to the engine's static (M, R, D); only the token vector changes per step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..ops.treeops import pack_draft_host
from .base import Draft
from .tree_topology import child_ranks, rank_probability_tree

TOPK = 8


class TokenRecycleDrafter:
    wants_harvest = True

    def __init__(self, vocab_size: int, *, parents: Optional[np.ndarray] = None,
                 max_nodes: int, max_paths: int = 0, max_depth: int = 0,
                 topk: int = TOPK):
        self.vocab_size = vocab_size
        self.topk = topk
        if parents is None:
            parents = rank_probability_tree(min(61, max_nodes),
                                            branching=topk)
        self.parents = parents
        self.children = child_ranks(parents)
        self.num_nodes = len(parents)
        # Static topology: pack once, rewrite only the token row per step.
        self._packed = pack_draft_host(
            np.zeros(self.num_nodes, np.int32), parents, max_nodes)
        self._cache = np.zeros((vocab_size, topk), dtype=np.int32)
        self._seen = np.zeros(vocab_size, dtype=bool)

    def reset(self) -> None:
        # Reference TokenRecycle.reset keeps its cache across requests
        # (/root/reference/samd/tree_model/token_recycle/token_recycle.py:33).
        pass

    def clear(self) -> None:
        self._cache[:] = 0
        self._seen[:] = False

    def harvest(self, tokens: np.ndarray, topk: np.ndarray) -> None:
        """tokens: [T] int; topk: [T, K] int — from prefill or verify logits."""
        t = np.asarray(tokens, dtype=np.int64)
        self._cache[t] = topk[:len(t), :self.topk]
        self._seen[t] = True

    # --- Drafter protocol -------------------------------------------------
    def observe_prompt(self, tokens: Sequence[int],
                       topk: Optional[np.ndarray] = None) -> None:
        if topk is not None:
            self.harvest(np.asarray(tokens), topk)

    def observe_accepted(self, tokens: Sequence[int]) -> None:
        pass

    def observe_verify(self, block_tokens: np.ndarray, block_topk: np.ndarray,
                       num_nodes: int) -> None:
        self.harvest(block_tokens[:num_nodes], block_topk[:num_nodes])

    def lookup(self, start_token: int) -> Draft:
        tokens = self.fill_tree(start_token)
        packed = self._packed.copy()
        packed[0, :self.num_nodes] = tokens
        return Draft(packed=packed, num_nodes=self.num_nodes,
                     source="token_recycle")

    def fill_tree(self, start_token: int) -> np.ndarray:
        tokens = np.zeros(self.num_nodes, dtype=np.int32)
        tokens[0] = start_token
        for node in range(self.num_nodes):
            tok = tokens[node]
            if not self._seen[tok]:
                continue
            preds = self._cache[tok]
            for rank, child in enumerate(self.children[node]):
                tokens[child] = preds[rank]
        return tokens
