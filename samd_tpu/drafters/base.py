"""Drafter interface for the host side of the decode loop.

A drafter consumes the token stream (prompt + accepted generations) and the
per-step verify feedback, and produces padded static-shape draft buffers for
the next jitted verify step.  This generalizes the reference's ``DraftModel``
(/root/reference/samd/draft.py) and ``TreeModel``
(/root/reference/samd/tree_model/tree.py) into one protocol.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Protocol, Sequence

import numpy as np


@dataclass(frozen=True)
class Draft:
    """A drafter's proposal for one verify step, in the packed device layout:
    ``packed[0]`` = node tokens, ``packed[1]`` = parent indices (-1 for the
    root, self-parent for padding nodes).  The attention mask, positions and
    retrieval paths are derived from this on-device (samd_tpu.ops.treeops)."""
    packed: np.ndarray  # [2, M] int32
    num_nodes: int
    source: str  # e.g. "sam_dyn", "sam_static", "token_recycle", "eagle2"


class Drafter(Protocol):
    """Host-side draft provider."""

    #: whether this drafter consumes the [M, K] top-K verify harvest
    #: (fetching it costs a device→host transfer per step)
    wants_harvest: bool = False

    def reset(self) -> None:
        """Start a new request."""

    def observe_prompt(self, tokens: Sequence[int],
                       topk: Optional[np.ndarray] = None) -> None:
        """Prompt tokens after prefill; ``topk`` is the [len(tokens), K]
        per-position top-k token harvest from the prefill logits."""

    def observe_accepted(self, tokens: Sequence[int]) -> None:
        """Tokens committed this step (start token + accepted draft)."""

    def observe_verify(self, block_tokens: np.ndarray, block_topk: np.ndarray,
                       num_nodes: int) -> None:
        """Full verify-block feedback: the M draft-block tokens and their
        [M, K] top-k continuations from the verify logits (the Token-Recycle
        harvest, /root/reference/samd/tree_model/token_recycle/token_recycle.py:40-48).
        ``num_nodes`` bounds the real (non-padding) entries."""

    def lookup(self, start_token: int) -> Draft:
        """Produce the next draft given the sampled start token."""
