"""Automated near-tie audit for tree-engine greedy-equality misses.

Tree drafts are exact-in-exact-arithmetic only: a draft node's ancestors sit
at non-canonical cache columns during verify, so fp reduction order differs
from the oracle's and an argmax whose top-2 logits are within rounding
distance can flip (~1/500 steps on bf16 random weights — docs/EXACTNESS.md,
where the mechanism was isolated manually).  Round-2 verdict asked for the
automated version: when a bench output diverges from its block-AR oracle,
re-verify the divergent step on CANONICAL columns and measure the top-2
logit gap, so "expected near-tie behavior" becomes a measurement.

Per mismatch this reports:
  * ``gap``   — logit[oracle_tok] - logit[engine_tok] at the divergent
                position, from a canonical-column forward over the shared
                prefix.  A near-tie flip has |gap| within bf16 rounding of
                the logit magnitude; a real bug shows a large gap.
  * ``canonical_argmax`` and whether it lands on the oracle's or the
                engine's token (a third token with a large gap ⇒ bug).

``near_tie`` per miss = |gap| <= tau.  tau defaults to 0.08: bf16 has ~7.9
significand bits, so at the |logit| ~ 5-15 magnitudes these models produce,
one ulp through the matmul/softmax chain is ~0.03-0.06; measured flip gaps
in the manual experiment were < 0.01.  The canonical argmax is reported as
evidence but is deliberately NOT part of the classification: on random
weights 3+ tokens can cluster within rounding distance, so a *third* token
winning the canonical forward by another rounding-scale margin is itself
near-tie noise (observed in the first automated TPU run: oracle 16875 vs
engine 28523 vs canonical 17872, all within 0.018 logits).  A real bug
shows as a LARGE gap regardless of which token wins.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np


def first_divergence(a: Sequence[int], b: Sequence[int]) -> int:
    """Index of the first differing token; -1 if equal up to min length."""
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return -1


class NearTieAuditor:
    """Canonical-column logit probe, one compiled program per bucket."""

    def __init__(self, model_cfg, params, *, max_cache_len: int):
        self.cfg = model_cfg
        self.params = params
        self.S = max_cache_len
        self._fns = {}

    def _probe(self, P: int):
        import jax
        import jax.numpy as jnp

        from ..cache import init_kv_cache
        from ..models.llama import forward, prefill_mask

        cfg = self.cfg

        @jax.jit
        def probe(params, tokens, pos):
            kv_k, kv_v = init_kv_cache(cfg, 1, P)
            logits, *_ = forward(params, cfg, tokens[None],
                                 jnp.arange(P)[None, :], kv_k, kv_v,
                                 jnp.int32(0), prefill_mask(1, P, P))
            last = jax.lax.dynamic_index_in_dim(logits[0], pos, axis=0,
                                                keepdims=False)
            top2 = jax.lax.top_k(last, 2)
            return last, top2[0], top2[1]

        return probe

    def logits_at(self, prefix: Sequence[int]) -> Tuple[np.ndarray, float]:
        """Canonical-column logits for the next token after ``prefix``."""
        import jax.numpy as jnp

        P = 1 << max(5, (len(prefix) - 1).bit_length())
        P = min(P, self.S)
        if P not in self._fns:
            self._fns[P] = self._probe(P)
        padded = np.zeros(P, np.int32)
        padded[:len(prefix)] = prefix
        last, top2v, top2i = self._fns[P](
            self.params, jnp.asarray(padded), jnp.int32(len(prefix) - 1))
        return np.asarray(last), np.asarray(top2v), np.asarray(top2i)

    def audit_pair(self, oracle_ids: Sequence[int],
                   engine_ids: Sequence[int], *, tau: float = 0.08) -> Dict:
        """Audit one (oracle, engine) output pair; no-op dict when equal."""
        i = first_divergence(oracle_ids, engine_ids)
        if i < 0:
            return {"diverged": False}
        o_tok, e_tok = int(oracle_ids[i]), int(engine_ids[i])
        last, top2v, top2i = self.logits_at(list(oracle_ids[:i]))
        gap = float(last[o_tok] - last[e_tok])
        canon = int(top2i[0])
        near_tie = abs(gap) <= tau
        return {
            "diverged": True, "pos": i, "oracle_tok": o_tok,
            "engine_tok": e_tok, "gap": round(gap, 5),
            "canonical_argmax": canon,
            "canonical_top2_gap": round(float(top2v[0] - top2v[1]), 5),
            "near_tie": bool(near_tie),
        }

    def audit(self, oracle_outs: Sequence[Sequence[int]],
              engine_outs: Sequence[Sequence[int]], *,
              tau: float = 0.08) -> Dict:
        """Audit every pair; returns {misses, near_tie_confirmed, details}.

        ``near_tie_confirmed`` is True when every divergence is a measured
        near-tie (and trivially when there are none)."""
        details: List[Dict] = []
        for o, e in zip(oracle_outs, engine_outs):
            r = self.audit_pair(o, e, tau=tau)
            if r["diverged"]:
                details.append(r)
        return {
            "misses": len(details),
            "near_tie_confirmed": all(d["near_tie"] for d in details),
            "details": details,
        }
