"""Device-side n-gram hash index for corpus-scale fused retrieval.

The fused engines' brute-force corpus search (fused_sam.suffix_match) loads
the whole corpus buffer every step — fine below ~10^5 tokens, hopeless at the
reference's corpus scale (alpaca + code + gsm8k, millions of tokens;
/root/reference/tools/gen_sam_alpaca.py:19-44).  This module replaces the
scan with an index probe:

  * build (host, numpy, vectorized): for each gram size n in ``grams`` hash
    the n-gram ending at every corpus position into ``[num_buckets,
    bucket_cap]`` position tables, keeping the ``bucket_cap`` *earliest*
    positions per bucket (the automaton's longest-match tie-break is earliest
    end position — min_endpos, /root/reference/samd/sam/dyn_sam.py:99-105).
  * lookup (device, inside the jitted step): probe one bucket per gram size,
    gather the candidate end positions, score each with an exact backward
    token compare of up to ``max_ngram + ext`` tokens, and return the
    (longest, earliest) match — identical contract to
    ``fused_sam.suffix_match``.

Cost per step: O(len(grams) * bucket_cap * (max_ngram + ext)) corpus loads
(~10^4) regardless of corpus size — sub-millisecond at HBM bandwidth for
corpora of tens of millions of tokens.

Approximation vs the exact automaton: a bucket stores only ``bucket_cap``
positions, so on heavily repetitive corpora the true longest match can live
at an evicted position and the probe returns a shorter (or later) match.
Greedy outputs stay exactly the AR baseline's (verification); only accept
length can degrade.  Two mitigations (round-2 verdict #7; measured in
docs/PERFORMANCE.md "Indexed retrieval parity"):

  * **long grams** — gram sizes may exceed the engine's ``max_ngram``: the
    probe hashes over the full query+tail window (up to ``max_ngram + ext``
    tokens), so a 16/32-gram bucket disambiguates exactly the repetitions
    that overflow an 8-gram bucket.  This is the default mitigation
    (``FusedSamConfig.index_grams``).
  * **dual probe** (``keep_latest``) — per bucket an extra table keeps the
    LATEST positions too, doubling stored-position diversity for recency-
    skewed workloads.

``tests/test_ngram_index.py`` quantifies the divergence against the exact
automaton; ``evaluation/parity.py --indexed`` is the measurement harness.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Polynomial rolling-hash multiplier (odd => bijective mod 2^32 per step).
_MULT = np.uint32(2654435761)  # Knuth's multiplicative constant


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class NgramIndex:
    """Immutable device-resident index: one bucket table per gram size.

    Registered as a pytree so engines pass it INTO their jitted fused
    functions as a traced argument: a closure-captured index is inlined
    into the lowered module as dense literals — at reference corpus scale
    (1M tokens -> 4x ~32 MB tables) that blew the tunnel's remote-compile
    request body limit (HTTP 413, r05 dev run)."""

    grams: Tuple[int, ...]            # gram sizes, descending (e.g. 8, 4, 2, 1)
    bucket_cap: int
    tables: Tuple[jax.Array, ...]     # per gram: [num_buckets, cap] int32, -1 pad
    # optional dual-probe tables holding the LATEST positions per bucket
    latest_tables: Tuple[jax.Array, ...] = ()

    @property
    def num_candidates(self) -> int:
        per = self.bucket_cap * (2 if self.latest_tables else 1)
        return len(self.grams) * per

    def tree_flatten(self):
        return ((self.tables, self.latest_tables),
                (self.grams, self.bucket_cap))

    @classmethod
    def tree_unflatten(cls, aux, children):
        tables, latest_tables = children
        grams, bucket_cap = aux
        return cls(grams=grams, bucket_cap=bucket_cap,
                   tables=tuple(tables), latest_tables=tuple(latest_tables))


def _hash_ngrams_np(tokens: np.ndarray, n: int) -> np.ndarray:
    """uint32 polynomial hash of the n-gram ending at each position i >= n-1.

    Returns [len(tokens) - n + 1] hashes for end positions n-1 .. len-1."""
    N = len(tokens)
    h = np.zeros(N - n + 1, dtype=np.uint32)
    t = tokens.astype(np.uint32)
    for j in range(n):
        h = h * _MULT + t[j:N - n + 1 + j]
    return h


def build_ngram_index(corpus: Sequence[int], *,
                      grams: Sequence[int] = (8, 4, 2, 1),
                      bucket_cap: int = 8,
                      num_buckets: int = 0,
                      keep_latest: int = 0) -> NgramIndex:
    """Build the index on the host (vectorized numpy; ~linear in corpus size).

    num_buckets=0 picks next_pow2(len(corpus)) (load factor ~1).
    keep_latest>0 additionally stores, per bucket, the LATEST keep_latest
    positions (dual-probe mitigation for repetitive corpora)."""
    tokens = np.ascontiguousarray(corpus, dtype=np.int32)
    N = len(tokens)
    nb = num_buckets or max(_next_pow2(N), 1024)
    tables = []
    latest = []
    for n in sorted(set(int(g) for g in grams), reverse=True):
        table = np.full((nb, bucket_cap), -1, np.int32)
        ltable = np.full((nb, keep_latest), -1, np.int32) if keep_latest \
            else None
        if N >= n:
            h = _hash_ngrams_np(tokens, n)
            buckets = (h & np.uint32(nb - 1)).astype(np.int64)
            pos = np.arange(n - 1, N, dtype=np.int64)
            # positions are already ascending; stable sort by bucket keeps
            # earliest-first order within each bucket
            order = np.argsort(buckets, kind="stable")
            sb, sp = buckets[order], pos[order]
            starts = np.searchsorted(sb, np.arange(nb))
            rank = np.arange(len(sb)) - starts[sb]
            keep = rank < bucket_cap
            table[sb[keep], rank[keep]] = sp[keep].astype(np.int32)
            if keep_latest:
                counts = np.searchsorted(sb, np.arange(nb), side="right") \
                    - starts
                from_end = counts[sb] - 1 - rank
                keep_l = from_end < keep_latest
                ltable[sb[keep_l], from_end[keep_l]] = \
                    sp[keep_l].astype(np.int32)
        tables.append(jnp.asarray(table))
        if keep_latest:
            latest.append(jnp.asarray(ltable))
    gs = tuple(sorted(set(int(g) for g in grams), reverse=True))
    return NgramIndex(grams=gs, bucket_cap=bucket_cap, tables=tuple(tables),
                      latest_tables=tuple(latest))


def _hash_window_jnp(win: jax.Array, n: int) -> jax.Array:
    """Hash of the n-gram ending at the newest token.  ``win``/[W] is
    NEWEST-first (win[0] = newest); the hash accumulates oldest-first to
    match ``_hash_ngrams_np``."""
    h = jnp.uint32(0)
    mult = jnp.uint32(_MULT)
    for j in range(n):
        h = h * mult + win[n - 1 - j].astype(jnp.uint32)
    return h


def indexed_suffix_match(corpus: jax.Array, corpus_len: jax.Array,
                         index: NgramIndex, query: jax.Array,
                         tail: jax.Array, tail_len: jax.Array, *,
                         max_ngram: int, ext: int
                         ) -> Tuple[jax.Array, jax.Array]:
    """Index-probed longest-suffix match; same contract as
    ``fused_sam.suffix_match``: returns (match_len, end_pos), end_pos the
    earliest stored end index of a longest match, match capped at
    ``max_ngram + ext``.

    query: [Q] trailing window, -1 left-padded, query[-1] = start token.
    tail:  [ext] tokens preceding the window (newest last, -1 padded).
    Gram sizes may exceed ``max_ngram`` (up to ``max_ngram + ext``): their
    hashes draw from the tail window too."""
    Q = max_ngram
    W = Q + ext
    L = corpus.shape[0]

    # newest-first comparison window: win[0] = start token, win[j] = the
    # token j steps back in history; -1 marks exhausted history
    win_q = query[::-1]                              # newest-first, [Q]
    tail_rev = tail[::-1]                            # newest-first, [ext]
    tail_valid = jnp.arange(ext) < tail_len
    win = jnp.concatenate([win_q, jnp.where(tail_valid, tail_rev, -1)])

    # candidate end positions from every gram table (one bucket probe per
    # table).  a probe is valid only when the window has n live tokens.
    live = jnp.sum((win >= 0).astype(jnp.int32))
    cands = []
    for i, n in enumerate(index.grams):
        if n > W:
            continue  # cannot verify past the window; skip (build-time lint)
        h = _hash_window_jnp(win, n)
        for table in (index.tables[i],) + (
                (index.latest_tables[i],) if index.latest_tables else ()):
            nb = table.shape[0]
            bucket = (h & jnp.uint32(nb - 1)).astype(jnp.int32)
            c = table[bucket]                        # [cap]
            cands.append(jnp.where(live >= n, c, -1))
    e = jnp.concatenate(cands)                       # [C]

    # exact backward compare: corpus[e - j] vs win[j]
    j = jnp.arange(W)
    pos = e[:, None] - j[None, :]                    # [C, W]
    toks = corpus[jnp.clip(pos, 0, L - 1)]
    ok = (toks == win[None, :]) & (pos >= 0) & (win[None, :] >= 0) & \
        (e[:, None] >= 0) & (e[:, None] < corpus_len)
    run = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)   # [C]

    best_len = jnp.max(run)
    # earliest end position among the longest matches
    e_key = jnp.where((run == best_len) & (best_len > 0), e, jnp.int32(2**30))
    end = jnp.min(e_key)
    end = jnp.where(best_len > 0, end, 0).astype(jnp.int32)
    return best_len.astype(jnp.int32), end
