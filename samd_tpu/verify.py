"""Draft verification and acceptance, fully inside the jitted decode step.

Greedy path reproduces the reference protocol
(/root/reference/samd/utils.py:127-141): for every root→leaf path of the
draft tree, count the longest prefix where each drafted token equals the
model's argmax at its parent; accept the best path plus one bonus token.

TPU-first differences from the reference:
  * The reference gathers full-vocab logits per path
    (``tree_logits[retrieve_indices]`` → [R, D, V]) before comparing.  Here
    the per-node argmax ([M] ints) is computed once and *that* is gathered —
    no [R, D, V] tensor ever exists.
  * Everything is static-shape: padded retrieve rows are masked, outputs are
    fixed-size arrays + scalars, so acceptance lives inside one jit with the
    forward and the KV compaction.

Sampling path implements standard speculative rejection sampling along tree
paths (the reference's multinomial loop, /root/reference/samd/utils.py:142-184)
with a fixed trip count under ``lax``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AcceptResult(NamedTuple):
    best_path: jax.Array       # scalar int32 — winning retrieve row
    accept_len: jax.Array      # scalar int32 — #accepted tokens (>= 1)
    path_nodes: jax.Array      # [D] int32 — block-relative node ids of the
                               #   winning path (clamped where padded)
    accepted_tokens: jax.Array # [D] int32 — tokens along the winning path
    next_token: jax.Array      # scalar int32 — bonus token sampled from the
                               #   last accepted node's distribution
    next_logits: jax.Array     # [V] fp32 — that node's logits (for drafters
                               #   and for sampling-mode continuation)


def greedy_accept(logits: jax.Array, draft_tokens: jax.Array,
                  retrieve_indices: jax.Array) -> AcceptResult:
    """logits: [M, V] fp32; draft_tokens: [M] int32;
    retrieve_indices: [R, D] int32 (-1 padded)."""
    argmax_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [M]
    valid = retrieve_indices >= 0
    nodes = jnp.maximum(retrieve_indices, 0)                       # [R, D]
    cand = draft_tokens[nodes]                                     # [R, D]
    pred = argmax_tokens[nodes]                                    # [R, D]
    hit = (cand[:, 1:] == pred[:, :-1]) & valid[:, 1:]
    run = jnp.cumprod(hit.astype(jnp.int32), axis=1).sum(axis=1)   # [R]
    # Only rows anchored at the tree root are real paths (padding nodes'
    # rows start at themselves); they can never win.
    run = jnp.where(retrieve_indices[:, 0] == 0, run, -1)
    best = jnp.argmax(run).astype(jnp.int32)
    accept_len = (run[best] + 1).astype(jnp.int32)
    path_nodes = nodes[best]
    last_node = path_nodes[accept_len - 1]
    return AcceptResult(
        best_path=best,
        accept_len=accept_len,
        path_nodes=path_nodes,
        accepted_tokens=cand[best],
        next_token=argmax_tokens[last_node],
        next_logits=logits[last_node],
    )


def _top_p_threshold(logits: jax.Array, top_p: float) -> jax.Array:
    """Smallest KEPT logit of the nucleus (the minimal top set whose
    probability mass reaches ``top_p``), per row — WITHOUT the [M, V] sort +
    cumsum the textbook form pays (measured ~2 ms/step at [60, 32k] on v5e).

    Bisection on the probability cut: mass(probs >= t) is monotone in t, so
    repeated halving brackets the minimal cut, and the returned threshold
    snaps to an actual logit value (min logit of the kept set), which makes
    the result tie-inclusive exactly like the sorted form.  The bracket
    arithmetic runs in f32, so the bisection stalls once ``hi - lo``
    reaches f32 epsilon around the cut (~pmax·2^-24) — 24 iterations
    saturate it (more would be no-ops).  Near-ties inside that terminal
    bracket may keep one tie group more than the sorted form — same
    acceptance class as the bf16 near-tie caveat (docs/EXACTNESS.md).

    Boundary semantics match the reference exactly (token_recycle/
    utils.py:152-154: remove iff cumulative mass BEFORE the token exceeds
    top_p): a token whose preceding mass EQUALS top_p is KEPT, i.e. the
    kept set is the smallest top set whose mass strictly exceeds top_p —
    hence the strict ``>`` comparisons below."""
    probs = jax.nn.softmax(logits, axis=-1)
    lo = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)   # mass(>=0) = 1
    hi = jnp.max(probs, axis=-1, keepdims=True)            # keep argmax only

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                       keepdims=True)
        ok = mass > top_p                       # cut can rise to mid
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    # invariant: mass(probs >= lo) > top_p >= mass(probs >= hi) — except
    # when the argmax alone exceeds top_p, where hi itself is the answer
    pmax_ok = jnp.sum(jnp.where(probs >= hi, probs, 0.0), axis=-1,
                      keepdims=True) > top_p
    lo, _ = jax.lax.fori_loop(0, 24, body, (lo, hi))
    cut = jnp.where(pmax_ok, hi, lo)
    return jnp.min(jnp.where(probs >= cut, logits, jnp.inf), axis=-1,
                   keepdims=True)


def _process_logits(logits: jax.Array, temperature: float, top_p: float,
                    top_k: int) -> jax.Array:
    """Temperature / top-k / top-p warping (order follows the reference's
    LogitsProcessorList, /root/reference/samd/utils.py:50-63).  Static knobs;
    returns warped logits."""
    if temperature >= 1e-5 and temperature != 1.0:
        logits = logits / temperature
    if 1e-8 <= top_p < 1.0:
        # keep the smallest set whose cumulative prob EXCEEDS top_p (a
        # token is KEPT iff the mass strictly before it is <= top_p, so the
        # best token always survives — the reference's remove-then-shift
        # semantics) — round-4 fixes: the threshold used to take the
        # smallest CUT logit (the global min), making the warp a no-op; and
        # the sort+cumsum form is replaced by sort-free bisection
        threshold = _top_p_threshold(logits, top_p)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    if top_k > 0:
        # lax.top_k's partial selection beats the full [M, V] sort; the kth
        # value is identical, and `<` keeps boundary ties exactly as before
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return logits


def _path_tables(logits, draft_tokens, retrieve_indices):
    """Shared per-path gathers: (valid, nodes, cand, parent_nodes)."""
    valid = retrieve_indices >= 0
    nodes = jnp.maximum(retrieve_indices, 0)
    cand = draft_tokens[nodes]
    return valid, nodes, cand


def _best_row_result(logits_for_next, draft_tokens, retrieve_indices, mask,
                     likelihood, key):
    """Turn a per-(row, pos) acceptance mask into an AcceptResult.

    mask: [R, D-1] accept mask for positions 1..D-1; likelihood: [R, D-1]
    per-position log-prob (tie-break among max-run rows, highest likelihood
    first — reference fast-typical path,
    /root/reference/evaluation/model/token_recycle/utils.py:377-382)."""
    valid, nodes, cand = _path_tables(logits_for_next, draft_tokens,
                                      retrieve_indices)
    runm = jnp.cumprod(mask.astype(jnp.int32), axis=1)
    run = runm.sum(axis=1)                                      # [R]
    root_ok = retrieve_indices[:, 0] == 0
    run = jnp.where(root_ok, run, -1)
    best_run = jnp.max(run)
    lik = jnp.sum(jnp.where(runm > 0, likelihood, 0.0), axis=1)
    lik_key = jnp.where(run == best_run, lik, -jnp.inf)
    best = jnp.argmax(lik_key).astype(jnp.int32)
    accept_len = (jnp.maximum(best_run, 0) + 1).astype(jnp.int32)
    path_nodes = nodes[best]
    last_node = path_nodes[accept_len - 1]
    bonus = jax.random.categorical(key, logits_for_next[last_node]
                                   ).astype(jnp.int32)
    return AcceptResult(
        best_path=best, accept_len=accept_len, path_nodes=path_nodes,
        accepted_tokens=jnp.where(valid[best], cand[best], 0),
        next_token=bonus, next_logits=logits_for_next[last_node])


def typical_accept(logits: jax.Array, draft_tokens: jax.Array,
                   retrieve_indices: jax.Array, key: jax.Array, *,
                   temperature: float, posterior_threshold: float = 0.3,
                   posterior_alpha: float = 0.09) -> AcceptResult:
    """Typical-sampling acceptance (Medusa-style): accept a drafted token
    when its parent-node probability clears min(posterior_threshold,
    exp(-entropy) * posterior_alpha); among longest-run rows pick the
    highest-likelihood one; bonus token sampled from the last accepted
    node's tempered distribution.  Reference fast path:
    /root/reference/evaluation/model/token_recycle/utils.py:356-384."""
    warped = logits / jnp.maximum(temperature, 1e-5)
    probs = jax.nn.softmax(warped, axis=-1)                      # [M, V]
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-5), axis=-1)   # [M]
    thresh = jnp.minimum(posterior_threshold,
                         jnp.exp(-entropy) * posterior_alpha)    # [M]
    valid, nodes, cand = _path_tables(logits, draft_tokens, retrieve_indices)
    parent = nodes[:, :-1]                                       # [R, D-1]
    tok = jnp.maximum(cand[:, 1:], 0)
    cand_prob = probs[parent, tok]                               # [R, D-1]
    mask = (cand_prob > thresh[parent]) & valid[:, 1:]
    lik = jnp.log(jnp.maximum(cand_prob, 1e-20))
    return _best_row_result(warped, draft_tokens, retrieve_indices, mask,
                            lik, key)


def nucleus_accept(logits: jax.Array, draft_tokens: jax.Array,
                   retrieve_indices: jax.Array, key: jax.Array, *,
                   temperature: float, top_p: float) -> AcceptResult:
    """Nucleus (top-p) acceptance: sample one token per draft node from its
    top-p-warped distribution and accept a drafted child iff it equals its
    parent's sample.  Reference:
    /root/reference/evaluation/model/token_recycle/utils.py:235-290 (the
    reference samples independently per (path, depth); sampling once per
    *node* is the tree-consistent equivalent — shared parents give all their
    child paths the same draw)."""
    M = logits.shape[0]
    warped = _process_logits(logits / jnp.maximum(temperature, 1e-5),
                             1.0, top_p, 0)
    keys = jax.random.split(key, 2)
    sampled = jax.random.categorical(keys[0], warped, axis=-1
                                     ).astype(jnp.int32)          # [M]
    valid, nodes, cand = _path_tables(logits, draft_tokens, retrieve_indices)
    parent = nodes[:, :-1]
    mask = (cand[:, 1:] == sampled[parent]) & valid[:, 1:]
    probs = jax.nn.softmax(warped, axis=-1)
    lik = jnp.log(jnp.maximum(probs[parent, jnp.maximum(cand[:, 1:], 0)],
                              1e-20))
    return _best_row_result(warped, draft_tokens, retrieve_indices, mask,
                            lik, keys[1])


def make_accept_fn(sig: tuple):
    """Accept-rule factory for a ``GenerationConfig.sampling_signature``
    ``(temperature, top_p, top_k, accept_mode, posterior_threshold,
    posterior_alpha)`` → ``fn(logits, draft_tokens, retrieve, key)``.

    Shared by every engine that compiles one sampling step per signature
    (SamdEngine, BatchedSamdEngine, fused engines)."""
    temperature, top_p, top_k, mode, pthr, palpha = sig
    if mode == "typical":
        return functools.partial(typical_accept, temperature=temperature,
                                 posterior_threshold=pthr,
                                 posterior_alpha=palpha)
    if mode == "nucleus":
        return functools.partial(nucleus_accept, temperature=temperature,
                                 top_p=top_p)
    return functools.partial(sampling_accept, temperature=temperature,
                             top_p=top_p, top_k=top_k)


def sampling_accept(logits: jax.Array, draft_tokens: jax.Array,
                    retrieve_indices: jax.Array, key: jax.Array,
                    *, temperature: float, top_p: float,
                    top_k: int) -> AcceptResult:
    """Speculative rejection sampling over tree paths with static trip count.

    Follows the reference semantics (/root/reference/samd/utils.py:142-184):
    walk depth levels; at each level consider the distinct next tokens of the
    still-matching paths in row order, accept token x with prob p(x) (draft
    proposes deterministically, q=1), else zero it out and renormalize.  On
    the first rejection, sample the bonus token from the adjusted residual
    distribution; if every level accepted, sample from the last node's
    (warped) distribution.
    """
    R, D = retrieve_indices.shape
    V = logits.shape[-1]
    valid = retrieve_indices >= 0
    nodes = jnp.maximum(retrieve_indices, 0)
    cand = jnp.where(valid, draft_tokens[nodes], -1)               # [R, D]
    warped = _process_logits(logits, temperature, top_p, top_k)    # [M, V]
    keys = jax.random.split(key, D + 1)

    class Carry(NamedTuple):
        accept_len: jax.Array    # tokens accepted so far
        best: jax.Array          # row of the current accepted prefix
        alive: jax.Array         # [R] rows matching the accepted prefix
        done: jax.Array          # rejection happened (stop extending)
        residual: jax.Array      # [V] distribution to sample the bonus from
        use_residual: jax.Array  # bool — sample bonus from residual?

    def level(i, c: Carry):
        # distribution at the last accepted node of the current best path
        parent_node = nodes[c.best, i - 1]
        gtp = jax.nn.softmax(warped[parent_node])                  # [V]

        # candidate next tokens of alive rows at depth i, deduped in row order
        toks = cand[:, i]                                          # [R]
        row_ok = c.alive & valid[:, i]
        first_row = jnp.where(
            (toks[None, :] == toks[:, None]) & row_ok[None, :],
            jnp.arange(R)[None, :], R).min(axis=1)
        is_first = row_ok & (first_row == jnp.arange(R))

        def try_row(j, state):
            gtp_j, accepted, row, done_j, k = state
            tok = toks[j]
            consider = is_first[j] & ~accepted & ~done_j
            k, sub = jax.random.split(k)
            r = jax.random.uniform(sub)
            px = gtp_j[tok]
            take = consider & (r <= px)
            # rejection: zero out and renormalize
            gtp_rej = gtp_j.at[tok].set(0.0)
            gtp_rej = gtp_rej / jnp.maximum(gtp_rej.sum(), 1e-20)
            gtp_j = jnp.where(consider & ~take, gtp_rej, gtp_j)
            accepted = accepted | take
            row = jnp.where(take, j, row)
            return gtp_j, accepted, row, done_j, k

        gtp2, accepted, row, _, _ = jax.lax.fori_loop(
            0, R, try_row,
            (gtp, jnp.bool_(False), jnp.int32(0), c.done, keys[i]))

        any_candidate = jnp.any(is_first)
        step_active = ~c.done & any_candidate & (c.accept_len == i)

        new_best = jnp.where(step_active & accepted, row, c.best)
        new_alive = jnp.where(
            step_active & accepted,
            c.alive & (toks == toks[row]) & valid[:, i], c.alive)
        new_len = jnp.where(step_active & accepted, c.accept_len + 1,
                            c.accept_len)
        rejected_now = step_active & ~accepted
        new_done = c.done | rejected_now | ~any_candidate
        new_residual = jnp.where(rejected_now, gtp2, c.residual)
        new_use = jnp.where(rejected_now, True, c.use_residual)
        return Carry(new_len, new_best, new_alive, new_done, new_residual,
                     new_use)

    init = Carry(
        accept_len=jnp.int32(1), best=jnp.int32(0),
        alive=valid[:, 0] & (retrieve_indices[:, 0] == 0),
        done=jnp.bool_(False),
        residual=jnp.zeros((V,), jnp.float32), use_residual=jnp.bool_(False))
    c = jax.lax.fori_loop(1, D, level, init)

    last_node = nodes[c.best, c.accept_len - 1]
    final_dist = jnp.where(
        c.use_residual, c.residual, jax.nn.softmax(warped[last_node]))
    next_token = jax.random.categorical(
        keys[D], jnp.log(jnp.maximum(final_dist, 1e-20))).astype(jnp.int32)
    return AcceptResult(
        best_path=c.best,
        accept_len=c.accept_len,
        path_nodes=nodes[c.best],
        accepted_tokens=jnp.where(valid[c.best], cand[c.best], 0),
        next_token=next_token,
        next_logits=jnp.log(jnp.maximum(final_dist, 1e-20)),
    )
