"""Fused device-resident SAM-style retrieval decoding.

The host engines (samd_tpu.engine) implement the reference's exact suffix
automata with O(1)-amortized host walks — but every decode step then pays a
host↔device round trip.  This engine re-derives the *method* — longest-suffix
retrieval over (a) the request's own history and (b) a static corpus, with
first-occurrence continuations and adaptive draft length — as vectorized
device search, so retrieval, verification, acceptance and commit all run in
one ``lax.while_loop`` with zero per-step host traffic:

  * match: the last ``max_ngram`` tokens (ending in the start token) are
    compared against every buffer position with shifted equality + a
    trailing-run count (no [len, Q] materialization); the first position with
    the longest run wins (= first occurrence, like the automaton's
    ``min_endpos``).  Full-window hits are extended backwards up to ``ext``
    tokens, recovering long-match confidence for adaptive draft length.
  * policy: corpus match length is handicapped by ``len_bias`` and the
    dynamic match wins ties — the sam_only selector
    (/root/reference/samd_sam_only/draft.py:49-59); draft length is
    ``min(n_predicts, 1 + match·alpha)``
    (/root/reference/samd_sam_only/sam/dyn_sam.py:115-121).
  * verify/commit: chain verification identical to samd_tpu.pld.

The trade vs the exact automaton: matches are *detected* through a bounded
window (``max_ngram + ext``), which bounds the adaptive length, and the
corpus is searched brute-force (O(corpus) loads per step — at HBM bandwidth
that stays sub-millisecond below ~10^6 corpus tokens; beyond that, use the
host automaton engines).  Greedy outputs remain exactly the AR baseline's.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GenerationConfig
from .engine import Outputs, _bucket
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .streaming import ProgressStreamMixin


@dataclass(frozen=True)
class FusedSamConfig:
    max_ngram: int = 8        # match-window size Q
    ext: int = 56             # backward extension for full-window hits
    n_predicts: int = 59      # max draft continuation (block = +1)
    alpha: float = 4.0
    len_bias: int = 0
    steps_per_call: int = 256
    corpus_capacity: int = 1 << 15  # static corpus buffer size (one compile
                                    # serves any corpus up to this length)
    # n-gram hash index (ops/ngram_index.py): O(bucket) corpus probes instead
    # of the O(corpus) windowed scan — required at reference corpus scale
    # (millions of tokens, /root/reference/tools/gen_sam_alpaca.py:19-44)
    indexed: bool = False
    # DENSE gram coverage (every size 1..max_ngram) is the repetition
    # mitigation: an exact match of length m is served directly by the
    # m-gram bucket, where the old sparse (8,4,2,1) ladder pushed lengths
    # 3/5/6/7 through a shorter gram's earliest-cap candidates (which often
    # fail to extend on repetitive corpora).  Measured on the adversarial
    # workload (vocab 32, 200k corpus): 0.75 -> 1.00 match+end agreement,
    # draft-len delta 0.96 -> 0.0 (docs/PERFORMANCE.md parity table).
    # Sizes > max_ngram hash over the query+tail window (ngram_index).
    index_grams: Tuple[int, ...] = (32, 16, 8, 7, 6, 5, 4, 3, 2, 1)
    index_bucket_cap: int = 8
    # per-bucket extra table of LATEST positions (dual probe); 0 = off
    index_keep_latest: int = 0
    # per-request KV-cache buckets (ascending): each request allocates its
    # cache at the smallest bucket >= prompt + budget + block, so the XLA
    # attention's dot/softmax/read scale with the request's REACHABLE
    # length instead of the engine's max_cache_len.  Big-KV models
    # (7B-class, 16 KB/token) pay ~2.5-3.8 ms/step for a dead 1024-column
    # tail; a true smaller cache recovers it (an attention-window SLICE of
    # the big cache does not — XLA materializes the slice copy, measured
    # zero gain).  () = always max_cache_len.
    cache_buckets: Tuple[int, ...] = ()

    @property
    def block(self) -> int:
        return self.n_predicts + 1


def suffix_match(buffer: jax.Array, buf_len: jax.Array, query: jax.Array,
                 tail: jax.Array, tail_len: jax.Array, *, max_ngram: int,
                 ext: int) -> Tuple[jax.Array, jax.Array]:
    """Longest-suffix match of `query` (the [Q] trailing window, -1 padded on
    the left) in ``buffer[:buf_len]``.

    ``tail``/[ext] holds the tokens *preceding* the query window (newest
    last, -1 padded) for backward extension of full-window hits.
    Returns (match_len, end_pos) — end_pos is the first (earliest) end index
    of a longest match; match_len == 0 when nothing matches."""
    L = buffer.shape[0]
    Q = max_ngram
    idx = jnp.arange(L)
    # trailing-run count without materializing [L, Q]
    run = jnp.zeros((L,), jnp.int32)
    alive = jnp.ones((L,), bool)
    for j in range(Q - 1, -1, -1):
        # window position j aligns with buffer index i - (Q-1) + j
        shift = Q - 1 - j
        shifted = jnp.roll(buffer, shift)
        ok = (shifted == query[j]) & (query[j] >= 0) & (idx >= shift)
        alive = alive & ok
        run = run + alive.astype(jnp.int32)
    valid = idx < buf_len
    run = jnp.where(valid, jnp.minimum(run, idx + 1), 0)
    best_len = jnp.max(run)
    # first (earliest) end position among the longest matches
    is_best = run == best_len
    end = jnp.argmax(is_best & (best_len > 0)).astype(jnp.int32)
    # backward extension for full-window matches
    full = best_len >= jnp.minimum(Q, end + 1)
    eidx = end - Q - jnp.arange(ext)
    ecand = buffer[jnp.clip(eidx, 0, L - 1)]
    etail = tail[ext - 1 - jnp.arange(ext)]  # newest-first
    eok = (ecand == etail) & (eidx >= 0) & (etail >= 0) & \
        (jnp.arange(ext) < tail_len)
    extra = jnp.cumprod(eok.astype(jnp.int32)).sum()
    match = jnp.where(best_len > 0,
                      best_len + jnp.where(full & (best_len == Q), extra, 0),
                      0)
    return match.astype(jnp.int32), end




def chain_sampling_accept(warped: jax.Array, draft_tokens: jax.Array,
                          draft_len: jax.Array, key: jax.Array):
    """Speculative rejection sampling along a chain draft (deterministic
    proposal, q=1): accept token i w.p. p_i-1(token); on first rejection
    sample the bonus from the renormalized residual; if everything accepted,
    sample from the last accepted node's distribution.  Preserves the target
    distribution exactly (cf. verify.sampling_accept for trees).

    warped: [M, V] processed logits; returns (accept_len, bonus_token)."""
    M, V = warped.shape
    keys = jax.random.split(key, M + 1)

    def step(i, carry):
        alen, done, residual, use_res = carry
        active = (~done) & (i < draft_len) & (alen == i)
        p = jax.nn.softmax(warped[i - 1])
        tok = draft_tokens[i]
        u = jax.random.uniform(keys[i])
        accept = u <= p[tok]
        new_alen = jnp.where(active & accept, alen + 1, alen)
        rejected = active & ~accept
        res = p.at[tok].set(0.0)
        res = res / jnp.maximum(res.sum(), 1e-20)
        residual = jnp.where(rejected, res, residual)
        use_res = use_res | rejected
        done = done | rejected
        return new_alen, done, residual, use_res

    alen, done, residual, use_res = jax.lax.fori_loop(
        1, M, step,
        (jnp.int32(1), jnp.bool_(False), jnp.zeros((V,), jnp.float32),
         jnp.bool_(False)))
    final = jnp.where(use_res, residual,
                      jax.nn.softmax(warped[alen - 1]))
    bonus = jax.random.categorical(
        keys[M], jnp.log(jnp.maximum(final, 1e-20))).astype(jnp.int32)
    return alen, bonus


def chain_posterior_accept(logits: jax.Array, draft_tokens: jax.Array,
                           draft_len: jax.Array, key: jax.Array, *,
                           temperature: float, mode: str,
                           posterior_threshold: float = 0.3,
                           posterior_alpha: float = 0.09,
                           top_p: float = 0.0):
    """Typical/nucleus posterior acceptance along a chain draft — the chain
    specialization of verify.typical_accept / verify.nucleus_accept
    (reference evaluation/model/token_recycle/utils.py:235-320).

    Returns (accept_len, bonus_token); bonus sampled from the last accepted
    node's (warped) distribution."""
    from .verify import _process_logits

    M = logits.shape[0]
    warped = logits / jnp.maximum(temperature, 1e-5)
    if mode == "nucleus":
        warped = _process_logits(warped, 1.0, top_p, 0)
    probs = jax.nn.softmax(warped, axis=-1)                     # [M, V]
    k1, k2 = jax.random.split(key)
    pos = jnp.arange(M)
    tok = draft_tokens
    if mode == "typical":
        entropy = -jnp.sum(probs * jnp.log(probs + 1e-5), axis=-1)
        thresh = jnp.minimum(posterior_threshold,
                             jnp.exp(-entropy) * posterior_alpha)
        cand_p = probs[jnp.maximum(pos - 1, 0), tok]
        ok = cand_p > thresh[jnp.maximum(pos - 1, 0)]
    else:  # nucleus: accept iff the token equals the parent's top-p sample
        sampled = jax.random.categorical(k1, warped, axis=-1
                                         ).astype(jnp.int32)    # [M]
        ok = tok == sampled[jnp.maximum(pos - 1, 0)]
    ok = ok & (pos < draft_len)
    alen = jnp.cumprod(ok[1:].astype(jnp.int32)).sum() + 1
    bonus = jax.random.categorical(k2, warped[alen - 1]).astype(jnp.int32)
    return alen.astype(jnp.int32), bonus


def make_chain_accept_fn(sig: tuple):
    """(warped-or-raw logits [M,V], draft_tokens [M], draft_len, key) →
    (accept_len, bonus) for a GenerationConfig.sampling_signature."""
    from .verify import _process_logits

    temperature, top_p, top_k, mode, pthr, palpha = sig
    if mode == "typical":
        return functools.partial(
            chain_posterior_accept, temperature=temperature, mode="typical",
            posterior_threshold=pthr, posterior_alpha=palpha)
    if mode == "nucleus":
        return functools.partial(
            chain_posterior_accept, temperature=temperature, mode="nucleus",
            top_p=top_p)

    def rejection(logits, draft_tokens, draft_len, key):
        warped = _process_logits(logits, temperature, top_p, top_k)
        return chain_sampling_accept(warped, draft_tokens, draft_len, key)

    return rejection


class FusedSamEngine:
    def __init__(self, model_cfg: ModelConfig, params: Params,
                 fs_cfg: Optional[FusedSamConfig] = None, *,
                 corpus: Optional[Sequence[int]] = None,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.cfg = fs_cfg or FusedSamConfig()
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        from .fused_base import build_optional_index, load_corpus_buffer

        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        # retrieval state rides the fused call as a Partial ARGUMENT — a
        # closure-captured corpus/index would inline into the lowered
        # module (fused_base.make_retrieval_partial)
        from .fused_base import make_retrieval_partial

        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.block,
            corpus_index=self.corpus_index)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}
        self.stats_steps = 0
        self.stats_dyn = 0

    def _build_prefill(self, P: int, W: int):
        cfg = self.model_cfg

        @jax.jit
        def prefill(params, tokens, true_len):
            from .cache import init_kv_cache

            kv_k, kv_v = init_kv_cache(cfg, 1, W)
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, W))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return kv_k, kv_v, jnp.argmax(last).astype(jnp.int32), last

        return prefill

    def _build_fused(self, sig: Optional[tuple] = None,
                     window: Optional[int] = None):
        sampling = sig is not None
        accept = make_chain_accept_fn(sig) if sampling else None

        cfg, S = self.model_cfg, self.S
        # per-request cache bucket (cfg.cache_buckets): this program's KV
        # cache is [.., W, ..] — attention reads W columns, not the padded
        # max_cache_len (history stays full-S; it is int32-cheap)
        W = S if window is None or window >= S else window
        fc = self.cfg
        M = fc.block
        tri = jnp.tril(jnp.ones((M, M), bool))
        chain_pos = jnp.arange(M, dtype=jnp.int32)

        def make_draft(retrieve, history, hist_len, start):
            match, use_dyn, tokens, cont_avail = retrieve(
                history, hist_len, start)
            # adaptive draft length n = 1 + match * alpha (sam_only policy)
            n = jnp.minimum(fc.n_predicts + 1,
                            1 + (match.astype(jnp.float32)
                                 * fc.alpha).astype(jnp.int32))
            draft_len = jnp.where(match > 0,
                                  jnp.minimum(n, 1 + cont_avail),
                                  1).astype(jnp.int32)
            return tokens, draft_len, use_dyn

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def fused(params, kv_k, kv_v, history, hist_len, start_token,
                  budget, eos_id, key, retrieve):
            def cond(st):
                (kv_k, kv_v, history, hist_len, start, budget, done, steps,
                 dyn_steps, key) = st
                return (~done & (steps < fc.steps_per_call) & (budget > 0)
                        & (hist_len + M <= W))

            def body(st):
                (kv_k, kv_v, history, hist_len, start, budget, done, steps,
                 dyn_steps, key) = st
                draft_tokens, draft_len, use_dyn = make_draft(
                    retrieve, history, hist_len, start)
                s = jnp.arange(W)[None, None, :]
                mask = block_decode_mask(tri, hist_len, W)
                in_block = (s >= hist_len) & (s < hist_len + M)
                mask = mask & (~in_block | (s < hist_len + draft_len))
                mask = mask | (s == (hist_len + chain_pos)[None, :, None])
                logits, _, kv_k, kv_v = forward(
                    params, cfg, jnp.maximum(draft_tokens, 0)[None],
                    chain_pos[None, :] + hist_len, kv_k, kv_v, hist_len,
                    mask)
                if sampling:
                    key, sub = jax.random.split(key)
                    alen, bonus = accept(logits[0], draft_tokens, draft_len,
                                         sub)
                else:
                    argmax_tok = jnp.argmax(logits[0],
                                            axis=-1).astype(jnp.int32)
                    in_draft = chain_pos < draft_len
                    hit = (draft_tokens[1:] == argmax_tok[:-1]) & \
                        in_draft[1:]
                    alen = jnp.cumprod(hit.astype(jnp.int32)).sum() + 1
                    bonus = None
                acc = draft_tokens
                is_eos = (acc == eos_id) & (chain_pos < alen)
                any_eos = jnp.any(is_eos)
                alen = jnp.where(any_eos,
                                 jnp.argmax(is_eos).astype(jnp.int32) + 1,
                                 alen)
                if not sampling:
                    argmax_tok = jnp.argmax(logits[0],
                                            axis=-1).astype(jnp.int32)
                    bonus = argmax_tok[alen - 1]
                history = jax.lax.dynamic_update_slice(history, acc,
                                                       (hist_len,))
                hist_len = hist_len + alen
                budget = budget - alen
                done = any_eos | (budget <= 0)
                return (kv_k, kv_v, history, hist_len, bonus, budget, done,
                        steps + 1, dyn_steps + use_dyn.astype(jnp.int32),
                        key)

            init = (kv_k, kv_v, history, hist_len, start_token, budget,
                    jnp.bool_(False), jnp.int32(0), jnp.int32(0), key)
            out = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            # state stays on device; ctrl is the one host-fetched vector
            ctrl = pack_ctrl(out[3], out[7], out[8], out[6])
            return out[:6] + (ctrl,)

        return fused

    # ------------------------------------------------------------------
    def generate(self, input_ids: Sequence[int],
                 gen_config: Optional[GenerationConfig] = None) -> Outputs:
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        P = _bucket(len(input_ids), self.prefill_buckets)
        # cache bucket: the smallest configured size covering this
        # request's reachable length (prompt + budget + block)
        Wn = None
        need = max(len(input_ids) + gen.max_new_tokens + self.cfg.block, P)
        for w in sorted(self.cfg.cache_buckets):
            if w >= need and w < self.S:
                Wn = w
                break
        if (P, Wn) not in self._prefill_fns:
            self._prefill_fns[(P, Wn)] = self._build_prefill(P, Wn or self.S)
        padded = np.zeros(P, np.int32)
        padded[:len(input_ids)] = input_ids
        self.kv_k, self.kv_v, next_token, last_logits = \
            self._prefill_fns[(P, Wn)](self.params, jnp.asarray(padded),
                                       jnp.int32(len(input_ids)))
        key = jax.random.PRNGKey(gen.seed)
        sig = None if gen.greedy else gen.sampling_signature
        vkey = (sig, Wn)
        if vkey not in self._fused_sampling:
            self._fused_sampling[vkey] = (
                self._fused if vkey == (None, None)
                else self._build_fused(sig, window=Wn))
        fused = self._fused_sampling[vkey]
        if not gen.greedy:
            if gen.temperature > 0:
                key, sub = jax.random.split(key)
                next_token = jax.random.categorical(
                    sub, last_logits / gen.temperature).astype(jnp.int32)

        from .fused_base import init_history

        history = init_history(input_ids, self.S)
        hist_len = jnp.int32(len(input_ids))
        budget = jnp.int32(gen.max_new_tokens)
        start = next_token
        done = False
        decode_steps = 0
        hl = len(input_ids)
        while not done:
            key, sub = jax.random.split(key)
            (self.kv_k, self.kv_v, history, hist_len, start, budget,
             ctrl) = fused(
                self.params, self.kv_k, self.kv_v, history, hist_len, start,
                budget, jnp.int32(self.eos_token_id), sub, self._retrieve)
            hl, steps, dyn_steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            self.stats_dyn += dyn_steps
            done = bool(done_d) or steps == 0 or \
                hl + self.cfg.block > self.S
        self.stats_steps += decode_steps
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])


# ----------------------------------------------------------------------
# Batched fused serving: continuous batching × device-resident retrieval
# ----------------------------------------------------------------------

class BatchedFusedSamEngine(ProgressStreamMixin):
    """B request slots stepped together inside one fused device loop.

    Combines samd_tpu.batching's slot scheduler with the fused retrieval
    loop: per segment (up to ``steps_per_call`` iterations) every active slot
    drafts from its own history + the shared corpus, verifies and commits —
    all on device.  Host work per segment: admit/finish slots and read back
    [B] scalars + finished histories.  Per-request progress streaming via
    ``progress_listeners`` (streaming.ProgressStreamMixin; SSE serving)."""

    def __init__(self, model_cfg: ModelConfig, params: Params,
                 fs_cfg: Optional[FusedSamConfig] = None, *,
                 corpus: Optional[Sequence[int]] = None,
                 batch_size: int = 4, max_cache_len: int = 2048,
                 eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024,
                                                   2048),
                 inline_prefill: bool = False):
        self.model_cfg = model_cfg
        self.params = params
        # short segments by default: steps_per_call is the admission
        # granularity for continuous batching (single-stream wants it large)
        self.cfg = fs_cfg or FusedSamConfig(steps_per_call=16)
        self.B = batch_size
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        # inline prefill: greedy requests skip the dedicated prefill
        # program — the prompt streams through the fused decode loop as a
        # forced-accept chain, M tokens per step (zero blocking fetch at
        # admission, no per-bucket prefill compiles).  Paged engines grow
        # their pages through the ordinary per-segment pre-allocation.
        self.inline_prefill = inline_prefill
        self._init_kv()
        from .fused_base import build_optional_index, load_corpus_buffer

        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        from .fused_base import make_retrieval_partial

        # corpus/index ride the fused call as Partial args (no module
        # inlining — fused_base.make_retrieval_partial)
        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.block,
            corpus_index=self.corpus_index)

        self.histories = jnp.zeros((batch_size, max_cache_len), jnp.int32)
        self._prefill_fns = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}
        # host-side slot bookkeeping
        self._slot_req = [None] * batch_size     # request id or None
        self._slot_prompt = [0] * batch_size
        self._slot_max_new = [0] * batch_size
        self._slot_steps = [0] * batch_size
        self.queue = []
        self.results = {}
        self._next_id = 0

    # -- subclass hooks (paged variant swaps the KV backend) --------------
    def _init_kv(self):
        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(self.model_cfg, self.B, self.S)

    def _prefill_slot(self, slot: int, ids):
        """Admit one request's prompt into ``slot``; returns
        (next_token, last_logits)."""
        P = _bucket(len(ids), self.prefill_buckets)
        if P not in self._prefill_fns:
            self._prefill_fns[P] = self._build_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(ids)] = ids
        (self.kv_k, self.kv_v, self.histories, nt, last_logits) = \
            self._prefill_fns[P](self.params, self.kv_k, self.kv_v,
                                 self.histories, jnp.asarray(padded),
                                 jnp.int32(len(ids)), jnp.int32(slot))
        return nt, last_logits

    def _pre_segment(self, hist_lens, actives) -> None:
        """Called before each fused segment (paged: grow page tables)."""

    def _fused_extra_args(self) -> tuple:
        """Trailing traced args for the fused fn (paged: tables, limits)."""
        return ()

    def _release_slot(self, slot: int) -> None:
        """Called when a request finishes (paged: free its pages)."""

    def _should_retry_slot(self, slot: int, hist_len: int,
                           budget: int) -> bool:
        """A slot ended the segment not-live but unfinished for a reason
        that can clear (paged: pool-capacity starvation) → keep it active
        instead of finishing early."""
        return False

    def _post_segment(self, stepped: int) -> None:
        """Called with the segment's total step count (paged: stall guard)."""

    def _can_admit(self, ids) -> bool:
        """Whether the next queued prompt can be admitted now (paged: the
        pool must have pages for its prefill bucket)."""
        return True

    def _admit_inline(self, slot: int) -> None:
        """Inline-prefill admission bookkeeping (paged: free the slot's
        previous occupant's pages; growth happens per segment)."""

    def _build_prefill(self, P: int):
        cfg, S = self.model_cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, kv_k, kv_v, histories, tokens, true_len, slot):
            from .cache import init_kv_cache

            fk, fv = init_kv_cache(cfg, 1, S)
            logits, _, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, S))
            from .cache import update_slot

            kv_k2 = update_slot(kv_k, fk, slot)
            kv_v2 = update_slot(kv_v, fv, slot)
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row, (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k2, kv_v2, histories,
                    jnp.argmax(last).astype(jnp.int32), last)

        return prefill

    # set by the paged subclass: (page_size, scratch_page, interpret)
    _paged_cfg = None

    def _build_fused(self, sig: Optional[tuple] = None):
        sampling = sig is not None
        accept = make_chain_accept_fn(sig) if sampling else None
        cfg, S, B = self.model_cfg, self.S, self.B
        fc = self.cfg
        M = fc.block
        tri = jnp.tril(jnp.ones((M, M), bool))
        chain_pos = jnp.arange(M, dtype=jnp.int32)
        paged = self._paged_cfg
        inline = getattr(self, "inline_prefill", False)

        def make_draft(retrieve, history, hist_len, start):
            match, use_dyn, tokens, cont_avail = retrieve(
                history, hist_len, start)
            n = jnp.minimum(fc.n_predicts + 1,
                            1 + (match.astype(jnp.float32)
                                 * fc.alpha).astype(jnp.int32))
            draft_len = jnp.where(match > 0,
                                  jnp.minimum(n, 1 + cont_avail),
                                  1).astype(jnp.int32)
            return tokens, draft_len

        def slot_mask(hist_len, draft_len):
            s = jnp.arange(S)[None, :]
            mask = block_decode_mask(tri, hist_len, S)[0]       # [M, S]
            in_block = (s >= hist_len) & (s < hist_len + M)
            mask = mask & (~in_block | (s < hist_len + draft_len))
            return mask | (s == (hist_len + chain_pos)[:, None])

        def slot_window(hist_len, draft_len):
            # paged mode: the in-block [M, M] tree mask (chain prefix up to
            # draft_len + self-diagonal) folded to a boundary window — the
            # committed prefix needs no mask bytes (kernel-implicit)
            from .ops.paged_attention import boundary_mask_window

            cols = jnp.arange(M)[None, :]
            tm = (tri & (cols < draft_len)) | jnp.eye(M, dtype=bool)
            return boundary_mask_window(tm, hist_len, paged[0])

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def fused(params, kv_k, kv_v, histories, hist_lens, starts, budgets,
                  actives, eos_id, keys, samp_flags, refill, prompt_lens,
                  retrieve, tables=None, alloc_limits=None):
            if paged is None:
                alloc_limits = S
                paged_aux = None
            else:
                from .paged_kv import PagedAux

                paged_aux = PagedAux(tables, paged[1], paged[2])
            init_lives = actives & (budgets > 0) & \
                (hist_lens + M <= alloc_limits)

            def cond(st):
                (kv_k, kv_v, histories, hist_lens, starts, budgets, lives,
                 steps, slot_steps, keys) = st
                # when the host has queued requests (refill), end the
                # segment as soon as any slot finishes so it can be
                # re-admitted — long segments then cost no utilization
                freed = jnp.any(init_lives & ~lives)
                return (jnp.any(lives) & (steps < fc.steps_per_call)
                        & ~(refill & freed))

            def body(st):
                (kv_k, kv_v, histories, hist_lens, starts, budgets, lives,
                 steps, slot_steps, keys) = st
                drafts, dlens = jax.vmap(
                    lambda h, l, s: make_draft(retrieve, h, l, s)
                )(histories, hist_lens, starts)                 # [B,M],[B]
                if inline:
                    # inline prefill: a slot whose committed length is
                    # still inside its prompt drafts the NEXT M prompt
                    # tokens as a forced-accept chain — the prompt streams
                    # through the decode program (zero admission stall, no
                    # prefill program at all)
                    pf_rest = prompt_lens - hist_lens              # [B]
                    in_pf = pf_rest > 0
                    forced = jnp.minimum(pf_rest, M).astype(jnp.int32)
                    chunks = jax.vmap(
                        lambda h, o: jax.lax.dynamic_slice(h, (o,), (M,))
                    )(histories, hist_lens)
                    drafts = jnp.where(in_pf[:, None], chunks, drafts)
                    dlens = jnp.where(in_pf, forced, dlens)
                masks = jax.vmap(slot_window if paged else slot_mask)(
                    hist_lens, dlens)            # [B,M,S] / [B,M,W·page]
                pos = chain_pos[None, :] + hist_lens[:, None]
                logits, _, kv_k, kv_v = forward(
                    params, cfg, jnp.maximum(drafts, 0), pos, kv_k, kv_v,
                    hist_lens, masks, paged=paged_aux)
                argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                in_draft = chain_pos[None, :] < dlens[:, None]
                hit = (drafts[:, 1:] == argmax_tok[:, :-1]) & in_draft[:, 1:]
                alens = jnp.cumprod(hit.astype(jnp.int32), axis=1
                                    ).sum(axis=1) + 1              # [B]
                bonus = argmax_tok[jnp.arange(B),
                                   jnp.maximum(alens - 1, 0)]
                if sampling:
                    split = jax.vmap(jax.random.split)(keys)  # [B, 2, 2]
                    subs, keys = split[:, 0], split[:, 1]
                    alens_s, bonus_s = jax.vmap(accept)(
                        logits, drafts, dlens, subs)
                    alens = jnp.where(samp_flags, alens_s, alens)
                    bonus = jnp.where(samp_flags, bonus_s, bonus)
                if inline:
                    # force-accept prompt rows; the boundary block's bonus
                    # (argmax at the last prompt row) is the first
                    # generated token, mid-prefill the next start is the
                    # next prompt token; EOS/budget don't apply to prompt
                    alens = jnp.where(in_pf, forced, alens)
                    bonus = jnp.where(
                        in_pf,
                        argmax_tok[jnp.arange(B),
                                   jnp.maximum(forced - 1, 0)], bonus)
                    nxt_prompt = jax.vmap(lambda h, o: h[o])(
                        histories, jnp.minimum(hist_lens + M,
                                               jnp.int32(S - 1)))
                    bonus = jnp.where(in_pf & (pf_rest > M), nxt_prompt,
                                      bonus)
                is_eos = (drafts == eos_id) & \
                    (chain_pos[None, :] < alens[:, None])
                if inline:
                    is_eos = is_eos & ~in_pf[:, None]
                any_eos = jnp.any(is_eos, axis=1)
                alens = jnp.where(any_eos,
                                  jnp.argmax(is_eos, axis=1).astype(jnp.int32)
                                  + 1, alens)
                alens = jnp.where(lives, alens, 0)
                bonus = jnp.where(
                    any_eos,
                    argmax_tok[jnp.arange(B), jnp.maximum(alens - 1, 0)],
                    bonus)
                histories = jax.vmap(
                    lambda h, a, o: jax.lax.dynamic_update_slice(h, a, (o,))
                )(histories, jnp.maximum(drafts, 0), hist_lens)
                hist_lens = hist_lens + alens
                if inline:   # prompt tokens consume no generation budget
                    budgets = budgets - jnp.where(in_pf, 0, alens)
                    slot_steps = slot_steps + jnp.where(
                        in_pf, 0, lives.astype(jnp.int32))
                else:
                    budgets = budgets - alens
                    slot_steps = slot_steps + lives.astype(jnp.int32)
                starts = jnp.where(lives, bonus, starts)
                lives = lives & ~any_eos & (budgets > 0) & \
                    (hist_lens + M <= alloc_limits)
                return (kv_k, kv_v, histories, hist_lens, starts, budgets,
                        lives, steps + 1, slot_steps, keys)

            init = (kv_k, kv_v, histories, hist_lens, starts, budgets,
                    init_lives, jnp.int32(0), jnp.zeros((B,), jnp.int32),
                    keys)
            (kv_k, kv_v, histories, hist_lens, starts, budgets, lives, steps,
             slot_steps, keys) = jax.lax.while_loop(cond, body, init)
            # pack every per-slot scalar the host needs into ONE int32
            # matrix so the segment costs a single device->host transfer
            key_rows = jax.lax.bitcast_convert_type(keys, jnp.int32).T
            ctrl = jnp.concatenate([
                jnp.stack([hist_lens, starts, budgets,
                           lives.astype(jnp.int32), slot_steps]),
                key_rows], axis=0)
            return (kv_k, kv_v, histories, ctrl)

        return fused

    # -- scheduler -------------------------------------------------------
    def add_request(self, input_ids: Sequence[int],
                    gen_config: Optional[GenerationConfig] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, list(input_ids),
                           gen_config or GenerationConfig()))
        return rid

    def _seed_history(self, slot: int, ids) -> None:
        """Inline-prefill admission: upload the prompt row; no forward, no
        blocking fetch — the fused loop streams the prompt in."""
        if not hasattr(self, "_seed_fn"):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def seed(histories, row, slot):
                return jax.lax.dynamic_update_slice(histories, row[None],
                                                    (slot, 0))

            self._seed_fn = seed
        row = np.zeros(self.S, np.int32)
        row[:len(ids)] = ids
        self.histories = self._seed_fn(self.histories, jnp.asarray(row),
                                       jnp.int32(slot))

    def run(self):
        B = self.B
        hist_lens = np.zeros(B, np.int32)
        starts = np.zeros(B, np.int32)
        budgets = np.zeros(B, np.int32)
        actives = np.zeros(B, bool)
        samp_flags = np.zeros(B, bool)
        keys = np.zeros((B, 2), np.uint32)
        prompt_lens = np.zeros(B, np.int32)
        slot_sigs = [None] * B

        while self.queue or actives.any():
            # admit
            for i in range(B):
                if actives[i] or not self.queue:
                    continue
                if not self._can_admit(self.queue[0][1]):
                    break  # paged: no pages for a prompt yet; retry later
                rid, ids, gen = self.queue.pop(0)
                if self.inline_prefill and gen.greedy:
                    self._admit_inline(i)
                    self._seed_history(i, ids)
                    nt = ids[0]          # host-known; zero fetches
                    hist_lens[i] = 0
                    prompt_lens[i] = len(ids)
                    slot_sigs[i] = None
                    samp_flags[i] = False
                else:
                    nt, last_logits = self._prefill_slot(i, ids)
                    hist_lens[i] = len(ids)
                    prompt_lens[i] = 0
                    if not gen.greedy:
                        slot_sigs[i] = gen.sampling_signature
                        samp_flags[i] = True
                        k = jax.random.PRNGKey(gen.seed)
                        if gen.temperature > 0:
                            k, sub = jax.random.split(k)
                            nt = jax.random.categorical(
                                sub, last_logits / gen.temperature)
                        keys[i] = np.asarray(k)
                    else:
                        slot_sigs[i] = None
                        samp_flags[i] = False
                self._slot_req[i] = rid
                self._slot_prompt[i] = len(ids)
                self._slot_max_new[i] = gen.max_new_tokens
                self._slot_steps[i] = 0
                starts[i] = int(nt)
                budgets[i] = gen.max_new_tokens
                actives[i] = True
            if not actives.any():
                break
            sigs = {s for s in slot_sigs if s is not None}
            if len(sigs) > 1:
                raise ValueError(
                    "concurrent sampling requests must share one sampling "
                    f"signature; got {sigs}")
            if sigs:
                sig = next(iter(sigs))
                if sig not in self._fused_sampling:
                    self._fused_sampling[sig] = self._build_fused(sig)
                fused = self._fused_sampling[sig]
            else:
                fused = self._fused
            # fused segment
            self._pre_segment(hist_lens, actives)
            (self.kv_k, self.kv_v, self.histories, ctrl) = fused(
                self.params, self.kv_k, self.kv_v, self.histories,
                jnp.asarray(hist_lens), jnp.asarray(starts),
                jnp.asarray(budgets), jnp.asarray(actives),
                jnp.int32(self.eos_token_id), jnp.asarray(keys),
                jnp.asarray(samp_flags), jnp.bool_(bool(self.queue)),
                jnp.asarray(prompt_lens), self._retrieve,
                *self._fused_extra_args())
            ctrl_np = np.asarray(ctrl)
            hist_lens = ctrl_np[0].copy()
            starts = ctrl_np[1].copy()
            budgets = ctrl_np[2].copy()
            lives = ctrl_np[3].astype(bool)
            steps_arr = ctrl_np[4]
            keys = np.ascontiguousarray(ctrl_np[5:7].T).view(np.uint32)
            self._post_segment(int(steps_arr[actives].sum())
                               if actives.any() else 0)
            self._emit_stream_progress(actives, hist_lens)
            hist_np = None
            for i in range(B):
                if not actives[i]:
                    continue
                self._slot_steps[i] += int(steps_arr[i])
                if lives[i]:
                    continue
                if self._should_retry_slot(i, int(hist_lens[i]),
                                           int(budgets[i])):
                    continue  # transient stall (paged capacity); stays active  # still going next segment
                # finished: extract output
                if hist_np is None:
                    hist_np = np.asarray(self.histories)
                ids = hist_np[i, :hist_lens[i]].tolist()
                plen = self._slot_prompt[i]
                gen_part = ids[plen:]
                if self.eos_token_id in gen_part:
                    gen_part = gen_part[:gen_part.index(self.eos_token_id) + 1]
                gen_part = gen_part[:self._slot_max_new[i]]
                self.results[self._slot_req[i]] = Outputs(
                    ids[:plen] + gen_part, len(gen_part),
                    self._slot_steps[i], [])
                self._stream_done(self._slot_req[i])
                actives[i] = False
                self._slot_req[i] = None
                slot_sigs[i] = None
                samp_flags[i] = False
                self._release_slot(i)
        out, self.results = self.results, {}
        return out


# ----------------------------------------------------------------------
# Paged batched fused serving: the peak-throughput path on a page pool
# ----------------------------------------------------------------------

class PagedBatchedFusedSamEngine(BatchedFusedSamEngine):
    """BatchedFusedSamEngine whose KV lives in a shared page pool.

    The dense batched fused engines allocate ``B × max_cache_len`` KV per
    slot — the serving config with the worst memory story (the round-2
    parity gap, docs/PARITY.md).  Here the fused while_loop consumes the
    transposed page pool directly through the page-table Pallas kernel
    (ops/paged_attention.py): per segment the host pre-allocates each live
    slot's worst-case growth (``steps_per_call × block`` tokens, a page or
    two), passes the tables + per-slot capacity limits into the jitted
    segment, and frees everything when the request finishes — persistent
    footprint scales with LIVE tokens, not B × S_max.

    ``quantized_kv=True`` stores int8 pages + f32 per-token scales (the
    paged analogue of cache.QuantizedKV): half the page bytes at rest
    (2× token capacity per HBM byte) and half the kernel's DMA stream.

    Chain drafts commit accepted tokens as a prefix of the written block,
    so no KV compaction is ever needed (the hybrid variant compacts;
    reference rollback semantics: /root/reference/samd/cache.py:117-133).
    """

    def __init__(self, *args, n_pages: int = 64, page_size: int = 128,
                 quantized_kv: bool = False,
                 interpret: Optional[bool] = None, **kwargs):
        self._n_pages = n_pages
        self._page_size = page_size
        self._quantized_kv = quantized_kv
        self._interpret = interpret
        super().__init__(*args, **kwargs)

    # -- hooks -------------------------------------------------------------
    def _init_kv(self):
        from .paged_kv import PagedKV, PagedKVPool, PagedRequest

        if self.S % self._page_size != 0:
            raise ValueError("max_cache_len must be a multiple of page_size")
        if getattr(self.model_cfg, "kv_quant", False):
            raise ValueError("the paged engine manages its own KV "
                             "quantization (quantized_kv=True); use a "
                             "kv_quant=False model config")
        interpret = (jax.default_backend() == "cpu"
                     if self._interpret is None else self._interpret)
        self.pool = PagedKVPool(self.model_cfg, n_pages=self._n_pages,
                                page_size=self._page_size, layout="dp",
                                quantized=self._quantized_kv)
        wrap = (lambda x: x if isinstance(x, PagedKV) else PagedKV(x, None))
        self.kv_k, self.kv_v = wrap(self.pool.k), wrap(self.pool.v)
        self._paged_cfg = (self._page_size, self.pool.scratch_page,
                           interpret)
        self.page_reqs = [PagedRequest(self.pool, self.S)
                          for _ in range(self.B)]
        self._alloc_limits = np.zeros((self.B,), np.int32)
        self._tables_cache = None
        self._stall = 0
        self.peak_pages = 0   # high-water mark (bench footprint metric)
        self._scatter_prefill_fns: Dict[int, callable] = {}
        # a finished slot's kv_limit (hist + block) can overrun S by up to
        # one block — pad the table with -1 rows so the kernel's SMEM table
        # reads stay in bounds (the -1s route its writes to scratch)
        M = getattr(self.cfg, "block", None) or self.cfg.max_block
        self._table_pad = -(-M // self._page_size) + 1

    def _tables(self):
        """[B, P + pad] device table, re-uploaded only on page-assignment
        change (each per-segment put is a tunnel RPC)."""
        host = np.stack([r.host_table() for r in self.page_reqs])
        host = np.pad(host, ((0, 0), (0, self._table_pad)),
                      constant_values=-1)
        if self._tables_cache is None or \
                not np.array_equal(self._tables_cache[0], host):
            self._tables_cache = (host, jnp.asarray(host))
        return self._tables_cache[1]

    def _pre_segment(self, hist_lens, actives) -> None:
        M = self.cfg.block
        grow = self.cfg.steps_per_call * M
        for i in range(self.B):
            if not actives[i]:
                self._alloc_limits[i] = 0
                continue
            want = min(self.S, int(hist_lens[i]) + grow)
            # best-effort: a tight pool shortens the segment (the slot's
            # limit guard ends it at capacity) instead of failing
            self._alloc_limits[i] = self.page_reqs[i].ensure_upto(want)
        self.peak_pages = max(self.peak_pages,
                              self.pool.n_pages - len(self.pool._free))

    def _fused_extra_args(self) -> tuple:
        return (self._tables(), jnp.asarray(self._alloc_limits))

    def _release_slot(self, slot: int) -> None:
        self.page_reqs[slot].release()

    def _should_retry_slot(self, slot: int, hist_len: int,
                           budget: int) -> bool:
        # unfinished only because page allocation stopped short of the
        # slot's dense limit: keep it active — pages free as others finish.
        # (A coincidental EOS here merely generates past the EOS; the
        # finalize trim keeps the output correct.)
        M = getattr(self.cfg, "block", None) or self.cfg.max_block
        return (budget > 0 and hist_len + M <= self.S
                and hist_len + M > int(self._alloc_limits[slot]))

    def _post_segment(self, stepped: int) -> None:
        if stepped == 0:
            self._stall += 1
            if self._stall >= 3:
                raise MemoryError(
                    "paged KV pool too small: no slot could step for 3 "
                    f"consecutive segments ({self.pool.n_pages} pages of "
                    f"{self._page_size})")
        else:
            self._stall = 0

    def _can_admit(self, ids) -> bool:
        P = _bucket(len(ids), self.prefill_buckets)
        return self.pool.pages_for(P) <= len(self.pool._free)

    def live_kv_tokens(self) -> int:
        """Currently allocated pool tokens (the bench's footprint metric)."""
        return sum(len(r.pages) for r in self.page_reqs) * self._page_size

    def _admit_inline(self, slot: int) -> None:
        self.page_reqs[slot].release()

    # -- prefill: dense single-request forward, scattered into pages --------
    def _build_scatter_prefill(self, P: int):
        from .cache import init_kv_cache
        from .paged_kv import paged_flat_indices, paged_write_block

        cfg, S = self.model_cfg, self.S
        page, scratch, _ = self._paged_cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, kv_k, kv_v, histories, tokens, true_len, slot,
                    table):
            fk, fv = init_kv_cache(cfg, 1, P)
            logits, _, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, P))
            flat_pg, flat_sl = paged_flat_indices(
                table[None], jnp.zeros((1,), jnp.int32), P, page, scratch)
            kv_k = jax.vmap(
                lambda c, b: paged_write_block(c, b, flat_pg, flat_sl)
            )(kv_k, fk)
            kv_v = jax.vmap(
                lambda c, b: paged_write_block(c, b, flat_pg, flat_sl)
            )(kv_v, fv)
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row,
                                                     (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k, kv_v, histories,
                    jnp.argmax(last).astype(jnp.int32), last)

        return prefill

    def _prefill_slot(self, slot: int, ids):
        P = _bucket(len(ids), self.prefill_buckets)
        if P not in self._scatter_prefill_fns:
            self._scatter_prefill_fns[P] = self._build_scatter_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(ids)] = ids
        req = self.page_reqs[slot]
        req.release()
        req.ensure(min(-(-P // self._page_size) * self._page_size, self.S))
        req.length = len(ids)
        (self.kv_k, self.kv_v, self.histories, nt, last_logits) = \
            self._scatter_prefill_fns[P](
                self.params, self.kv_k, self.kv_v, self.histories,
                jnp.asarray(padded), jnp.int32(len(ids)), jnp.int32(slot),
                jnp.asarray(self.page_reqs[slot].host_table()))
        return nt, last_logits
