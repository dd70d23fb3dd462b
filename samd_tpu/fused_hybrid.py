"""Fused hybrid: SAM-style retrieval + Token-Recycle trees, all on device.

The reference's flagship configuration — SAM-Decoding[Token Recycle]
(README.md:55, 2.27× — adaptive per-step choice between retrieval drafts and
a model-based tree, /root/reference/samd/draft.py:52-63) — re-composed from
the fused building blocks:

  per while_loop iteration:
    match  = longest-suffix search over history + corpus (fused_sam)
    draft  = retrieval CHAIN when max(match_dyn, match_cor - bias) >=
             len_threshold (packed chain), else the Token-Recycle TREE filled
             from the device harvest table (token_recycle_fused)
    verify = generic packed-draft path: in-jit mask/positions/paths from the
             parent vector (ops/treeops), tree acceptance (verify.greedy_accept)
    commit = KV gather-compaction of the winning path, harvest-table scatter,
             history append

Zero per-step host traffic, greedy outputs equal to the AR baseline.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cache import compact_accepted
from .config import GenerationConfig
from .drafters.tree_topology import child_ranks, rank_probability_tree
from .engine import Outputs, _bucket
from .fused_sam import suffix_match
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .ops.treeops import unpack_draft
from .sam.trees import node_depths
from .streaming import ProgressStreamMixin
from .verify import greedy_accept


@dataclass(frozen=True)
class FusedHybridConfig:
    """Reference-canonical hybrid knobs (scripts/inference_samd.sh:16-20:
    n_predicts=40, len_threshold=5, len_bias=5)."""
    max_ngram: int = 8
    ext: int = 56
    n_predicts: int = 40        # retrieval chain length (incl. start token)
    len_threshold: int = 5
    len_bias: int = 5
    tree_nodes: int = 61        # Token-Recycle topology size
    topk: int = 8
    steps_per_call: int = 256
    corpus_capacity: int = 1 << 15
    max_block: int = 64         # M >= max(n_predicts, tree_nodes)
    # approx_max_k for the in-loop harvest ranking (fused_base.harvest_topk)
    approx_harvest: bool = True
    # n-gram hash index for corpus-scale retrieval (ops/ngram_index.py)
    indexed: bool = False
    index_grams: tuple = (32, 16, 8, 7, 6, 5, 4, 3, 2, 1)
    index_bucket_cap: int = 8
    index_keep_latest: int = 0
    # per-request KV-cache buckets (see FusedSamConfig.cache_buckets)
    cache_buckets: tuple = ()


def build_tr_topology(tree_nodes: int, topk: int):
    """Token-Recycle topology, depth-relabeled, as device constants:
    returns (parents, depths, children, rank)."""
    parents = rank_probability_tree(tree_nodes, branching=topk)
    d = node_depths(parents)
    order = np.lexsort((np.arange(len(parents)), d))
    new_pos = np.empty(len(parents), np.int32)
    new_pos[order] = np.arange(len(parents), dtype=np.int32)
    relabeled = np.full(len(parents), -1, np.int32)
    for i, p in enumerate(parents):
        if p >= 0:
            relabeled[new_pos[i]] = new_pos[p]
    depths = node_depths(relabeled)
    children = child_ranks(relabeled)
    rank = np.zeros(len(parents), np.int32)
    for p, childs in enumerate(children):
        for r, c in enumerate(childs):
            rank[c] = r
    return relabeled, depths, children, rank


def make_tr_draft(tr_parents, tr_depths, tr_rank, M: int):
    """Token-Recycle tree fill from a device harvest table: returns
    tokens [M] (-1 beyond valid nodes) for one slot."""
    max_depth = int(tr_depths.max())
    levels = [np.nonzero(tr_depths == dd)[0]
              for dd in range(max_depth + 1)]

    def tr_draft(harvest, seen, start):
        tokens = jnp.full((M,), -1, jnp.int32).at[0].set(start)
        valid = jnp.zeros((M,), bool).at[0].set(True)
        for dd in range(1, max_depth + 1):
            nodes = levels[dd]
            par = tr_parents[nodes]
            ptok = tokens[par]
            ok = valid[par] & (ptok >= 0) & seen[jnp.maximum(ptok, 0)]
            preds = harvest[jnp.maximum(ptok, 0)]
            t = preds[jnp.arange(len(nodes)), tr_rank[nodes]]
            tokens = tokens.at[nodes].set(jnp.where(ok, t, -1))
            valid = valid.at[nodes].set(ok)
        return tokens

    return tr_draft


class FusedHybridEngine:
    def __init__(self, model_cfg: ModelConfig, params: Params,
                 hy_cfg: Optional[FusedHybridConfig] = None, *,
                 corpus: Optional[Sequence[int]] = None,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.cfg = hy_cfg or FusedHybridConfig()
        assert self.cfg.max_block >= max(self.cfg.n_predicts,
                                         self.cfg.tree_nodes)
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)

        (self.tr_parents, self.tr_depths, self.tr_children,
         self.tr_rank) = build_tr_topology(self.cfg.tree_nodes,
                                           self.cfg.topk)

        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        V = model_cfg.vocab_size
        self.harvest = jnp.zeros((V + 1, self.cfg.topk), jnp.int32)
        self.seen = jnp.zeros((V + 1,), bool)
        from .fused_base import build_optional_index, load_corpus_buffer

        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        # corpus/index ride the fused call as Partial args (no module
        # inlining — fused_base.make_retrieval_partial)
        from .fused_base import make_retrieval_partial

        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.max_block,
            corpus_index=self.corpus_index)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}
        self.sam_steps = 0        # last request's retrieval-draft steps
        self.sam_steps_total = 0  # across all requests (bench/diagnostics)
        self.steps_total = 0

    # ------------------------------------------------------------------
    def _build_prefill(self, P: int, W: int):
        cfg, K = self.model_cfg, self.cfg.topk
        V = cfg.vocab_size

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, harvest, seen, tokens, true_len):
            from .cache import init_kv_cache

            kv_k, kv_v = init_kv_cache(cfg, 1, W)
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, W))
            topk = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            rows = jnp.where(jnp.arange(P) < true_len, tokens, V)
            harvest = harvest.at[rows].set(topk)
            seen = seen.at[rows].set(True).at[V].set(False)
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k, kv_v, harvest, seen,
                    jnp.argmax(last).astype(jnp.int32))

        return prefill

    def _build_fused(self, sampling: bool = False, temperature: float = 1.0,
                     top_p: float = 0.0, top_k: int = 0,
                     window: Optional[int] = None):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        cfg, S = self.model_cfg, self.S
        # per-request cache bucket: this program's KV is [.., W, ..]
        W = S if window is None or window >= S else window
        hc = self.cfg
        M = hc.max_block
        Q = hc.max_ngram
        N = len(self.tr_parents)
        K = hc.topk
        V = cfg.vocab_size
        tr_parents = self.tr_parents
        tr_rank = self.tr_rank
        corpus = self.corpus
        corpus_len = self.corpus_len
        chain_parents = jnp.concatenate([
            jnp.arange(-1, hc.n_predicts - 1, dtype=jnp.int32),
            jnp.arange(hc.n_predicts, M, dtype=jnp.int32)])  # padded chain
        tree_parents_packed = jnp.concatenate([
            jnp.asarray(tr_parents),
            jnp.arange(N, M, dtype=jnp.int32)])

        def retrieval_draft(retrieve, history, hist_len, start):
            match, use_dyn, raw, cont_avail = retrieve(history, hist_len,
                                                       start)
            # fixed-length chain like the reference hybrid
            # (/root/reference/samd/sam/dyn_sam.py:107-113); nodes beyond the
            # available continuation or n_predicts carry -1 and can never be
            # accepted
            avail = jnp.minimum(cont_avail, hc.n_predicts - 1)
            keep = jnp.arange(M - 1) < avail
            tokens = jnp.concatenate([
                raw[:1], jnp.where(keep, raw[1:], -1)]).astype(jnp.int32)
            tokens = jnp.where(jnp.arange(M) < hc.n_predicts, tokens, -1)
            return match, tokens, (1 + avail).astype(jnp.int32)

        tr_draft = make_tr_draft(tr_parents, self.tr_depths, tr_rank, M)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def fused(params, kv_k, kv_v, harvest, seen, history, hist_len,
                  start_token, budget, eos_id, key, retrieve):
            def cond(st):
                (kv_k, kv_v, harvest, seen, history, hist_len, start, budget,
                 done, steps, sam_steps, key) = st
                return (~done & (steps < hc.steps_per_call) & (budget > 0)
                        & (hist_len + M <= W))

            def body(st):
                (kv_k, kv_v, harvest, seen, history, hist_len, start, budget,
                 done, steps, sam_steps, key) = st
                match, chain_tokens, chain_len = retrieval_draft(
                    retrieve,
                    history, hist_len, start)
                use_sam = match >= hc.len_threshold
                tree_tokens = tr_draft(harvest, seen, start)
                draft_tokens = jnp.where(use_sam, chain_tokens, tree_tokens)
                parents = jnp.where(use_sam, chain_parents,
                                    tree_parents_packed)
                packed = jnp.stack([jnp.maximum(draft_tokens, 0), parents])
                toks, tree_mask, depths, paths = unpack_draft(packed, M)
                # kill invalid (-1) nodes from acceptance by rewriting their
                # tokens to -1 in the accept comparison
                cand_tokens = draft_tokens
                mask = block_decode_mask(tree_mask, hist_len, W)
                logits, _, kv_k, kv_v = forward(
                    params, cfg, toks[None], depths[None, :] + hist_len,
                    kv_k, kv_v, hist_len, mask)
                if sampling:
                    from .verify import sampling_accept

                    key, sub = jax.random.split(key)
                    res = sampling_accept(
                        logits[0], cand_tokens, paths, sub,
                        temperature=temperature, top_p=top_p, top_k=top_k)
                else:
                    res = greedy_accept(logits[0], cand_tokens, paths)
                kv_k = compact_accepted(kv_k, hist_len, res.path_nodes, M, seq_axis=_sa)
                kv_v = compact_accepted(kv_v, hist_len, res.path_nodes, M, seq_axis=_sa)
                # Token-Recycle harvest of the whole block
                from .fused_base import harvest_topk

                topk = harvest_topk(logits[0], K, hc.approx_harvest)
                rows = jnp.where(draft_tokens >= 0, draft_tokens, V)
                harvest = harvest.at[rows].set(topk)
                seen = seen.at[rows].set(True).at[V].set(False)
                # commit
                alen = res.accept_len
                acc = jnp.maximum(res.accepted_tokens, 0)
                D = acc.shape[0]
                is_eos = (acc == eos_id) & (jnp.arange(D) < alen)
                any_eos = jnp.any(is_eos)
                alen = jnp.where(any_eos,
                                 jnp.argmax(is_eos).astype(jnp.int32) + 1,
                                 alen)
                history = jax.lax.dynamic_update_slice(history, acc,
                                                       (hist_len,))
                hist_len = hist_len + alen
                budget = budget - alen
                done = any_eos | (budget <= 0)
                return (kv_k, kv_v, harvest, seen, history, hist_len,
                        res.next_token, budget, done, steps + 1,
                        sam_steps + use_sam.astype(jnp.int32), key)

            init = (kv_k, kv_v, harvest, seen, history, hist_len, start_token,
                    budget, jnp.bool_(False), jnp.int32(0), jnp.int32(0), key)
            out = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            # device state + one host-fetched control vector
            ctrl = pack_ctrl(out[5], out[9], out[10], out[8])
            return out[:8] + (ctrl,)

        return fused

    # ------------------------------------------------------------------
    def generate(self, input_ids: Sequence[int],
                 gen_config: Optional[GenerationConfig] = None) -> Outputs:
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        P = _bucket(len(input_ids), self.prefill_buckets)
        Wn = None
        need = max(len(input_ids) + gen.max_new_tokens + self.cfg.max_block,
                   P)
        for w in sorted(self.cfg.cache_buckets):
            if w >= need and w < self.S:
                Wn = w
                break
        if (P, Wn) not in self._prefill_fns:
            self._prefill_fns[(P, Wn)] = self._build_prefill(P, Wn or self.S)
        padded = np.zeros(P, np.int32)
        padded[:len(input_ids)] = input_ids
        (self.kv_k, self.kv_v, self.harvest, self.seen, next_token) = \
            self._prefill_fns[(P, Wn)](self.params, self.harvest, self.seen,
                                       jnp.asarray(padded),
                                       jnp.int32(len(input_ids)))

        from .fused_base import init_history

        history = init_history(input_ids, self.S)
        hist_len = jnp.int32(len(input_ids))
        budget = jnp.int32(gen.max_new_tokens)
        sig = None if gen.greedy else (gen.temperature, gen.top_p,
                                       gen.top_k)
        vkey = (sig, Wn)
        if vkey == (None, None):
            fused = self._fused
        else:
            if vkey not in self._fused_sampling:
                self._fused_sampling[vkey] = self._build_fused(
                    sampling=not gen.greedy,
                    temperature=gen.temperature, top_p=gen.top_p,
                    top_k=gen.top_k, window=Wn)
            fused = self._fused_sampling[vkey]
        key = jax.random.PRNGKey(gen.seed)
        start = next_token
        done = False
        decode_steps = 0
        self.sam_steps = 0  # this request's retrieval-draft steps
        hl = len(input_ids)
        while not done:
            key, sub = jax.random.split(key)
            (self.kv_k, self.kv_v, self.harvest, self.seen, history, hist_len,
             start, budget, ctrl) = fused(
                self.params, self.kv_k, self.kv_v, self.harvest, self.seen,
                history, hist_len, start, budget,
                jnp.int32(self.eos_token_id), sub, self._retrieve)
            hl, steps, sam_steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            self.sam_steps += sam_steps
            self.sam_steps_total += sam_steps
            self.steps_total += steps
            done = bool(done_d) or steps == 0 or \
                hl + self.cfg.max_block > self.S
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])


# ----------------------------------------------------------------------
# Batched fused hybrid: continuous batching × SAM[Token Recycle]
# ----------------------------------------------------------------------

class BatchedFusedHybridEngine(ProgressStreamMixin):
    """B request slots × SAM[Token Recycle] stepped inside one fused device
    loop — the flagship hybrid drafter under continuous batching.

    Combines BatchedFusedSamEngine's slot scheduler (admit/finish on
    segment boundaries, one packed control fetch per segment, early segment
    exit when a slot frees and work is queued) with the hybrid body: every
    live slot picks retrieval CHAIN vs Token-Recycle TREE per step from its
    own suffix match, verifies the packed draft tree, gather-compacts its
    KV slice and scatters its own [V+1, K] harvest table.  The reference's
    strongest throughput configuration (samd/draft.py:52-63) has no batched
    counterpart at all; per-slot state here is what its global
    ForwardState/monkey-patching could not express."""

    # set by the paged subclass: (page_size, scratch_page, interpret)
    _paged_cfg = None

    def __init__(self, model_cfg: ModelConfig, params: Params,
                 hy_cfg: Optional[FusedHybridConfig] = None, *,
                 corpus: Optional[Sequence[int]] = None,
                 batch_size: int = 4, max_cache_len: int = 2048,
                 eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024,
                                                   2048),
                 inline_prefill: bool = False):
        self.model_cfg = model_cfg
        self.params = params
        # inline prefill: greedy prompts stream through the fused loop as
        # forced-accept chains (see BatchedFusedSamEngine); the per-block
        # harvest then covers the prompt rows exactly as one-shot prefill
        # does.  The EAGLE subclass keeps one-shot prefill (its net-KV
        # pairs are offset by one position; an inline first block would
        # land misaligned).
        self.inline_prefill = inline_prefill
        # short segments: admission granularity for continuous batching
        self.cfg = hy_cfg or FusedHybridConfig(steps_per_call=16)
        assert self.cfg.max_block >= max(self.cfg.n_predicts,
                                         self.cfg.tree_nodes)
        self.B = batch_size
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        (self.tr_parents, self.tr_depths, self.tr_children,
         self.tr_rank) = build_tr_topology(self.cfg.tree_nodes,
                                           self.cfg.topk)
        from .fused_base import build_optional_index, load_corpus_buffer

        self._init_kv()
        V = model_cfg.vocab_size
        self.harvests = jnp.zeros((batch_size, V + 1, self.cfg.topk),
                                  jnp.int32)
        self.seens = jnp.zeros((batch_size, V + 1), bool)
        self.histories = jnp.zeros((batch_size, max_cache_len), jnp.int32)
        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        # corpus/index ride the fused call as Partial args (no module
        # inlining — fused_base.make_retrieval_partial)
        from .fused_base import make_retrieval_partial

        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.max_block,
            corpus_index=self.corpus_index)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}
        self.sam_steps_total = 0
        self.steps_total = 0
        # host-side slot bookkeeping
        self._slot_req = [None] * batch_size
        self._slot_prompt = [0] * batch_size
        self._slot_max_new = [0] * batch_size
        self._slot_steps = [0] * batch_size
        self.queue = []
        self.results = {}
        self._next_id = 0

    # -- subclass hooks (paged variant swaps the KV backend) --------------
    def _init_kv(self):
        from .cache import init_kv_cache

        assert getattr(self.model_cfg, "kv_layout", "sd") == "sd", \
            "batched hybrid compaction assumes the sd cache layout"
        self.kv_k, self.kv_v = init_kv_cache(self.model_cfg, self.B, self.S)

    def _prefill_slot(self, slot: int, ids):
        P = _bucket(len(ids), self.prefill_buckets)
        if P not in self._prefill_fns:
            self._prefill_fns[P] = self._build_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(ids)] = ids
        (self.kv_k, self.kv_v, self.harvests, self.seens,
         self.histories, nt, last_logits) = self._prefill_fns[P](
            self.params, self.kv_k, self.kv_v, self.harvests,
            self.seens, self.histories, jnp.asarray(padded),
            jnp.int32(len(ids)), jnp.int32(slot))
        return nt, last_logits

    def _pre_segment(self, hist_lens, actives) -> None:
        pass

    def _fused_extra_args(self) -> tuple:
        return ()

    # device-state plumbing hooks: the scheduler run() is state-agnostic so
    # the EAGLE-2 subclass (draft-net KV + last hidden instead of harvest
    # tables) reuses it unchanged
    def _fused_static_args(self) -> tuple:
        return (self.params,)

    def _device_state(self) -> tuple:
        return (self.kv_k, self.kv_v, self.harvests, self.seens,
                self.histories)

    def _set_device_state(self, state) -> None:
        (self.kv_k, self.kv_v, self.harvests, self.seens,
         self.histories) = state

    def _release_slot(self, slot: int) -> None:
        pass

    def _should_retry_slot(self, slot: int, hist_len: int,
                           budget: int) -> bool:
        return False

    def _post_segment(self, stepped: int) -> None:
        pass

    def _can_admit(self, ids) -> bool:
        return True

    # ------------------------------------------------------------------
    def _build_prefill(self, P: int):
        cfg, S, K = self.model_cfg, self.S, self.cfg.topk
        V = cfg.vocab_size

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def prefill(params, kv_k, kv_v, harvests, seens, histories, tokens,
                    true_len, slot):
            from .cache import init_kv_cache

            from .cache import update_slot

            fk, fv = init_kv_cache(cfg, 1, S)
            logits, _, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, S))
            kv_k = update_slot(kv_k, fk, slot)
            kv_v = update_slot(kv_v, fv, slot)
            topk = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            rows = jnp.where(jnp.arange(P) < true_len, tokens, V)
            hrow = jax.lax.dynamic_slice(harvests, (slot, 0, 0),
                                         (1, V + 1, K))[0]
            hrow = hrow.at[rows].set(topk)
            harvests = jax.lax.dynamic_update_slice(harvests, hrow[None],
                                                    (slot, 0, 0))
            srow = jax.lax.dynamic_slice(seens, (slot, 0), (1, V + 1))[0]
            srow = srow.at[rows].set(True).at[V].set(False)
            seens = jax.lax.dynamic_update_slice(seens, srow[None],
                                                 (slot, 0))
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row,
                                                     (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k, kv_v, harvests, seens, histories,
                    jnp.argmax(last).astype(jnp.int32), last)

        return prefill

    def _build_fused(self, sig: Optional[tuple] = None):
        from .verify import make_accept_fn

        sampling = sig is not None
        accept = make_accept_fn(sig) if sampling else None
        cfg, S, B = self.model_cfg, self.S, self.B
        hc = self.cfg
        M = hc.max_block
        K = hc.topk
        V = cfg.vocab_size
        tr_parents = self.tr_parents
        tr_rank = self.tr_rank
        chain_parents = jnp.concatenate([
            jnp.arange(-1, hc.n_predicts - 1, dtype=jnp.int32),
            jnp.arange(hc.n_predicts, M, dtype=jnp.int32)])
        tree_parents_packed = jnp.concatenate([
            jnp.asarray(tr_parents),
            jnp.arange(len(tr_parents), M, dtype=jnp.int32)])
        tr_draft = make_tr_draft(tr_parents, self.tr_depths, tr_rank, M)
        inline = getattr(self, "inline_prefill", False)

        def retrieval_draft(retrieve, history, hist_len, start):
            match, use_dyn, raw, cont_avail = retrieve(history, hist_len,
                                                       start)
            avail = jnp.minimum(cont_avail, hc.n_predicts - 1)
            keep = jnp.arange(M - 1) < avail
            tokens = jnp.concatenate([
                raw[:1], jnp.where(keep, raw[1:], -1)]).astype(jnp.int32)
            tokens = jnp.where(jnp.arange(M) < hc.n_predicts, tokens, -1)
            return match, tokens

        paged = self._paged_cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def fused(params, kv_k, kv_v, harvests, seens, histories, hist_lens,
                  starts, budgets, actives, eos_id, keys, samp_flags,
                  refill, prompt_lens, retrieve, tables=None,
                  alloc_limits=None):
            if paged is None:
                alloc_limits = S
                paged_aux = None
            else:
                from .paged_kv import PagedAux

                paged_aux = PagedAux(tables, paged[1], paged[2])
            init_lives = actives & (budgets > 0) & \
                (hist_lens + M <= alloc_limits)

            def cond(st):
                (kv_k, kv_v, harvests, seens, histories, hist_lens, starts,
                 budgets, lives, steps, slot_steps, sam_steps, keys) = st
                freed = jnp.any(init_lives & ~lives)
                return (jnp.any(lives) & (steps < hc.steps_per_call)
                        & ~(refill & freed))

            def body(st):
                (kv_k, kv_v, harvests, seens, histories, hist_lens, starts,
                 budgets, lives, steps, slot_steps, sam_steps, keys) = st
                matches, chain_tokens = jax.vmap(
                    lambda h, l, s: retrieval_draft(retrieve, h, l, s)
                )(histories, hist_lens, starts)              # [B], [B, M]
                use_sam = matches >= hc.len_threshold        # [B]
                tree_tokens = jax.vmap(tr_draft)(harvests, seens, starts)
                draft_tokens = jnp.where(use_sam[:, None], chain_tokens,
                                         tree_tokens)        # [B, M]
                parents = jnp.where(use_sam[:, None], chain_parents[None],
                                    tree_parents_packed[None])
                if inline:
                    # inline prefill: draft the next M prompt tokens as a
                    # forced-accept chain (see BatchedFusedSamEngine)
                    pf_rest = prompt_lens - hist_lens        # [B]
                    in_pf = pf_rest > 0
                    forced = jnp.minimum(pf_rest, M).astype(jnp.int32)
                    chunks = jax.vmap(
                        lambda h, o: jax.lax.dynamic_slice(h, (o,), (M,))
                    )(histories, hist_lens)
                    # invalidate rows beyond the prompt so the harvest
                    # scatter ignores them (rows = V for draft < 0)
                    chunks = jnp.where(
                        jnp.arange(M)[None, :] < forced[:, None], chunks,
                        -1)
                    draft_tokens = jnp.where(in_pf[:, None], chunks,
                                             draft_tokens)
                    # FULL-M chain: the hybrid's chain_parents self-parent
                    # rows beyond n_predicts (retrieval drafts stop there),
                    # but a prompt chunk uses the whole block
                    pf_parents = jnp.arange(-1, M - 1, dtype=jnp.int32)
                    parents = jnp.where(in_pf[:, None], pf_parents[None],
                                        parents)
                    use_sam = use_sam & ~in_pf
                packed = jnp.stack([jnp.maximum(draft_tokens, 0), parents],
                                   axis=1)                   # [B, 2, M]
                toks, tree_mask, depths, paths = jax.vmap(
                    lambda d: unpack_draft(d, M))(packed)
                if paged is None:
                    masks = jax.vmap(
                        lambda tm, hl: block_decode_mask(tm, hl, S)[0]
                    )(tree_mask, hist_lens)                  # [B, M, S]
                else:
                    from .ops.paged_attention import boundary_mask_window

                    masks = jax.vmap(
                        lambda tm, hl: boundary_mask_window(tm, hl,
                                                            paged[0])
                    )(tree_mask, hist_lens)                  # [B,M,W·page]
                logits, _, kv_k, kv_v = forward(
                    params, cfg, toks, depths + hist_lens[:, None],
                    kv_k, kv_v, hist_lens, masks, paged=paged_aux)
                res = jax.vmap(greedy_accept)(logits, draft_tokens, paths)
                alens = res.accept_len
                path_nodes = res.path_nodes
                acc = res.accepted_tokens
                bonus = res.next_token
                if sampling:
                    split = jax.vmap(jax.random.split)(keys)
                    subs, keys = split[:, 0], split[:, 1]
                    res_s = jax.vmap(accept)(logits, draft_tokens, paths,
                                             subs)
                    alens = jnp.where(samp_flags, res_s.accept_len, alens)
                    path_nodes = jnp.where(samp_flags[:, None],
                                           res_s.path_nodes, path_nodes)
                    acc = jnp.where(samp_flags[:, None],
                                    res_s.accepted_tokens, acc)
                    bonus = jnp.where(samp_flags, res_s.next_token, bonus)
                if inline:
                    # force-accept the prompt chunk: the chain path is the
                    # identity, so path_nodes/acc stay correct; the
                    # boundary block's bonus (argmax at the last prompt
                    # row) is the first generated token
                    alens = jnp.where(in_pf, forced, alens)
                    acc = jnp.where(in_pf[:, None],
                                    jnp.maximum(draft_tokens, 0)
                                    [:, :acc.shape[1]], acc)
                    path_nodes = jnp.where(
                        in_pf[:, None],
                        jnp.arange(path_nodes.shape[1],
                                   dtype=path_nodes.dtype)[None, :],
                        path_nodes)
                    last_logits_tok = jnp.argmax(
                        logits[jnp.arange(B),
                               jnp.maximum(forced - 1, 0)], axis=-1
                    ).astype(jnp.int32)
                    bonus = jnp.where(in_pf, last_logits_tok, bonus)
                    nxt_prompt = jax.vmap(lambda h, o: h[o])(
                        histories, jnp.minimum(hist_lens + M,
                                               jnp.int32(S - 1)))
                    bonus = jnp.where(in_pf & (pf_rest > M), nxt_prompt,
                                      bonus)

                # per-slot KV gather-compaction of the winning path
                if paged is None:
                    from .cache import compact_accepted_batched

                    kv_k = compact_accepted_batched(kv_k, hist_lens,
                                                    path_nodes, M)
                    kv_v = compact_accepted_batched(kv_v, hist_lens,
                                                    path_nodes, M)
                else:
                    from .paged_kv import paged_compact_block

                    kv_k = paged_compact_block(kv_k, tables, hist_lens,
                                               path_nodes, M, paged[1])
                    kv_v = paged_compact_block(kv_v, tables, hist_lens,
                                               path_nodes, M, paged[1])
                # Token-Recycle harvest of the whole block (live slots only:
                # a dead slot's stale logits must not scribble tables a
                # re-admitted request would inherit)
                from .fused_base import harvest_topk

                topk = harvest_topk(logits, K, hc.approx_harvest)
                rows = jnp.where(lives[:, None] & (draft_tokens >= 0),
                                 draft_tokens, V)            # [B, M]
                harvests = jax.vmap(lambda h, r, t: h.at[r].set(t))(
                    harvests, rows, topk)
                seens = jax.vmap(
                    lambda s, r: s.at[r].set(True).at[V].set(False)
                )(seens, rows)
                # commit (eos clamp per slot)
                acc = jnp.maximum(acc, 0)                    # [B, Dp]
                Dp = acc.shape[1]
                is_eos = (acc == eos_id) & \
                    (jnp.arange(Dp)[None] < alens[:, None])
                if inline:
                    is_eos = is_eos & ~in_pf[:, None]
                any_eos = jnp.any(is_eos, axis=1)
                alens = jnp.where(any_eos,
                                  jnp.argmax(is_eos, axis=1).astype(jnp.int32)
                                  + 1, alens)
                alens = jnp.where(lives, alens, 0)
                histories = jax.vmap(
                    lambda h, a, o: jax.lax.dynamic_update_slice(h, a, (o,))
                )(histories, acc, hist_lens)
                hist_lens = hist_lens + alens
                if inline:   # prompt tokens consume no generation budget
                    budgets = budgets - jnp.where(in_pf, 0, alens)
                    slot_steps = slot_steps + jnp.where(
                        in_pf, 0, lives.astype(jnp.int32))
                else:
                    budgets = budgets - alens
                    slot_steps = slot_steps + lives.astype(jnp.int32)
                starts = jnp.where(lives, bonus, starts)
                sam_steps = sam_steps + (lives & use_sam).astype(jnp.int32)
                lives = lives & ~any_eos & (budgets > 0) & \
                    (hist_lens + M <= alloc_limits)
                return (kv_k, kv_v, harvests, seens, histories, hist_lens,
                        starts, budgets, lives, steps + 1, slot_steps,
                        sam_steps, keys)

            init = (kv_k, kv_v, harvests, seens, histories, hist_lens,
                    starts, budgets, init_lives, jnp.int32(0),
                    jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                    keys)
            (kv_k, kv_v, harvests, seens, histories, hist_lens, starts,
             budgets, lives, steps, slot_steps, sam_steps, keys) = \
                jax.lax.while_loop(cond, body, init)
            key_rows = jax.lax.bitcast_convert_type(keys, jnp.int32).T
            ctrl = jnp.concatenate([
                jnp.stack([hist_lens, starts, budgets,
                           lives.astype(jnp.int32), slot_steps, sam_steps]),
                key_rows], axis=0)
            return (kv_k, kv_v, harvests, seens, histories, ctrl)

        return fused

    # -- scheduler (BatchedFusedSamEngine's protocol) ---------------------
    def add_request(self, input_ids: Sequence[int],
                    gen_config: Optional[GenerationConfig] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, list(input_ids),
                           gen_config or GenerationConfig()))
        return rid

    def _admit_inline(self, slot: int) -> None:
        """Inline-prefill admission bookkeeping (paged: free old pages)."""
        if self._paged_cfg is not None:
            self.page_reqs[slot].release()

    def _seed_history(self, slot: int, ids) -> None:
        """Inline-prefill admission: upload the prompt row only."""
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
            self._pre_segment(hist_lens, actives)
            *state, ctrl = fused(
                *self._fused_static_args(), *self._device_state(),
                jnp.asarray(hist_lens),
                jnp.asarray(starts), jnp.asarray(budgets),
                jnp.asarray(actives), jnp.int32(self.eos_token_id),
                jnp.asarray(keys), jnp.asarray(samp_flags),
                jnp.bool_(bool(self.queue)), jnp.asarray(prompt_lens),
                self._retrieve, *self._fused_extra_args())
            self._set_device_state(state)
            ctrl_np = np.asarray(ctrl)
            hist_lens = ctrl_np[0].copy()
            starts = ctrl_np[1].copy()
            budgets = ctrl_np[2].copy()
            lives = ctrl_np[3].astype(bool)
            steps_arr = ctrl_np[4]
            self.sam_steps_total += int(ctrl_np[5].sum())
            self.steps_total += int(steps_arr[actives].sum()) \
                if actives.any() else 0
            keys = np.ascontiguousarray(ctrl_np[6:8].T).view(np.uint32)
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
                    continue  # transient stall (paged capacity); stays active
                if hist_np is None:
                    hist_np = np.asarray(self.histories)
                ids = hist_np[i, :hist_lens[i]].tolist()
                plen = self._slot_prompt[i]
                gen_part = ids[plen:]
                if self.eos_token_id in gen_part:
                    gen_part = gen_part[:gen_part.index(self.eos_token_id)
                                        + 1]
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


class PagedBatchedFusedHybridEngine(BatchedFusedHybridEngine):
    """BatchedFusedHybridEngine (the flagship SAM[Token Recycle] under
    continuous batching) on a shared page pool — tree drafts additionally
    gather-compact the accepted path directly on pages
    (paged_kv.paged_compact_block).  Page lifecycle, int8 page option and
    capacity semantics are PagedBatchedFusedSamEngine's."""

    def __init__(self, *args, n_pages: int = 64, page_size: int = 128,
                 quantized_kv: bool = False,
                 interpret: Optional[bool] = None, **kwargs):
        self._n_pages = n_pages
        self._page_size = page_size
        self._quantized_kv = quantized_kv
        self._interpret = interpret
        super().__init__(*args, **kwargs)

    # page-pool hooks shared verbatim with the chain engine
    from .fused_sam import PagedBatchedFusedSamEngine as _P
    _init_kv = _P._init_kv
    _tables = _P._tables
    _fused_extra_args = _P._fused_extra_args
    _release_slot = _P._release_slot
    _should_retry_slot = _P._should_retry_slot
    _post_segment = _P._post_segment
    _can_admit = _P._can_admit
    live_kv_tokens = _P.live_kv_tokens
    del _P

    def _pre_segment(self, hist_lens, actives) -> None:
        M = self.cfg.max_block
        grow = self.cfg.steps_per_call * M
        for i in range(self.B):
            if not actives[i]:
                self._alloc_limits[i] = 0
                continue
            want = min(self.S, int(hist_lens[i]) + grow)
            self._alloc_limits[i] = self.page_reqs[i].ensure_upto(want)
        self.peak_pages = max(self.peak_pages,
                              self.pool.n_pages - len(self.pool._free))

    # -- prefill: dense forward + page scatter + harvest/seen rows ---------
    def _build_scatter_prefill(self, P: int):
        from .cache import init_kv_cache
        from .paged_kv import paged_flat_indices, paged_write_block

        cfg, S, K = self.model_cfg, self.S, self.cfg.topk
        V = cfg.vocab_size
        page, scratch, _ = self._paged_cfg

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def prefill(params, kv_k, kv_v, harvests, seens, histories, tokens,
                    true_len, slot, table):
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
            topk = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            rows = jnp.where(jnp.arange(P) < true_len, tokens, V)
            hrow = jax.lax.dynamic_slice(harvests, (slot, 0, 0),
                                         (1, V + 1, K))[0]
            hrow = hrow.at[rows].set(topk)
            harvests = jax.lax.dynamic_update_slice(harvests, hrow[None],
                                                    (slot, 0, 0))
            srow = jax.lax.dynamic_slice(seens, (slot, 0), (1, V + 1))[0]
            srow = srow.at[rows].set(True).at[V].set(False)
            seens = jax.lax.dynamic_update_slice(seens, srow[None],
                                                 (slot, 0))
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row,
                                                     (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k, kv_v, harvests, seens, histories,
                    jnp.argmax(last).astype(jnp.int32), last)

        return prefill

    def _prefill_slot(self, slot: int, ids):
        P = _bucket(len(ids), self.prefill_buckets)
        if not hasattr(self, "_scatter_prefill_fns"):
            self._scatter_prefill_fns = {}
        if P not in self._scatter_prefill_fns:
            self._scatter_prefill_fns[P] = self._build_scatter_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(ids)] = ids
        req = self.page_reqs[slot]
        req.release()
        req.ensure(min(-(-P // self._page_size) * self._page_size, self.S))
        req.length = len(ids)
        (self.kv_k, self.kv_v, self.harvests, self.seens, self.histories,
         nt, last_logits) = self._scatter_prefill_fns[P](
            self.params, self.kv_k, self.kv_v, self.harvests, self.seens,
            self.histories, jnp.asarray(padded), jnp.int32(len(ids)),
            jnp.int32(slot), jnp.asarray(self.page_reqs[slot].host_table()))
        return nt, last_logits


# ----------------------------------------------------------------------
# Fused SAM[EAGLE-2]: retrieval chains vs draft-net trees, on device
# ----------------------------------------------------------------------

@dataclass(frozen=True)
class FusedHybridEagleConfig:
    """SAM-Decoding[EAGLE2] (the reference's strongest configuration,
    README.md:57) as a fused device loop."""
    max_ngram: int = 8
    ext: int = 56
    n_predicts: int = 40
    len_threshold: int = 5
    len_bias: int = 5
    eagle_depth: int = 5
    eagle_topk: int = 8
    eagle_total: int = 63
    steps_per_call: int = 256
    corpus_capacity: int = 1 << 15
    max_block: int = 64
    # n-gram hash index for corpus-scale retrieval (ops/ngram_index.py)
    indexed: bool = False
    index_grams: tuple = (32, 16, 8, 7, 6, 5, 4, 3, 2, 1)
    index_bucket_cap: int = 8
    index_keep_latest: int = 0


class FusedHybridEagleEngine:
    """Per step: SAM retrieval chain when the suffix match clears the
    threshold, otherwise an EAGLE-2 beam tree; one packed-draft verify; the
    draft net's stable KV always extends with the accepted (token, target
    hidden) pairs so either source stays ready."""

    def __init__(self, model_cfg: ModelConfig, params: Params,
                 hy_cfg: Optional[FusedHybridEagleConfig] = None, *,
                 net_params=None,
                 corpus: Optional[Sequence[int]] = None,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        from .drafters.eagle.net import (
            EagleNetConfig,
            init_eagle_kv,
            init_eagle_params,
        )

        self.model_cfg = model_cfg
        self.params = params
        self.cfg = hy_cfg or FusedHybridEagleConfig()
        assert self.cfg.max_block >= max(self.cfg.n_predicts,
                                         self.cfg.eagle_total + 1)
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        self.net_cfg = EagleNetConfig.from_target(model_cfg)
        if net_params is None:
            net_params = init_eagle_params(self.net_cfg,
                                           jax.random.PRNGKey(7))
        self.net_params = net_params

        from .cache import init_kv_cache
        from .fused_base import build_optional_index, load_corpus_buffer

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        self.ekv_k, self.ekv_v = init_eagle_kv(self.net_cfg, 1, max_cache_len)
        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        # corpus/index ride the fused call as Partial args (no module
        # inlining — fused_base.make_retrieval_partial)
        from .fused_base import make_retrieval_partial

        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.max_block,
            corpus_index=self.corpus_index)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self.sam_steps = 0        # last request's retrieval-draft steps
        self.sam_steps_total = 0  # across all requests (bench/diagnostics)
        self.steps_total = 0

    def _head(self):
        return (self.params["embed"].T if self.model_cfg.tie_embeddings
                else self.params["lm_head"])

    def _build_prefill(self, P: int):
        from .drafters.eagle.net import eagle_forward

        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
        def prefill(params, net_params, kv_k, kv_v, ekv_k, ekv_v, tokens,
                    true_len):
            logits, hidden, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, S))
            s = jnp.arange(S)[None, :]
            mask = (s <= jnp.arange(P)[:, None])[None]
            _, ekv_k, ekv_v = eagle_forward(
                net_params, ncfg, params["embed"][tokens[1:]][None],
                hidden[0][:-1][None], jnp.arange(P - 1)[None, :],
                ekv_k, ekv_v, jnp.int32(0), mask[:, :P - 1])
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            last_hidden = jax.lax.dynamic_index_in_dim(
                hidden[0], true_len - 1, axis=0, keepdims=False)
            return (kv_k, kv_v, ekv_k, ekv_v,
                    jnp.argmax(last).astype(jnp.int32), last_hidden)

        return prefill

    def _build_fused(self):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        from .drafters.eagle.net import eagle_forward
        from .eagle_fused import make_eagle_expand

        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S
        hc = self.cfg
        M = hc.max_block
        expand, TREE_SLOTS = make_eagle_expand(
            net_cfg=ncfg, S=S, depth=hc.eagle_depth, topk=hc.eagle_topk,
            total=hc.eagle_total, M=M)
        chain_parents = jnp.concatenate([
            jnp.arange(-1, hc.n_predicts - 1, dtype=jnp.int32),
            jnp.arange(hc.n_predicts, M, dtype=jnp.int32)])
        tie = self.model_cfg.tie_embeddings

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6))
        def fused(params, net_params, kv_k, kv_v, ekv_k, ekv_v, history,
                  hist_len, start_token, last_hidden, budget, eos_id,
                  retrieve):
            # embed/head from the TRACED params: closure-captured weights
            # become HLO constants (7B exceeds the remote-compile size cap)
            embed = params["embed"]
            head = embed.T if tie else params["lm_head"]

            def cond(st):
                (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start,
                 last_hidden, budget, done, steps, sam_steps) = st
                return (~done & (steps < hc.steps_per_call) & (budget > 0)
                        & (hist_len + M <= S)
                        & (hist_len + TREE_SLOTS <= S))

            def body(st):
                (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start,
                 last_hidden, budget, done, steps, sam_steps) = st
                # SAM retrieval chain (fixed n_predicts, -1 beyond avail)
                match, _, raw, cont_avail = retrieve(history, hist_len, start)
                avail = jnp.minimum(cont_avail, hc.n_predicts - 1)
                keep = jnp.arange(M - 1) < avail
                chain_tokens = jnp.concatenate([
                    raw[:1], jnp.where(keep, raw[1:], -1)]).astype(jnp.int32)
                chain_tokens = jnp.where(jnp.arange(M) < hc.n_predicts,
                                         chain_tokens, -1)
                use_sam = match >= hc.len_threshold
                # EAGLE tree (always expanded; draft-net KV scratch lives
                # after the stable prefix at hist_len - 1)
                eagle_packed, ekv_k, ekv_v = expand(
                    net_params, embed, head, ekv_k, ekv_v, hist_len - 1,
                    last_hidden, start)
                draft_tokens = jnp.where(use_sam, chain_tokens,
                                         eagle_packed[0])
                parents = jnp.where(use_sam, chain_parents, eagle_packed[1])
                packed = jnp.stack([jnp.maximum(draft_tokens, 0), parents])
                toks, tree_mask, depths, paths = unpack_draft(packed, M)
                mask = block_decode_mask(tree_mask, hist_len, S)
                logits, hidden, kv_k, kv_v = forward(
                    params, cfg, toks[None], depths[None, :] + hist_len,
                    kv_k, kv_v, hist_len, mask)
                res = greedy_accept(logits[0], draft_tokens, paths)
                kv_k = compact_accepted(kv_k, hist_len, res.path_nodes, M, seq_axis=_sa)
                kv_v = compact_accepted(kv_v, hist_len, res.path_nodes, M, seq_axis=_sa)
                alen = res.accept_len
                acc = jnp.maximum(res.accepted_tokens, 0)
                Dd = acc.shape[0]
                is_eos = (acc == eos_id) & (jnp.arange(Dd) < alen)
                any_eos = jnp.any(is_eos)
                alen = jnp.where(any_eos,
                                 jnp.argmax(is_eos).astype(jnp.int32) + 1,
                                 alen)
                # extend draft-net stable KV with accepted (token, hidden)
                path_hidden = hidden[0][res.path_nodes]
                prev_h = jnp.concatenate([last_hidden[None],
                                          path_hidden[:-1]], axis=0)
                offs = hist_len - 1
                s_idx2 = jnp.arange(S)[None, :]
                emask = (s_idx2 <= (offs + jnp.arange(Dd))[:, None])[None]
                _, ekv_k, ekv_v = eagle_forward(
                    net_params, ncfg, embed[acc][None], prev_h[None],
                    offs + jnp.arange(Dd)[None, :], ekv_k, ekv_v, offs,
                    emask)
                last_hidden = path_hidden[alen - 1]
                history = jax.lax.dynamic_update_slice(history, acc,
                                                       (hist_len,))
                hist_len = hist_len + alen
                budget = budget - alen
                done = any_eos | (budget <= 0)
                return (kv_k, kv_v, ekv_k, ekv_v, history, hist_len,
                        res.next_token, last_hidden, budget, done, steps + 1,
                        sam_steps + use_sam.astype(jnp.int32))

            init = (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start_token,
                    last_hidden, budget, jnp.bool_(False), jnp.int32(0),
                    jnp.int32(0))
            out = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            ctrl = pack_ctrl(out[5], out[10], out[11], out[9])
            return out[:9] + (ctrl,)

        return fused

    def generate(self, input_ids: Sequence[int],
                 gen_config: Optional[GenerationConfig] = None) -> Outputs:
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        P = _bucket(len(input_ids), self.prefill_buckets)
        if P not in self._prefill_fns:
            self._prefill_fns[P] = self._build_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(input_ids)] = input_ids
        (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v, next_token,
         last_hidden) = self._prefill_fns[P](
            self.params, self.net_params, self.kv_k, self.kv_v,
            self.ekv_k, self.ekv_v, jnp.asarray(padded),
            jnp.int32(len(input_ids)))

        from .fused_base import init_history

        history = init_history(input_ids, self.S)
        hist_len = jnp.int32(len(input_ids))
        budget = jnp.int32(gen.max_new_tokens)
        start = next_token
        done = False
        decode_steps = 0
        self.sam_steps = 0
        hl = len(input_ids)
        while not done:
            (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v, history, hist_len,
             start, last_hidden, budget, ctrl) = \
                self._fused(self.params, self.net_params, self.kv_k,
                            self.kv_v, self.ekv_k, self.ekv_v, history,
                            hist_len, start, last_hidden, budget,
                            jnp.int32(self.eos_token_id), self._retrieve)
            hl, steps, sam_steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            self.sam_steps += sam_steps
            self.sam_steps_total += sam_steps
            self.steps_total += steps
            done = bool(done_d) or steps == 0 or \
                hl + self.cfg.max_block > self.S
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])


class BatchedFusedHybridEagleEngine(BatchedFusedHybridEngine):
    """B request slots × SAM[EAGLE-2] in one fused device loop.

    The reference's strongest-accept configuration (README.md:57) under
    continuous batching: every live slot picks retrieval CHAIN vs an
    EAGLE-2 beam TREE per step from its own suffix match, the draft net's
    beam expansion runs vmapped over slots against per-slot draft-net KV,
    and each slot's stable net KV extends with its accepted (token, target
    hidden) pairs.  Reuses BatchedFusedHybridEngine's scheduler verbatim
    (admit/finish on segment boundaries, one packed control fetch per
    segment) through the device-state hooks — the per-slot state here is
    (draft-net KV, last hidden) instead of (harvest table, seen mask)."""

    def __init__(self, model_cfg: ModelConfig, params: Params,
                 hy_cfg: Optional[FusedHybridEagleConfig] = None, *,
                 net_params=None,
                 corpus: Optional[Sequence[int]] = None,
                 batch_size: int = 4, max_cache_len: int = 2048,
                 eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024,
                                                   2048)):
        from .drafters.eagle.net import (
            EagleNetConfig,
            init_eagle_kv,
            init_eagle_params,
        )
        from .fused_base import build_optional_index, load_corpus_buffer

        self.model_cfg = model_cfg
        self.params = params
        self.cfg = hy_cfg or FusedHybridEagleConfig(steps_per_call=16)
        assert self.cfg.max_block >= max(self.cfg.n_predicts,
                                         self.cfg.eagle_total + 1)
        self.B = batch_size
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        self.net_cfg = EagleNetConfig.from_target(model_cfg)
        if net_params is None:
            net_params = init_eagle_params(self.net_cfg,
                                           jax.random.PRNGKey(7))
        self.net_params = net_params
        # one-shot prefill only: the draft net's (token, hidden) pairs sit
        # one position behind the target KV, so an inline first block would
        # land misaligned (write offset hist-1 = -1 clamps)
        self.inline_prefill = False

        self._init_kv()
        self.ekv_k, self.ekv_v = init_eagle_kv(self.net_cfg, batch_size,
                                               max_cache_len)
        self.last_hiddens = jnp.zeros(
            (batch_size, model_cfg.hidden_size), model_cfg.dtype)
        self.histories = jnp.zeros((batch_size, max_cache_len), jnp.int32)
        self.corpus, self.corpus_len = load_corpus_buffer(
            corpus, self.cfg.corpus_capacity)
        self.corpus_index = build_optional_index(corpus, self.cfg)
        # corpus/index ride the fused call as Partial args (no module
        # inlining — fused_base.make_retrieval_partial)
        from .fused_base import make_retrieval_partial

        self._retrieve = make_retrieval_partial(
            S=self.S, corpus=self.corpus, corpus_len=self.corpus_len,
            max_ngram=self.cfg.max_ngram, ext=self.cfg.ext,
            len_bias=self.cfg.len_bias, block=self.cfg.max_block,
            corpus_index=self.corpus_index)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}
        self.sam_steps_total = 0
        self.steps_total = 0
        self._slot_req = [None] * batch_size
        self._slot_prompt = [0] * batch_size
        self._slot_max_new = [0] * batch_size
        self._slot_steps = [0] * batch_size
        self.queue = []
        self.results = {}
        self._next_id = 0

    def _head(self):
        return (self.params["embed"].T if self.model_cfg.tie_embeddings
                else self.params["lm_head"])

    # -- device-state hooks (scheduler run() is inherited) ----------------
    def _fused_static_args(self) -> tuple:
        return (self.params, self.net_params)

    def _device_state(self) -> tuple:
        return (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v,
                self.histories, self.last_hiddens)

    def _set_device_state(self, state) -> None:
        (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v,
         self.histories, self.last_hiddens) = state

    def _prefill_slot(self, slot: int, ids):
        P = _bucket(len(ids), self.prefill_buckets)
        if P not in self._prefill_fns:
            self._prefill_fns[P] = self._build_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(ids)] = ids
        (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v, self.histories,
         self.last_hiddens, nt, last_logits) = self._prefill_fns[P](
            self.params, self.net_params, self.kv_k, self.kv_v,
            self.ekv_k, self.ekv_v, self.histories, self.last_hiddens,
            jnp.asarray(padded), jnp.int32(len(ids)), jnp.int32(slot))
        return nt, last_logits

    # ------------------------------------------------------------------
    def _build_prefill(self, P: int):
        from .drafters.eagle.net import eagle_forward, init_eagle_kv

        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6, 7))
        def prefill(params, net_params, kv_k, kv_v, ekv_k, ekv_v,
                    histories, last_hiddens, tokens, true_len, slot):
            from .cache import init_kv_cache, update_slot

            fk, fv = init_kv_cache(cfg, 1, S)
            logits, hidden, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, S))
            kv_k = update_slot(kv_k, fk, slot)
            kv_v = update_slot(kv_v, fv, slot)
            # draft-net prefill over (token[1:], hidden[:-1]) pairs
            ek, ev = init_eagle_kv(ncfg, 1, S)
            s = jnp.arange(S)[None, :]
            mask = (s <= jnp.arange(P)[:, None])[None]
            _, ek, ev = eagle_forward(
                net_params, ncfg, params["embed"][tokens[1:]][None],
                hidden[0][:-1][None], jnp.arange(P - 1)[None, :],
                ek, ev, jnp.int32(0), mask[:, :P - 1])
            ekv_k = jax.lax.dynamic_update_slice(
                ekv_k, ek, (slot, 0, 0, 0))
            ekv_v = jax.lax.dynamic_update_slice(
                ekv_v, ev, (slot, 0, 0, 0))
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row,
                                                     (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            last_hidden = jax.lax.dynamic_index_in_dim(
                hidden[0], true_len - 1, axis=0, keepdims=False)
            last_hiddens = jax.lax.dynamic_update_slice(
                last_hiddens, last_hidden[None].astype(last_hiddens.dtype),
                (slot, 0))
            return (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                    jnp.argmax(last).astype(jnp.int32), last)

        return prefill

    def _build_fused(self, sig: Optional[tuple] = None):
        from .cache import compact_accepted_batched
        from .drafters.eagle.net import eagle_forward
        from .eagle_fused import make_eagle_expand
        from .verify import make_accept_fn

        sampling = sig is not None
        accept = make_accept_fn(sig) if sampling else None
        cfg, ncfg, S, B = self.model_cfg, self.net_cfg, self.S, self.B
        hc = self.cfg
        M = hc.max_block
        expand, TREE_SLOTS = make_eagle_expand(
            net_cfg=ncfg, S=S, depth=hc.eagle_depth, topk=hc.eagle_topk,
            total=hc.eagle_total, M=M)
        chain_parents = jnp.concatenate([
            jnp.arange(-1, hc.n_predicts - 1, dtype=jnp.int32),
            jnp.arange(hc.n_predicts, M, dtype=jnp.int32)])
        tie = self.model_cfg.tie_embeddings

        def retrieval_draft(retrieve, history, hist_len, start):
            match, _, raw, cont_avail = retrieve(history, hist_len, start)
            avail = jnp.minimum(cont_avail, hc.n_predicts - 1)
            keep = jnp.arange(M - 1) < avail
            tokens = jnp.concatenate([
                raw[:1], jnp.where(keep, raw[1:], -1)]).astype(jnp.int32)
            tokens = jnp.where(jnp.arange(M) < hc.n_predicts, tokens, -1)
            return match, tokens

        def expand1(net_params, embed, head, ek, ev, stable_len,
                    last_hidden, start):
            # vmap strips the slot axis; the single-stream expansion wants
            # a leading batch dim of 1 on the net KV
            packed, ek2, ev2 = expand(net_params, embed, head, ek[None],
                                      ev[None], stable_len, last_hidden,
                                      start)
            return packed, ek2[0], ev2[0]

        def extend1(net_params, ek, ev, acc_emb, prev_h, offs):
            # extend one slot's stable net KV with its accepted pairs
            Dp = acc_emb.shape[0]
            s_idx = jnp.arange(S)[None, :]
            emask = (s_idx <= (offs + jnp.arange(Dp))[:, None])[None]
            _, ek2, ev2 = eagle_forward(
                net_params, ncfg, acc_emb[None], prev_h[None],
                (offs + jnp.arange(Dp))[None], ek[None], ev[None], offs,
                emask)
            return ek2[0], ev2[0]

        # paged variant: the TARGET KV rides the page pool; the draft net's
        # KV stays dense per slot (1 layer × H — small)
        paged = self._paged_cfg

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6, 7))
        def fused(params, net_params, kv_k, kv_v, ekv_k, ekv_v, histories,
                  last_hiddens, hist_lens, starts, budgets, actives, eos_id,
                  keys, samp_flags, refill, prompt_lens, retrieve,
                  tables=None, alloc_limits=None):
            if paged is None:
                alloc_limits = S
                paged_aux = None
            else:
                from .paged_kv import PagedAux

                paged_aux = PagedAux(tables, paged[1], paged[2])
            embed = params["embed"]
            head = embed.T if tie else params["lm_head"]
            init_lives = actives & (budgets > 0) & \
                (hist_lens + M <= alloc_limits) & \
                (hist_lens + TREE_SLOTS <= S)

            def cond(st):
                (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                 hist_lens, starts, budgets, lives, steps, slot_steps,
                 sam_steps, keys) = st
                freed = jnp.any(init_lives & ~lives)
                return (jnp.any(lives) & (steps < hc.steps_per_call)
                        & ~(refill & freed))

            def body(st):
                (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                 hist_lens, starts, budgets, lives, steps, slot_steps,
                 sam_steps, keys) = st
                matches, chain_tokens = jax.vmap(
                    lambda h, l, s: retrieval_draft(retrieve, h, l, s))(
                    histories, hist_lens, starts)            # [B], [B, M]
                use_sam = matches >= hc.len_threshold        # [B]
                eagle_packed, ekv_k, ekv_v = jax.vmap(
                    expand1, in_axes=(None, None, None, 0, 0, 0, 0, 0))(
                    net_params, embed, head, ekv_k, ekv_v, hist_lens - 1,
                    last_hiddens, starts)                    # [B, 2, M]
                draft_tokens = jnp.where(use_sam[:, None], chain_tokens,
                                         eagle_packed[:, 0])
                parents = jnp.where(use_sam[:, None], chain_parents[None],
                                    eagle_packed[:, 1])
                packed = jnp.stack([jnp.maximum(draft_tokens, 0), parents],
                                   axis=1)                   # [B, 2, M]
                toks, tree_mask, depths, paths = jax.vmap(
                    lambda d: unpack_draft(d, M))(packed)
                if paged is None:
                    masks = jax.vmap(
                        lambda tm, hl: block_decode_mask(tm, hl, S)[0]
                    )(tree_mask, hist_lens)                  # [B, M, S]
                else:
                    from .ops.paged_attention import boundary_mask_window

                    masks = jax.vmap(
                        lambda tm, hl: boundary_mask_window(tm, hl,
                                                            paged[0])
                    )(tree_mask, hist_lens)                  # [B,M,W·page]
                logits, hidden, kv_k, kv_v = forward(
                    params, cfg, toks, depths + hist_lens[:, None],
                    kv_k, kv_v, hist_lens, masks, paged=paged_aux)
                res = jax.vmap(greedy_accept)(logits, draft_tokens, paths)
                alens = res.accept_len
                path_nodes = res.path_nodes
                acc = res.accepted_tokens
                bonus = res.next_token
                if sampling:
                    split = jax.vmap(jax.random.split)(keys)
                    subs, keys = split[:, 0], split[:, 1]
                    res_s = jax.vmap(accept)(logits, draft_tokens, paths,
                                             subs)
                    alens = jnp.where(samp_flags, res_s.accept_len, alens)
                    path_nodes = jnp.where(samp_flags[:, None],
                                           res_s.path_nodes, path_nodes)
                    acc = jnp.where(samp_flags[:, None],
                                    res_s.accepted_tokens, acc)
                    bonus = jnp.where(samp_flags, res_s.next_token, bonus)

                if paged is None:
                    kv_k = compact_accepted_batched(kv_k, hist_lens,
                                                    path_nodes, M)
                    kv_v = compact_accepted_batched(kv_v, hist_lens,
                                                    path_nodes, M)
                else:
                    from .paged_kv import paged_compact_block

                    kv_k = paged_compact_block(kv_k, tables, hist_lens,
                                               path_nodes, M, paged[1])
                    kv_v = paged_compact_block(kv_v, tables, hist_lens,
                                               path_nodes, M, paged[1])
                acc = jnp.maximum(acc, 0)                    # [B, Dp]
                Dp = acc.shape[1]
                is_eos = (acc == eos_id) & \
                    (jnp.arange(Dp)[None] < alens[:, None])
                any_eos = jnp.any(is_eos, axis=1)
                alens = jnp.where(any_eos,
                                  jnp.argmax(is_eos, axis=1).astype(
                                      jnp.int32) + 1, alens)
                alens = jnp.where(lives, alens, 0)
                # extend each slot's stable net KV with the accepted
                # (token, target-hidden) pairs (single-stream body parity)
                path_hidden = jax.vmap(lambda h, pn: h[pn])(
                    hidden, path_nodes)                      # [B, Dp, H]
                prev_h = jnp.concatenate([
                    last_hiddens[:, None].astype(path_hidden.dtype),
                    path_hidden[:, :-1]], axis=1)
                ekv_k, ekv_v = jax.vmap(
                    extend1, in_axes=(None, 0, 0, 0, 0, 0))(
                    net_params, ekv_k, ekv_v, embed[acc], prev_h,
                    hist_lens - 1)
                new_last = jax.vmap(
                    lambda ph, al: ph[jnp.maximum(al - 1, 0)]
                )(path_hidden, alens)
                last_hiddens = jnp.where(
                    lives[:, None], new_last.astype(last_hiddens.dtype),
                    last_hiddens)
                histories = jax.vmap(
                    lambda h, a, o: jax.lax.dynamic_update_slice(h, a, (o,))
                )(histories, acc, hist_lens)
                hist_lens = hist_lens + alens
                budgets = budgets - alens
                starts = jnp.where(lives, bonus, starts)
                slot_steps = slot_steps + lives.astype(jnp.int32)
                sam_steps = sam_steps + (lives & use_sam).astype(jnp.int32)
                lives = lives & ~any_eos & (budgets > 0) & \
                    (hist_lens + M <= alloc_limits) & \
                    (hist_lens + TREE_SLOTS <= S)
                return (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                        hist_lens, starts, budgets, lives, steps + 1,
                        slot_steps, sam_steps, keys)

            init = (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                    hist_lens, starts, budgets, init_lives, jnp.int32(0),
                    jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                    keys)
            (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens, hist_lens,
             starts, budgets, lives, steps, slot_steps, sam_steps, keys) = \
                jax.lax.while_loop(cond, body, init)
            key_rows = jax.lax.bitcast_convert_type(keys, jnp.int32).T
            ctrl = jnp.concatenate([
                jnp.stack([hist_lens, starts, budgets,
                           lives.astype(jnp.int32), slot_steps, sam_steps]),
                key_rows], axis=0)
            return (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
                    ctrl)

        return fused


class PagedBatchedFusedHybridEagleEngine(BatchedFusedHybridEagleEngine):
    """BatchedFusedHybridEagleEngine (SAM[EAGLE-2] under continuous
    batching) with the TARGET KV on the shared page pool.  The draft net's
    KV stays dense per slot (one layer; ~H bytes/token — paging it would
    buy nothing).  Page lifecycle, int8-page option and capacity semantics
    are PagedBatchedFusedSamEngine's; tree drafts gather-compact the
    accepted path directly on pages (paged_kv.paged_compact_block)."""

    def __init__(self, *args, n_pages: int = 64, page_size: int = 128,
                 quantized_kv: bool = False,
                 interpret: Optional[bool] = None, **kwargs):
        self._n_pages = n_pages
        self._page_size = page_size
        self._quantized_kv = quantized_kv
        self._interpret = interpret
        super().__init__(*args, **kwargs)

    # page-pool hooks shared verbatim with the chain engine
    from .fused_sam import PagedBatchedFusedSamEngine as _P
    _init_kv = _P._init_kv
    _tables = _P._tables
    _fused_extra_args = _P._fused_extra_args
    _release_slot = _P._release_slot
    _should_retry_slot = _P._should_retry_slot
    _post_segment = _P._post_segment
    _can_admit = _P._can_admit
    live_kv_tokens = _P.live_kv_tokens
    del _P
    _pre_segment = PagedBatchedFusedHybridEngine._pre_segment

    # -- prefill: dense forward + page scatter + net prefill ---------------
    def _build_scatter_prefill(self, P: int):
        from .cache import init_kv_cache
        from .drafters.eagle.net import eagle_forward, init_eagle_kv
        from .paged_kv import paged_flat_indices, paged_write_block

        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S
        page, scratch, _ = self._paged_cfg

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6, 7))
        def prefill(params, net_params, kv_k, kv_v, ekv_k, ekv_v,
                    histories, last_hiddens, tokens, true_len, slot, table):
            fk, fv = init_kv_cache(cfg, 1, P)
            logits, hidden, fk, fv = forward(
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
            ek, ev = init_eagle_kv(ncfg, 1, S)
            s = jnp.arange(S)[None, :]
            mask = (s <= jnp.arange(P)[:, None])[None]
            _, ek, ev = eagle_forward(
                net_params, ncfg, params["embed"][tokens[1:]][None],
                hidden[0][:-1][None], jnp.arange(P - 1)[None, :],
                ek, ev, jnp.int32(0), mask[:, :P - 1])
            ekv_k = jax.lax.dynamic_update_slice(ekv_k, ek, (slot, 0, 0, 0))
            ekv_v = jax.lax.dynamic_update_slice(ekv_v, ev, (slot, 0, 0, 0))
            row = jnp.zeros((1, S), jnp.int32)
            row = jax.lax.dynamic_update_slice(row, tokens[None], (0, 0))
            histories = jax.lax.dynamic_update_slice(histories, row,
                                                     (slot, 0))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            last_hidden = jax.lax.dynamic_index_in_dim(
                hidden[0], true_len - 1, axis=0, keepdims=False)
            last_hiddens = jax.lax.dynamic_update_slice(
                last_hiddens, last_hidden[None].astype(last_hiddens.dtype),
                (slot, 0))
            return (kv_k, kv_v, ekv_k, ekv_v, histories, last_hiddens,
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
        (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v, self.histories,
         self.last_hiddens, nt, last_logits) = self._scatter_prefill_fns[P](
            self.params, self.net_params, self.kv_k, self.kv_v,
            self.ekv_k, self.ekv_v, self.histories, self.last_hiddens,
            jnp.asarray(padded), jnp.int32(len(ids)), jnp.int32(slot),
            jnp.asarray(self.page_reqs[slot].host_table()))
        return nt, last_logits
