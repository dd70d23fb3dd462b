"""Continuous batching: serve many requests through one batched decode step.

The reference hard-asserts batch size 1 (/root/reference/samd/samd_model.py:240);
here a ``BatchedSamdEngine`` owns B cache slots and steps all active requests
together:

  * the batched jitted step takes per-request drafts ``[B, 2, M]`` and cache
    offsets ``[B]`` — buffer derivation, forward (per-request KV offsets via a
    vmapped in-place write), acceptance and KV compaction are all vmapped over
    the slot axis inside one program;
  * each request keeps its own host drafter (SAM cursors are per-request
    state; the corpus SAM is shared through per-request cursor objects);
  * when a request finishes, its slot is re-prefilled from the queue
    (continuous batching; prefill briefly pauses decode, v1 semantics).

Inactive slots run a 1-node pad draft whose writes land beyond their committed
length — masked everywhere, so they cost only the (already-paid) batch FLOPs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import GenerationConfig, SamdConfig
from .drafters.base import Drafter
from .engine import HARVEST_TOPK, Outputs, StepStats, _bucket
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .ops.treeops import pack_draft_host, unpack_draft
from .streaming import ProgressStreamMixin
from .verify import greedy_accept, make_accept_fn


@dataclass
class _Slot:
    request_id: Optional[int] = None
    drafter: Optional[Drafter] = None
    cache_len: int = 0
    start_token: int = 0
    prompt_len: int = 0
    output: List[int] = field(default_factory=list)
    decode_tokens: int = 0
    decode_steps: int = 0
    accept_lens: List[int] = field(default_factory=list)
    max_new_tokens: int = 0
    sig: Optional[tuple] = None        # sampling signature (None = greedy)
    key: Optional[np.ndarray] = None   # [2] uint32 PRNG key data

    @property
    def active(self) -> bool:
        return self.request_id is not None


class BatchedSamdEngine(ProgressStreamMixin):
    def __init__(self, model_cfg: ModelConfig, params: Params,
                 samd_cfg: SamdConfig,
                 drafter_factory: Callable[[], Drafter], *,
                 batch_size: int = 4,
                 max_cache_len: int = 2048,
                 eos_token_id: int = 2,
                 stop_token_id: Optional[int] = None,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.samd_cfg = samd_cfg
        self.drafter_factory = drafter_factory
        self.B = batch_size
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.stop_token_id = stop_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        self.stats = StepStats()

        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, batch_size,
                                             max_cache_len)
        self.slots = [_Slot() for _ in range(batch_size)]
        self.queue: List[tuple] = []
        self.results: Dict[int, Outputs] = {}
        self._next_id = 0
        # harvest top-k only when the factory's drafters consume it —
        # lax.top_k over [B, M, V] costs real milliseconds per step on TPU
        self._wants_harvest = getattr(drafter_factory(), "wants_harvest",
                                      False)
        self._decode_fn = self._build_decode_step()
        self._sampling_fns: Dict[tuple, callable] = {}
        self._prefill_fns: Dict[int, callable] = {}
        self._pad_draft = pack_draft_host([0], [-1], samd_cfg.max_predicts)

    # ------------------------------------------------------------------
    def _build_decode_step(self):
        cfg, S = self.model_cfg, self.S
        M = self.samd_cfg.max_predicts
        D = self.samd_cfg.max_tree_depth
        K = HARVEST_TOPK
        wants_harvest = self._wants_harvest

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(params, kv_k, kv_v, cache_lens, drafts):
            # drafts: [B, 2, M]; cache_lens: [B]
            tokens, tree_mask, depths, paths = jax.vmap(
                lambda d: unpack_draft(d, D))(drafts)
            mask = jax.vmap(
                lambda tm, cl: block_decode_mask(tm, cl, S)[0]
            )(tree_mask, cache_lens)                      # [B, M, S]
            pos = depths + cache_lens[:, None]
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens, pos, kv_k, kv_v, cache_lens, mask)
            res = jax.vmap(greedy_accept)(logits, tokens, paths)

            # per-slot KV compaction (vmapped gather over the draft block)
            from .cache import compact_accepted_batched

            kv_k = compact_accepted_batched(kv_k, cache_lens,
                                            res.path_nodes, M)
            kv_v = compact_accepted_batched(kv_v, cache_lens,
                                            res.path_nodes, M)
            pack = jnp.concatenate([
                res.accept_len[:, None], res.next_token[:, None],
                res.accepted_tokens], axis=1).astype(jnp.int32)  # [B, D+2]
            topk_tok = (jax.lax.top_k(logits, K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            return kv_k, kv_v, pack, topk_tok

        return step

    def _build_sampling_step(self, sig: tuple):
        """Batched mixed-mode step: per-slot greedy OR sampling acceptance.

        Both accept rules run vmapped over the batch and the per-slot result
        is selected by ``samp_flags`` — one compiled program serves any mix
        of greedy and sampling requests sharing one sampling signature
        (acceptance cost is negligible next to the batched forward)."""
        cfg, S = self.model_cfg, self.S
        M = self.samd_cfg.max_predicts
        D = self.samd_cfg.max_tree_depth
        K = HARVEST_TOPK
        wants_harvest = self._wants_harvest
        accept = make_accept_fn(sig)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(params, kv_k, kv_v, cache_lens, drafts, keys, samp_flags):
            # drafts: [B, 2, M]; cache_lens: [B]; keys: [B, 2] uint32
            tokens, tree_mask, depths, paths = jax.vmap(
                lambda d: unpack_draft(d, D))(drafts)
            mask = jax.vmap(
                lambda tm, cl: block_decode_mask(tm, cl, S)[0]
            )(tree_mask, cache_lens)                      # [B, M, S]
            pos = depths + cache_lens[:, None]
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens, pos, kv_k, kv_v, cache_lens, mask)
            split = jax.vmap(jax.random.split)(keys)      # [B, 2, 2]
            subs, new_keys = split[:, 0], split[:, 1]
            g = jax.vmap(greedy_accept)(logits, tokens, paths)
            s = jax.vmap(accept)(logits, tokens, paths, subs)

            def sel(a, b):
                f = samp_flags.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(f, a, b)

            accept_len = sel(s.accept_len, g.accept_len)
            path_nodes = sel(s.path_nodes, g.path_nodes)
            accepted = sel(s.accepted_tokens, g.accepted_tokens)
            next_token = sel(s.next_token, g.next_token)

            from .cache import compact_accepted_batched

            kv_k = compact_accepted_batched(kv_k, cache_lens, path_nodes, M)
            kv_v = compact_accepted_batched(kv_v, cache_lens, path_nodes, M)
            pack = jnp.concatenate([
                accept_len[:, None], next_token[:, None],
                accepted], axis=1).astype(jnp.int32)
            topk_tok = (jax.lax.top_k(logits, K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            return kv_k, kv_v, pack, topk_tok, new_keys

        return step

    def _build_prefill(self, P: int):
        cfg, S, K = self.model_cfg, self.S, HARVEST_TOPK
        wants_harvest = self._wants_harvest

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, kv_k, kv_v, tokens, true_len, slot):
            from .cache import init_kv_cache

            fk, fv = init_kv_cache(cfg, 1, S)
            logits, hidden, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, S))
            from .cache import update_slot

            kv_k = update_slot(kv_k, fk, slot)
            kv_v = update_slot(kv_v, fv, slot)
            last_logits = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            next_token = jnp.argmax(last_logits).astype(jnp.int32)
            topk_tok = (jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            return kv_k, kv_v, next_token, topk_tok, last_logits

        return prefill

    # ------------------------------------------------------------------
    def add_request(self, input_ids: Sequence[int],
                    gen_config: Optional[GenerationConfig] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, list(input_ids),
                           gen_config or GenerationConfig()))
        return rid

    def _admit(self) -> None:
        for slot_idx, slot in enumerate(self.slots):
            if slot.active or not self.queue:
                continue
            rid, input_ids, gen = self.queue.pop(0)
            P = _bucket(len(input_ids), self.prefill_buckets)
            if P not in self._prefill_fns:
                self._prefill_fns[P] = self._build_prefill(P)
            padded = np.zeros(P, np.int32)
            padded[:len(input_ids)] = input_ids
            (self.kv_k, self.kv_v, next_token, topk,
             last_logits) = self._prefill_fns[P](
                self.params, self.kv_k, self.kv_v, jnp.asarray(padded),
                jnp.int32(len(input_ids)), jnp.int32(slot_idx))
            sig = key = None
            if not gen.greedy:
                sig = gen.sampling_signature
                k = jax.random.PRNGKey(gen.seed)
                if gen.temperature > 0:
                    k, sub = jax.random.split(k)
                    next_token = jax.random.categorical(
                        sub, last_logits / gen.temperature)
                key = np.asarray(k)
            drafter = self.drafter_factory()
            drafter.reset()
            wants_harvest = getattr(drafter, "wants_harvest", False)
            drafter.observe_prompt(
                input_ids,
                np.asarray(topk)[:len(input_ids)] if wants_harvest else None)
            self.slots[slot_idx] = _Slot(
                request_id=rid, drafter=drafter,
                cache_len=len(input_ids), start_token=int(next_token),
                prompt_len=len(input_ids), output=list(input_ids),
                max_new_tokens=gen.max_new_tokens, sig=sig, key=key)

    def _finish(self, slot_idx: int) -> None:
        s = self.slots[slot_idx]
        out = s.output[:s.prompt_len + s.max_new_tokens]
        self.results[s.request_id] = Outputs(
            out, s.decode_tokens, s.decode_steps, s.accept_lens)
        self._stream_done(s.request_id)
        self.slots[slot_idx] = _Slot()

    def _sampling_inputs(self):
        """(sig, keys [B,2], flags [B]) for the current slots; sig is None
        when every active slot is greedy.  Mixed non-greedy signatures are
        rejected (one compiled program per signature)."""
        sigs = {s.sig for s in self.slots if s.active and s.sig is not None}
        if len(sigs) > 1:
            raise ValueError(
                "concurrent sampling requests must share one sampling "
                f"signature; got {sigs}")
        keys = np.zeros((self.B, 2), np.uint32)
        flags = np.zeros((self.B,), bool)
        for i, s in enumerate(self.slots):
            if s.active and s.sig is not None:
                keys[i] = s.key
                flags[i] = True
        return (next(iter(sigs)) if sigs else None), keys, flags

    def _store_keys(self, new_keys) -> None:
        new_keys = np.asarray(new_keys)
        for i, s in enumerate(self.slots):
            if s.active and s.sig is not None:
                s.key = new_keys[i]

    def _dispatch(self, cache_lens, drafts):
        """Run one batched decode step; returns (pack, topk).  Subclasses
        override to swap the KV backing (e.g. the paged pool)."""
        sig, keys, flags = self._sampling_inputs()
        if sig is not None:
            if sig not in self._sampling_fns:
                self._sampling_fns[sig] = self._build_sampling_step(sig)
            self.kv_k, self.kv_v, pack, topk, new_keys = \
                self._sampling_fns[sig](
                    self.params, self.kv_k, self.kv_v,
                    jnp.asarray(cache_lens), jnp.asarray(drafts),
                    jnp.asarray(keys), jnp.asarray(flags))
            self._store_keys(new_keys)
        else:
            self.kv_k, self.kv_v, pack, topk = self._decode_fn(
                self.params, self.kv_k, self.kv_v, jnp.asarray(cache_lens),
                jnp.asarray(drafts))
        return pack, topk

    def _step(self) -> None:
        M = self.samd_cfg.max_predicts
        drafts = np.zeros((self.B, 2, M), np.int32)
        metas = []
        for i, s in enumerate(self.slots):
            if s.active and s.cache_len + M <= self.S:
                d = s.drafter.lookup(s.start_token)
                drafts[i] = np.asarray(d.packed)
                metas.append((i, d))
            else:
                drafts[i] = self._pad_draft
                if s.active:
                    self._finish(i)  # out of cache: finish what we have
        if not metas:
            return
        cache_lens = np.asarray([s.cache_len for s in self.slots], np.int32)
        pack, topk = self._dispatch(cache_lens, drafts)
        pack = np.asarray(pack)
        topk_np = None
        for i, d in metas:
            s = self.slots[i]
            accept_len = int(pack[i, 0])
            accepted = pack[i, 2:2 + accept_len].tolist()
            eos_hit = False
            for stop in (self.eos_token_id, self.stop_token_id):
                if stop is not None and stop in accepted:
                    accepted = accepted[:accepted.index(stop) + 1]
                    eos_hit = True
                    break
            s.drafter.observe_accepted(accepted)
            if self._wants_harvest and getattr(s.drafter, "wants_harvest",
                                               False):
                if topk_np is None:
                    topk_np = np.asarray(topk)
                s.drafter.observe_verify(drafts[i, 0], topk_np[i],
                                         d.num_nodes)
            self.stats.record(d.source, len(accepted))
            self._emit_stream_chunk(s.request_id, accepted, s.max_new_tokens)
            s.output.extend(accepted)
            s.cache_len += accept_len
            s.decode_steps += 1
            s.decode_tokens += len(accepted)
            s.accept_lens.append(len(accepted))
            s.start_token = int(pack[i, 1])
            if eos_hit or s.decode_tokens >= s.max_new_tokens:
                self._finish(i)

    def run(self) -> Dict[int, Outputs]:
        """Process the queue to completion; returns request_id → Outputs."""
        while self.queue or any(s.active for s in self.slots):
            self._admit()
            self._step()
        out, self.results = self.results, {}
        return out


# ----------------------------------------------------------------------
# Paged-KV variant
# ----------------------------------------------------------------------

class PagedBatchedSamdEngine(BatchedSamdEngine):
    """BatchedSamdEngine whose persistent KV lives in a shared page pool that
    the attention kernel consumes *directly*.

    v1 gathered each slot's pages into a dense working view per step (a full
    read+write of the live KV); v2 passes page tables into the paged flash
    kernel (ops/paged_attention.py) — per step the kernel DMAs exactly the
    live pages and the block write scatters into pages, so no dense copy
    ever exists.  Persistent footprint: ``n_pages × page_size`` tokens of KV
    shared by all slots (memory scales with live tokens, not
    B × max_cache_len)."""

    def __init__(self, *args, n_pages: int = 64, page_size: int = 128,
                 interpret: Optional[bool] = None, **kwargs):
        super().__init__(*args, **kwargs)
        from .paged_kv import PagedKVPool, PagedRequest

        if self.S % page_size != 0:
            raise ValueError("max_cache_len must be a multiple of page_size")
        if getattr(self.model_cfg, "kv_layout", "sd") != "sd":
            raise ValueError("the paged engine manages its own (transposed) "
                             "page layout; use kv_layout='sd' model configs")
        if getattr(self.model_cfg, "kv_quant", False):
            raise ValueError("the paged page pool is bf16; int8 KV covers "
                             "the dense-cache engines")
        self.pool = PagedKVPool(self.model_cfg, n_pages=n_pages,
                                page_size=page_size, layout="dp")
        self.page_size = page_size
        self.interpret = (jax.default_backend() == "cpu"
                          if interpret is None else interpret)
        self.page_reqs = [PagedRequest(self.pool, self.S)
                          for _ in range(self.B)]
        self._tables_cache = None
        self._zero_keys = None
        # the dense cache is never allocated
        self.kv_k = self.kv_v = None
        self._paged_fns: Dict[Optional[tuple], callable] = {}
        self._scatter_prefill_fns: Dict[int, callable] = {}

    # -- paged decode step ------------------------------------------------
    def _build_paged_step(self, sig: Optional[tuple]):
        from .paged_kv import paged_forward

        cfg, S = self.model_cfg, self.S
        M = self.samd_cfg.max_predicts
        D = self.samd_cfg.max_tree_depth
        K = HARVEST_TOPK
        wants_harvest = self._wants_harvest
        page = self.page_size
        interpret = self.interpret
        accept = make_accept_fn(sig) if sig is not None else None

        scratch = self.pool.scratch_page

        def compact_all(pool, tables, cache_lens, path_nodes):
            """One fused gather+scatter compacting every slot's accepted
            block rows at [offset, offset+A) (transposed pool layout).

            The per-slot sequential version rewrote the pool B times per
            layer (XLA copies the donated buffer per chained scatter) —
            HBM-bandwidth dominated at ~140 MB/pool.  Fusing all slots into
            one [B*M]-row gather + scatter touches ~5 MB instead.  Distinct
            live slots own disjoint pages; released slots all collide on
            the scratch page, where write order is irrelevant."""
            B = tables.shape[0]
            tok = cache_lens[:, None] + jnp.arange(M)[None, :]   # [B, M]
            pg = jnp.take_along_axis(tables, tok // page, axis=1)
            pg = jnp.where(pg < 0, scratch, pg).reshape(-1)      # [B*M]
            sl = (tok % page).reshape(-1)                        # [B*M]

            def per_layer(pl_):
                blk = pl_[pg, :, :, sl].reshape(B, M, -1)        # [B,M,KH*D]
                sel = jnp.take_along_axis(
                    blk, path_nodes[:, :, None], axis=1)
                sel = sel.reshape(B * M, pl_.shape[1], pl_.shape[2])
                return pl_.at[pg, :, :, sl].set(sel)

            return jax.vmap(per_layer)(pool)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(params, pool_k, pool_v, cache_lens, drafts, tables,
                 keys, samp_flags):
            tokens, tree_mask, depths, paths = jax.vmap(
                lambda d: unpack_draft(d, D))(drafts)
            from .ops.paged_attention import boundary_mask_window

            mask = jax.vmap(
                lambda tm, cl: boundary_mask_window(tm, cl, page)
            )(tree_mask, cache_lens)                        # [B, M, W·page]
            pos = depths + cache_lens[:, None]
            logits, _, pool_k, pool_v = paged_forward(
                params, cfg, tokens, pos, pool_k, pool_v, tables,
                cache_lens, mask, cache_lens + M, scratch,
                interpret=interpret)
            g = jax.vmap(greedy_accept)(logits, tokens, paths)
            if sig is not None:
                split = jax.vmap(jax.random.split)(keys)
                subs, new_keys = split[:, 0], split[:, 1]
                s = jax.vmap(accept)(logits, tokens, paths, subs)

                def sel(a, b):
                    f = samp_flags.reshape((-1,) + (1,) * (a.ndim - 1))
                    return jnp.where(f, a, b)

                accept_len = sel(s.accept_len, g.accept_len)
                path_nodes = sel(s.path_nodes, g.path_nodes)
                accepted = sel(s.accepted_tokens, g.accepted_tokens)
                next_token = sel(s.next_token, g.next_token)
            else:
                new_keys = keys
                accept_len, path_nodes = g.accept_len, g.path_nodes
                accepted, next_token = g.accepted_tokens, g.next_token

            pool_k = compact_all(pool_k, tables, cache_lens, path_nodes)
            pool_v = compact_all(pool_v, tables, cache_lens, path_nodes)
            pack = jnp.concatenate([
                accept_len[:, None], next_token[:, None],
                accepted], axis=1).astype(jnp.int32)
            topk_tok = (jax.lax.top_k(logits, K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            return pool_k, pool_v, pack, topk_tok, new_keys

        return step

    def _tables(self):
        """[B, P] device table, re-uploaded only when page assignments
        change (admission / growth / release) — rebuilding it per step cost
        ~4.6 ms of host→device puts on the tunneled chip."""
        host = np.stack([r.host_table() for r in self.page_reqs])
        if self._tables_cache is None or \
                not np.array_equal(self._tables_cache[0], host):
            self._tables_cache = (host, jnp.asarray(host))
        return self._tables_cache[1]

    def _dispatch(self, cache_lens, drafts):
        M = self.samd_cfg.max_predicts
        for i, s in enumerate(self.slots):
            if s.active and s.cache_len + M <= self.S:
                self.page_reqs[i].ensure(s.cache_len + M)
        sig, keys, flags = self._sampling_inputs()
        if sig not in self._paged_fns:
            self._paged_fns[sig] = self._build_paged_step(sig)
        if sig is None:
            # greedy: keys/flags are all-zero constants — upload once
            # (every per-step put is a tunnel RPC)
            if self._zero_keys is None:
                self._zero_keys = (jnp.asarray(keys), jnp.asarray(flags))
            keys_dev, flags_dev = self._zero_keys
        else:
            keys_dev, flags_dev = jnp.asarray(keys), jnp.asarray(flags)
        (self.pool.k, self.pool.v, pack, topk,
         new_keys) = self._paged_fns[sig](
            self.params, self.pool.k, self.pool.v, jnp.asarray(cache_lens),
            jnp.asarray(drafts), self._tables(), keys_dev, flags_dev)
        if sig is not None:
            self._store_keys(new_keys)
        for i, s in enumerate(self.slots):
            if s.active:
                self.page_reqs[i].length = s.cache_len
        return pack, topk

    # -- prefill: dense single-request forward, then scatter into pages ---
    def _build_scatter_prefill(self, P: int):
        from .cache import init_kv_cache
        from .ops.paged_attention import scatter_block_t

        cfg, S, K = self.model_cfg, self.S, HARVEST_TOPK
        wants_harvest = self._wants_harvest
        page = self.page_size
        span_pages = -(-P // page)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, pool_k, pool_v, tokens, true_len, table):
            fk, fv = init_kv_cache(cfg, 1, P)
            logits, hidden, fk, fv = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], fk, fv,
                jnp.int32(0), prefill_mask(1, P, P))
            # fk: [L, 1, KH, P, D] -> per-token scatter of the whole block
            # (scatter_block_t handles any T, incl. page_size > P)
            def scat(pool, blk):  # blk [L, KH, P, D]
                return jax.vmap(
                    lambda pl, bl: scatter_block_t(pl, table, jnp.int32(0),
                                                   bl))(pool, blk)
            pool_k = scat(pool_k, fk[:, 0])
            pool_v = scat(pool_v, fv[:, 0])
            last_logits = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            next_token = jnp.argmax(last_logits).astype(jnp.int32)
            topk_tok = (jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            return pool_k, pool_v, next_token, topk_tok, last_logits

        return prefill

    def _admit(self) -> None:
        for slot_idx, slot in enumerate(self.slots):
            if slot.active or not self.queue:
                continue
            rid, input_ids, gen = self.queue.pop(0)
            P = _bucket(len(input_ids), self.prefill_buckets)
            if P not in self._scatter_prefill_fns:
                self._scatter_prefill_fns[P] = self._build_scatter_prefill(P)
            padded = np.zeros(P, np.int32)
            padded[:len(input_ids)] = input_ids
            req = self.page_reqs[slot_idx]
            req.release()
            req.ensure(min(-(-P // self.page_size) * self.page_size, self.S))
            (self.pool.k, self.pool.v, next_token, topk,
             last_logits) = self._scatter_prefill_fns[P](
                self.params, self.pool.k, self.pool.v, jnp.asarray(padded),
                jnp.int32(len(input_ids)),
                req.table()[:-(-P // self.page_size)])
            req.length = len(input_ids)
            sig = key = None
            if not gen.greedy:
                sig = gen.sampling_signature
                k = jax.random.PRNGKey(gen.seed)
                if gen.temperature > 0:
                    k, sub = jax.random.split(k)
                    next_token = jax.random.categorical(
                        sub, last_logits / gen.temperature)
                key = np.asarray(k)
            drafter = self.drafter_factory()
            drafter.reset()
            wants_harvest = getattr(drafter, "wants_harvest", False)
            drafter.observe_prompt(
                input_ids,
                np.asarray(topk)[:len(input_ids)] if wants_harvest else None)
            self.slots[slot_idx] = _Slot(
                request_id=rid, drafter=drafter,
                cache_len=len(input_ids), start_token=int(next_token),
                prompt_len=len(input_ids), output=list(input_ids),
                max_new_tokens=gen.max_new_tokens, sig=sig, key=key)

    def _finish(self, slot_idx: int) -> None:
        self.page_reqs[slot_idx].release()
        super()._finish(slot_idx)
