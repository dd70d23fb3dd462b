"""Fused EAGLE-2: draft-net tree expansion + verification in one device loop.

The host engine drives EAGLE-2 with one device call per phase (expand,
verify, extend) and host glue between them (drafters/eagle/drafter.py).  All
three phases are device programs already, so this engine runs them inside a
single ``lax.while_loop`` iteration:

  expand : beam search over the one-layer draft net (depth × top-K, global
           top-``total_tokens`` selection, topological packing) — the same
           math as Eagle2Drafter._build_expand;
  verify : generic packed-draft path (in-jit buffers from parent vectors,
           tree acceptance);
  extend : the accepted path's (token, target-hidden) pairs advance the draft
           net's stable KV, and the target hidden of the last accepted node
           seeds the next expansion.

Zero per-step host traffic; greedy outputs equal the AR baseline.
Draft-net KV layout: the expansion writes its tree scratch *after* the stable
prefix each step and the extension overwrites it, so one [B, KH, S, D] buffer
serves both.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cache import compact_accepted
from .config import GenerationConfig
from .drafters.eagle.net import (
    EagleNetConfig,
    eagle_forward,
    init_eagle_kv,
    init_eagle_params,
)
from .engine import Outputs, _bucket
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .ops.treeops import unpack_draft
from .verify import greedy_accept


def make_eagle_expand(*, net_cfg, S: int, depth: int,
                      topk: int, total: int, M: int):
    """Build the EAGLE-2 beam expansion: (net_params, embed, head, ekv_k,
    ekv_v, stable_len, last_hidden, start_token) -> (packed [2, M] draft,
    ekv_k, ekv_v).  Tree scratch KV is written at [stable_len, stable_len +
    TREE_SLOTS); selection is ancestor-closed by score monotonicity.

    ``embed``/``head`` are ARGUMENTS, not closure captures: a captured
    weight array is baked into the serialized HLO as a constant, and at 7B
    the embed+lm_head literals push the module past the remote-compile
    tunnel's request-size limit (HTTP 413, measured) — pass the traced
    ``params`` pieces instead."""
    K = topk
    ncfg = net_cfg
    TREE_SLOTS = 1 + depth * K
    POOL = 1 + K + (depth - 1) * K * K
    NEG = jnp.float32(-1e30)

    def head_logp(h, head):
        # head may be quantized (weight-only int8/fp8/int4 serving)
        from .ops.quant import dequant
        logits = jnp.dot(h, dequant(head, h.dtype),
                         preferred_element_type=jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)

    def expand(net_params, embed, head, ekv_k, ekv_v, stable_len,
               last_hidden, start_token):
        s_idx = jnp.arange(S)[None, :]
        mask0 = (s_idx <= stable_len)[None]
        h0, ekv_k, ekv_v = eagle_forward(
            net_params, ncfg, embed[start_token][None, None],
            last_hidden[None, None], stable_len[None, None],
            ekv_k, ekv_v, stable_len, mask0)
        lp0 = head_logp(h0[0, 0], head)
        val1, tok1 = jax.lax.top_k(lp0, K)

        pool_tokens = jnp.zeros((POOL,), jnp.int32).at[0].set(start_token)
        pool_parents = jnp.full((POOL,), -1, jnp.int32)
        pool_scores = jnp.full((POOL,), NEG).at[0].set(0.0)
        pool_depth = jnp.zeros((POOL,), jnp.int32)
        idx1 = 1 + jnp.arange(K)
        pool_tokens = pool_tokens.at[idx1].set(tok1)
        pool_parents = pool_parents.at[idx1].set(0)
        pool_scores = pool_scores.at[idx1].set(val1)
        pool_depth = pool_depth.at[idx1].set(1)

        beam_tokens, beam_scores = tok1, val1
        beam_hidden = jnp.broadcast_to(h0[0, 0], (K, ncfg.hidden_size))
        beam_pool_idx = idx1.astype(jnp.int32)
        anc = jnp.zeros((K, TREE_SLOTS), bool).at[:, 0].set(True)
        anc = anc.at[jnp.arange(K), 1 + jnp.arange(K)].set(True)

        for lvl in range(1, depth):
            slots = 1 + (lvl - 1) * K + jnp.arange(K)
            rel = jnp.clip(s_idx - stable_len, 0, TREE_SLOTS - 1)
            in_tree = (s_idx >= stable_len) & \
                (s_idx < stable_len + TREE_SLOTS)
            anc_now = anc.at[jnp.arange(K), slots].set(True)
            tree_m = jnp.take_along_axis(
                anc_now, jnp.broadcast_to(rel, (K, S)), axis=1)
            mask = ((s_idx < stable_len) | (in_tree & tree_m))[None]
            pos = (stable_len + lvl) * jnp.ones((1, K), jnp.int32)
            h, ekv_k, ekv_v = eagle_forward(
                net_params, ncfg, embed[beam_tokens][None],
                beam_hidden[None], pos, ekv_k, ekv_v,
                stable_len + 1 + (lvl - 1) * K, mask)
            h = h[0]
            lp = head_logp(h, head)
            v, t = jax.lax.top_k(lp, K)
            cand_scores = (beam_scores[:, None] + v).reshape(-1)
            cand_tokens = t.reshape(-1)
            cand_parent_row = jnp.repeat(jnp.arange(K), K)
            base = 1 + K + (lvl - 1) * K * K
            cidx = base + jnp.arange(K * K)
            pool_tokens = pool_tokens.at[cidx].set(cand_tokens)
            pool_parents = pool_parents.at[cidx].set(
                beam_pool_idx[cand_parent_row])
            pool_scores = pool_scores.at[cidx].set(cand_scores)
            pool_depth = pool_depth.at[cidx].set(lvl + 1)
            bv, bi = jax.lax.top_k(cand_scores, K)
            row = cand_parent_row[bi]
            beam_tokens, beam_scores = cand_tokens[bi], bv
            beam_hidden = h[row]
            beam_pool_idx = cidx[bi].astype(jnp.int32)
            anc = anc_now[row]

        sel_n = total + 1
        _, sel = jax.lax.top_k(pool_scores, sel_n)
        key = pool_depth[sel] * POOL + sel
        order = jnp.argsort(key)
        sel_sorted = sel[order]
        new_pos = jnp.full((POOL,), -1, jnp.int32).at[sel_sorted].set(
            jnp.arange(sel_n, dtype=jnp.int32))
        par = pool_parents[sel_sorted]
        parents_new = jnp.where(par >= 0, new_pos[jnp.maximum(par, 0)], -1)
        tokens_sel = pool_tokens[sel_sorted]
        packed = jnp.stack([
            jnp.concatenate([tokens_sel,
                             jnp.zeros((M - sel_n,), jnp.int32)]),
            jnp.concatenate([jnp.where(parents_new >= 0, parents_new, -1),
                             jnp.arange(sel_n, M, dtype=jnp.int32)]),
        ])
        return packed, ekv_k, ekv_v

    return expand, TREE_SLOTS


class FusedEagle2Engine:
    def __init__(self, model_cfg: ModelConfig, params: Params, *,
                 net_params: Optional[Dict] = None,
                 depth: int = 5, topk: int = 8, total_tokens: int = 63,
                 steps_per_call: int = 256,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.net_cfg = EagleNetConfig.from_target(model_cfg)
        if net_params is None:
            net_params = init_eagle_params(self.net_cfg, jax.random.PRNGKey(7))
        self.net_params = net_params
        self.depth = depth
        self.topk = topk
        self.total = total_tokens
        self.M = total_tokens + 1
        self.steps_per_call = steps_per_call
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        self.ekv_k, self.ekv_v = init_eagle_kv(self.net_cfg, 1, max_cache_len)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()
        self._fused_sampling: Dict[tuple, callable] = {}

    # ------------------------------------------------------------------
    def _head(self):
        return (self.params["embed"].T if self.model_cfg.tie_embeddings
                else self.params["lm_head"])

    def _build_prefill(self, P: int):
        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
        def prefill(params, net_params, kv_k, kv_v, ekv_k, ekv_v, tokens,
                    true_len):
            logits, hidden, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, S))
            # draft-net stable KV over (token[1:], hidden[:-1]) pairs
            s = jnp.arange(S)[None, :]
            mask = (s <= jnp.arange(P)[:, None])[None]
            eh, ekv_k, ekv_v = eagle_forward(
                net_params, ncfg, params["embed"][tokens[1:]][None]
                if P > 1 else jnp.zeros((1, 0, ncfg.hidden_size)),
                hidden[0][:-1][None] if P > 1 else
                jnp.zeros((1, 0, ncfg.hidden_size)),
                jnp.arange(P - 1)[None, :], ekv_k, ekv_v, jnp.int32(0),
                mask[:, :P - 1])
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            last_hidden = jax.lax.dynamic_index_in_dim(
                hidden[0], true_len - 1, axis=0, keepdims=False)
            return (kv_k, kv_v, ekv_k, ekv_v,
                    jnp.argmax(last).astype(jnp.int32), last_hidden, last)

        return prefill

    def _build_fused(self, sig=None):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        cfg, ncfg, S = self.model_cfg, self.net_cfg, self.S
        K, depth, total, M = self.topk, self.depth, self.total, self.M
        TREE_SLOTS = 1 + depth * K
        POOL = 1 + K + (depth - 1) * K * K
        NEG = jnp.float32(-1e30)
        tie = self.model_cfg.tie_embeddings
        D_PATH = M  # accepted-path pad (max depth of verify paths)
        sampling = sig is not None
        if sampling:
            from .verify import make_accept_fn

            accept_fn = make_accept_fn(sig)

        expand, _ = make_eagle_expand(
            net_cfg=ncfg, S=S, depth=depth, topk=K, total=total, M=M)

        @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6))
        def fused(params, net_params, kv_k, kv_v, ekv_k, ekv_v, history,
                  hist_len, start_token, last_hidden, budget, eos_id, key):
            def cond(st):
                (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start,
                 last_hidden, budget, done, steps, key) = st
                return (~done & (steps < self.steps_per_call) & (budget > 0)
                        & (hist_len + M <= S)
                        & (hist_len + TREE_SLOTS <= S))

            # embed/head from the TRACED params (closure-captured weights
            # become HLO constants — 7B blows the remote-compile size cap)
            embed = params["embed"]
            head = embed.T if tie else params["lm_head"]

            def body(st):
                (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start,
                 last_hidden, budget, done, steps, key) = st
                packed, ekv_k, ekv_v = expand(
                    net_params, embed, head, ekv_k, ekv_v, hist_len - 1,
                    last_hidden, start)
                # NOTE: draft positions are relative to the *draft-net* KV,
                # whose stable length is hist_len - 1 (pairs lag by one).
                toks, tree_mask, depths, paths = unpack_draft(packed, M)
                mask = block_decode_mask(tree_mask, hist_len, S)
                logits, hidden, kv_k, kv_v = forward(
                    params, cfg, jnp.maximum(toks, 0)[None],
                    depths[None, :] + hist_len, kv_k, kv_v, hist_len, mask)
                if sampling:
                    key, sub = jax.random.split(key)
                    res = accept_fn(logits[0], packed[0], paths, sub)
                else:
                    res = greedy_accept(logits[0], packed[0], paths)
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
                path_hidden = hidden[0][res.path_nodes]      # [D, H]
                # extend draft-net stable KV with the accepted pairs:
                # (embed(acc_j), target_hidden(acc_{j-1})), h_{-1}=last_hidden
                prev_h = jnp.concatenate([last_hidden[None],
                                          path_hidden[:-1]], axis=0)
                s_idx2 = jnp.arange(S)[None, :]
                offs = hist_len - 1
                emask = (s_idx2 <= (offs + jnp.arange(Dd))[:, None])[None]
                # only the first `alen` pairs are real; later junk is masked
                # by future stable_len
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
                        key)

            init = (kv_k, kv_v, ekv_k, ekv_v, history, hist_len, start_token,
                    last_hidden, budget, jnp.bool_(False), jnp.int32(0), key)
            out = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            ctrl = pack_ctrl(out[5], out[10], out[9])
            return out[:9] + (ctrl,)

        return fused

    # ------------------------------------------------------------------
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
         last_hidden, last_logits) = self._prefill_fns[P](
            self.params, self.net_params, self.kv_k, self.kv_v,
            self.ekv_k, self.ekv_v, jnp.asarray(padded),
            jnp.int32(len(input_ids)))
        key = jax.random.PRNGKey(gen.seed)
        if gen.greedy:
            fused = self._fused
        else:
            sig = gen.sampling_signature
            if sig not in self._fused_sampling:
                self._fused_sampling[sig] = self._build_fused(sig)
            fused = self._fused_sampling[sig]
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
            (self.kv_k, self.kv_v, self.ekv_k, self.ekv_v, history, hist_len,
             start, last_hidden, budget, ctrl) = fused(
                self.params, self.net_params, self.kv_k, self.kv_v,
                self.ekv_k, self.ekv_v, history, hist_len, start, last_hidden,
                budget, jnp.int32(self.eos_token_id), sub)
            hl, steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            done = bool(done_d) or steps == 0 or hl + self.M > self.S
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])
