"""EAGLE-2 drafter: dynamic draft trees from a one-layer draft net, built
entirely on device.

Reference behavior (/root/reference/samd/tree_model/eagle2/eagle2_model.py:
783-975): beam expansion of depth×top-K candidates scored by cumulative
log-probability, keeping the global ``total_tokens`` best nodes, then
rebuilding mask/position/retrieve buffers per step on the host.

TPU-native redesign:
  * The whole expansion — draft-net forwards, per-level top-K, global
    node selection, topological packing — is ONE jitted function with static
    shapes that emits the engine's packed ``[2, M]`` (tokens, parents) draft
    directly.  The draft never visits the host; the selection/mask work the
    reference does in Python per step costs one fused XLA program here.
  * Draft-net KV over the committed prefix ("stable KV") is extended each
    step from the *target's* hidden states of the accepted path, which the
    verify step hands over as a device array (no transfer).
  * Parent-before-child is guaranteed by score monotonicity (an ancestor's
    cumulative log-prob ≥ any descendant's), so global top-K selection is
    automatically ancestor-closed; ties resolve to the parent because
    ``lax.top_k`` prefers lower indices and parents precede children in the
    candidate pool.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Draft
from .net import (
    EagleNetConfig,
    eagle_forward,
    init_eagle_kv,
    init_eagle_params,
)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


class Eagle2Drafter:
    wants_harvest = False
    wants_hidden = True

    def __init__(self, net_params: Dict, net_cfg: EagleNetConfig,
                 embed_table: jax.Array, lm_head: jax.Array, *,
                 max_nodes: int, depth: int = 5, topk: int = 8,
                 total_tokens: int = 63, max_draft_cache: int = 2048,
                 extend_buckets: Sequence[int] = (16, 64, 128, 256, 512,
                                                 1024, 2048)):
        if total_tokens + 1 > max_nodes:
            raise ValueError(
                f"total_tokens+1={total_tokens + 1} exceeds verify block "
                f"max_nodes={max_nodes}")
        self.params = net_params
        self.cfg = net_cfg
        self.embed = embed_table
        self.head = lm_head
        self.max_nodes = max_nodes
        self.depth = depth
        self.topk = topk
        self.total = total_tokens
        self.S = max_draft_cache
        self.extend_buckets = tuple(b for b in extend_buckets
                                    if b <= max_draft_cache)

        self.kv_k, self.kv_v = init_eagle_kv(net_cfg, 1, max_draft_cache)
        self.stable_len = 0
        self.last_hidden = jnp.zeros((net_cfg.hidden_size,), net_cfg.dtype)
        self._extend_fns: Dict[int, callable] = {}
        self._expand_fn = self._build_expand()

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.stable_len = 0
        self.last_hidden = jnp.zeros((self.cfg.hidden_size,), self.cfg.dtype)

    # -- stable-KV extension -------------------------------------------
    def _build_extend(self, T: int):
        cfg, S = self.cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def extend(params, kv_k, kv_v, embed, tokens, prev_hidden, offset):
            """tokens: [T]; prev_hidden: [T, H]; causal over the stable
            prefix.  Returns (hidden [T, H], kv_k, kv_v)."""
            pos = offset + jnp.arange(T)[None, :]
            s = jnp.arange(S)[None, :]
            mask = (s <= (offset + jnp.arange(T))[:, None])[None]  # [1,T,S]
            h, kv_k, kv_v = eagle_forward(
                params, cfg, embed[tokens][None], prev_hidden[None], pos,
                kv_k, kv_v, offset, mask)
            return h[0], kv_k, kv_v

        return extend

    def _extend(self, tokens: np.ndarray, prev_hidden: jax.Array,
                valid_len: int) -> jax.Array:
        """Feed `valid_len` (token, prev-hidden) pairs into the stable KV.
        `tokens`/`prev_hidden` may be padded beyond valid_len."""
        T = _bucket(valid_len, self.extend_buckets)
        if T not in self._extend_fns:
            self._extend_fns[T] = self._build_extend(T)
        tok = np.zeros(T, np.int32)
        tok[:valid_len] = tokens[:valid_len]
        ph = jnp.zeros((T, self.cfg.hidden_size), self.cfg.dtype)
        ph = jax.lax.dynamic_update_slice(
            ph, prev_hidden[:valid_len].astype(self.cfg.dtype), (0, 0))
        hidden, self.kv_k, self.kv_v = self._extend_fns[T](
            self.params, self.kv_k, self.kv_v, self.embed,
            jnp.asarray(tok), ph, jnp.int32(self.stable_len))
        self.stable_len += valid_len
        return hidden

    # -- engine hooks ---------------------------------------------------
    def observe_prompt(self, tokens: Sequence[int],
                       topk: Optional[np.ndarray] = None) -> None:
        pass  # hidden-state variant below does the work

    def observe_prompt_hidden(self, tokens: List[int],
                              hidden: jax.Array) -> None:
        """hidden: [P_pad, H] target hidden states of the prompt (device)."""
        P = len(tokens)
        if P >= 2:
            self._extend(np.asarray(tokens[1:], np.int32), hidden[:P - 1],
                         P - 1)
        self.last_hidden = hidden[P - 1]

    def observe_accepted(self, tokens: Sequence[int]) -> None:
        pass

    def observe_step_hidden(self, accepted: List[int],
                            path_hidden: jax.Array, accept_len: int) -> None:
        """path_hidden: [D, H] target hidden at the accepted path (device)."""
        prev = jnp.concatenate([self.last_hidden[None],
                                path_hidden[:-1]], axis=0)
        self._extend(np.asarray(accepted, np.int32), prev, accept_len)
        self.last_hidden = path_hidden[accept_len - 1]

    def observe_verify(self, block_tokens, block_topk, num_nodes) -> None:
        pass

    # -- tree expansion -------------------------------------------------
    def _build_expand(self):
        cfg, S = self.cfg, self.S
        K, depth, total = self.topk, self.depth, self.total
        M = self.max_nodes
        TREE_SLOTS = 1 + depth * K           # root + one beam per level
        POOL = 1 + K + (depth - 1) * K * K   # root + lvl-1 beam + candidates
        NEG = jnp.float32(-1e30)

        def head_logp(h, head):
            # head may be quantized (weight-only int8/fp8/int4 serving).
            # It is a traced ARG, not self.head: a closure-captured weight
            # bakes into the HLO as a constant (7B exceeds the remote-
            # compile size cap — see eagle_fused.make_eagle_expand).
            from ...ops.quant import dequant
            logits = jnp.dot(h, dequant(head, h.dtype),
                             preferred_element_type=jnp.float32)
            return jax.nn.log_softmax(logits, axis=-1)

        @jax.jit
        def expand(params, embed, head, kv_k, kv_v, stable_len, last_hidden,
                   start_token):
            # ---- root (tree slot 0, cache slot stable_len) ----
            s_idx = jnp.arange(S)[None, :]
            mask0 = (s_idx <= stable_len)[None]                   # [1,1,S]
            h0, kv_k, kv_v = eagle_forward(
                params, cfg, embed[start_token][None, None],
                last_hidden[None, None], stable_len[None, None],
                kv_k, kv_v, stable_len, mask0)
            lp0 = head_logp(h0[0, 0], head)                              # [V]
            val1, tok1 = jax.lax.top_k(lp0, K)                     # level-1 beam

            pool_tokens = jnp.zeros((POOL,), jnp.int32).at[0].set(start_token)
            pool_parents = jnp.full((POOL,), -1, jnp.int32)
            pool_scores = jnp.full((POOL,), NEG).at[0].set(0.0)
            pool_depth = jnp.zeros((POOL,), jnp.int32)
            idx1 = 1 + jnp.arange(K)
            pool_tokens = pool_tokens.at[idx1].set(tok1)
            pool_parents = pool_parents.at[idx1].set(0)
            pool_scores = pool_scores.at[idx1].set(val1)
            pool_depth = pool_depth.at[idx1].set(1)

            beam_tokens = tok1                                     # [K]
            beam_scores = val1
            beam_hidden = jnp.broadcast_to(h0[0, 0], (K, cfg.hidden_size))
            beam_pool_idx = idx1.astype(jnp.int32)
            anc = jnp.zeros((K, TREE_SLOTS), bool).at[:, 0].set(True)
            anc = anc.at[jnp.arange(K), 1 + jnp.arange(K)].set(True)

            state = (kv_k, kv_v, pool_tokens, pool_parents, pool_scores,
                     pool_depth, beam_tokens, beam_scores, beam_hidden,
                     beam_pool_idx, anc)

            for lvl in range(1, depth):
                (kv_k, kv_v, pool_tokens, pool_parents, pool_scores,
                 pool_depth, beam_tokens, beam_scores, beam_hidden,
                 beam_pool_idx, anc) = state
                # current beam (depth == lvl) occupies tree slots
                # 1 + (lvl-1)*K .. 1 + lvl*K - 1; its KV is written now.
                slots = 1 + (lvl - 1) * K + jnp.arange(K)
                # beam forward: attends prefix + own ancestors (incl. self)
                rel = jnp.clip(s_idx - stable_len, 0, TREE_SLOTS - 1)
                in_tree = (s_idx >= stable_len) & \
                    (s_idx < stable_len + TREE_SLOTS)
                anc_now = anc.at[jnp.arange(K), slots].set(True)
                tree_m = jnp.take_along_axis(
                    anc_now, jnp.broadcast_to(rel, (K, S)), axis=1)
                mask = ((s_idx < stable_len) | (in_tree & tree_m))[None]
                pos = (stable_len + lvl) * jnp.ones((1, K), jnp.int32)
                h, kv_k, kv_v = eagle_forward(
                    params, cfg, embed[beam_tokens][None], beam_hidden[None],
                    pos, kv_k, kv_v, stable_len + 1 + (lvl - 1) * K, mask)
                h = h[0]                                           # [K, H]
                lp = head_logp(h, head)                                  # [K, V]
                v, t = jax.lax.top_k(lp, K)                        # [K, K]
                cand_scores = (beam_scores[:, None] + v).reshape(-1)
                cand_tokens = t.reshape(-1)
                cand_parent_row = jnp.repeat(jnp.arange(K), K)
                # record all K*K candidates in the pool
                base = 1 + K + (lvl - 1) * K * K
                cidx = base + jnp.arange(K * K)
                pool_tokens = pool_tokens.at[cidx].set(cand_tokens)
                pool_parents = pool_parents.at[cidx].set(
                    beam_pool_idx[cand_parent_row])
                pool_scores = pool_scores.at[cidx].set(cand_scores)
                pool_depth = pool_depth.at[cidx].set(lvl + 1)
                # next beam = global top-K candidates
                bv, bi = jax.lax.top_k(cand_scores, K)
                row = cand_parent_row[bi]
                beam_tokens = cand_tokens[bi]
                beam_scores = bv
                beam_hidden = h[row]
                beam_pool_idx = cidx[bi].astype(jnp.int32)
                anc = anc_now[row]
                state = (kv_k, kv_v, pool_tokens, pool_parents, pool_scores,
                         pool_depth, beam_tokens, beam_scores, beam_hidden,
                         beam_pool_idx, anc)

            (kv_k, kv_v, pool_tokens, pool_parents, pool_scores, pool_depth,
             *_rest) = state

            # ---- global selection of total+1 nodes (root included) ----
            sel_n = total + 1
            _, sel = jax.lax.top_k(pool_scores, sel_n)
            # topological packing: sort selected by (depth, pool index)
            key = pool_depth[sel] * POOL + sel
            order = jnp.argsort(key)
            sel_sorted = sel[order]                                # [sel_n]
            new_pos = jnp.full((POOL,), -1, jnp.int32).at[sel_sorted].set(
                jnp.arange(sel_n, dtype=jnp.int32))
            par = pool_parents[sel_sorted]
            parents_new = jnp.where(par >= 0, new_pos[jnp.maximum(par, 0)],
                                    -1)
            tokens_new = pool_tokens[sel_sorted]
            # pack to [2, M] with self-parent padding
            packed = jnp.stack([
                jnp.concatenate([tokens_new,
                                 jnp.zeros((M - sel_n,), jnp.int32)]),
                jnp.concatenate([parents_new,
                                 jnp.arange(sel_n, M, dtype=jnp.int32)]),
            ])
            return packed, kv_k, kv_v

        return expand

    def lookup(self, start_token: int) -> Draft:
        packed, self.kv_k, self.kv_v = self._expand_fn(
            self.params, self.embed, self.head, self.kv_k, self.kv_v,
            jnp.int32(self.stable_len), self.last_hidden,
            jnp.int32(start_token))
        return Draft(packed=packed, num_nodes=self.total + 1, source="eagle2")


def make_eagle2(model_cfg, params, samd_cfg, *, net_params=None,
                key=None) -> Eagle2Drafter:
    """Build an Eagle2Drafter bound to a target model's embed/lm_head.

    ``net_params=None`` random-initializes the draft net (tests/benchmarks);
    real checkpoints load via net.convert_eagle_state_dict."""
    net_cfg = EagleNetConfig.from_target(model_cfg)
    if net_params is None:
        import jax as _jax

        net_params = init_eagle_params(
            net_cfg, key if key is not None else _jax.random.PRNGKey(7))
    head = (params["embed"].T if model_cfg.tie_embeddings
            else params["lm_head"])
    return Eagle2Drafter(
        net_params, net_cfg, params["embed"], head,
        max_nodes=samd_cfg.max_predicts,
        depth=samd_cfg.eagle_depth, topk=samd_cfg.eagle_topk,
        total_tokens=samd_cfg.eagle_total_tokens)
