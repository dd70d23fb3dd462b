"""Device-resident Token-Recycle: fused multi-step drafting + verification.

The reference's standalone Token-Recycle baseline
(/root/reference/evaluation/model/token_recycle/) keeps a host dict of top-K
continuations and rebuilds the draft tree in Python every step.  Everything it
needs — the ``[vocab, K]`` harvest table, the static tree topology, the
verify/accept math — is device-representable, so like the PLD engine
(samd_tpu.pld) the whole decode loop runs in ONE ``lax.while_loop`` with zero
per-step host traffic:

  draft: fill the static topology level-by-level from the harvest table
         (invalid/unharvested subtrees carry token -1, which can never match
          an argmax — the device analogue of host-side pruning);
  verify: one forward over the N-node block with the topology's constant
          mask/positions; greedy longest-prefix accept over constant paths;
  update: KV gather-compaction of the winning path + scatter the block's
          fresh top-K rows back into the harvest table.

Greedy outputs equal the AR baseline (tests), matching the reference's
Token-Recycle semantics with a trainless drafter.
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
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .sam.trees import ancestor_closure, node_depths
from .verify import greedy_accept


@dataclass(frozen=True)
class FusedTokenRecycleConfig:
    num_nodes: int = 61
    topk: int = 8
    steps_per_call: int = 256
    # approx_max_k for the in-loop harvest ranking (fused_base.harvest_topk)
    approx_harvest: bool = True


class FusedTokenRecycleEngine:
    def __init__(self, model_cfg: ModelConfig, params: Params,
                 tr_cfg: Optional[FusedTokenRecycleConfig] = None, *,
                 parents: Optional[np.ndarray] = None,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.cfg = tr_cfg or FusedTokenRecycleConfig()
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)

        if parents is None:
            parents = rank_probability_tree(self.cfg.num_nodes,
                                            branching=self.cfg.topk)
        # depth-contiguous relabel (levels become static slices)
        d = node_depths(parents)
        order = np.lexsort((np.arange(len(parents)), d))
        new_pos = np.empty(len(parents), np.int32)
        new_pos[order] = np.arange(len(parents), dtype=np.int32)
        relabeled = np.full(len(parents), -1, np.int32)
        for i, p in enumerate(parents):
            if p >= 0:
                relabeled[new_pos[i]] = new_pos[p]
        self.parents = relabeled
        self.N = len(parents)
        self.depths = node_depths(self.parents)
        self.children = child_ranks(self.parents)
        rank = np.zeros(self.N, np.int32)
        for p, childs in enumerate(self.children):
            for r, c in enumerate(childs):
                rank[c] = r
        self.rank = rank
        # constant verify buffers
        self.tree_mask = jnp.asarray(ancestor_closure(self.parents))
        self.positions = jnp.asarray(self.depths, jnp.int32)
        paths = np.full((self.N, int(self.depths.max()) + 1), -1, np.int32)
        for i in range(self.N):
            chain = []
            x = i
            while x != -1:
                chain.append(x)
                x = int(self.parents[x])
            paths[i, :len(chain)] = chain[::-1]
        self.paths = jnp.asarray(paths)

        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        V = model_cfg.vocab_size
        # row V is the scratch row for invalid scatters
        self.harvest = jnp.zeros((V + 1, self.cfg.topk), jnp.int32)
        self.seen = jnp.zeros((V + 1,), bool)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()

    # ------------------------------------------------------------------
    def _build_prefill(self, P: int):
        cfg, S, K = self.model_cfg, self.S, self.cfg.topk
        V = cfg.vocab_size

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
        def prefill(params, kv_k, kv_v, harvest, seen, tokens, true_len):
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, S))
            topk = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)  # [P, K]
            # harvest every real prompt position
            rows = jnp.where(jnp.arange(P) < true_len, tokens, V)
            harvest = harvest.at[rows].set(topk)
            seen = seen.at[rows].set(True).at[V].set(False)
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return (kv_k, kv_v, harvest, seen,
                    jnp.argmax(last).astype(jnp.int32))

        return prefill

    def _build_fused(self):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        cfg, S = self.model_cfg, self.S
        N, K = self.N, self.cfg.topk
        V = cfg.vocab_size
        parents = self.parents
        depths_np = self.depths
        max_depth = int(depths_np.max())
        levels = [np.nonzero(depths_np == d)[0] for d in range(max_depth + 1)]
        rank = self.rank
        tree_mask = self.tree_mask
        positions = self.positions
        paths = self.paths

        def fill_tree(harvest, seen, start_token):
            tokens = jnp.full((N,), -1, jnp.int32).at[0].set(start_token)
            valid = jnp.zeros((N,), bool).at[0].set(True)
            for d in range(1, max_depth + 1):
                nodes = levels[d]
                par = parents[nodes]
                ptok = tokens[par]
                ok = valid[par] & (ptok >= 0) & seen[jnp.maximum(ptok, 0)]
                preds = harvest[jnp.maximum(ptok, 0)]        # [n_d, K]
                t = preds[jnp.arange(len(nodes)), rank[nodes]]
                tokens = tokens.at[nodes].set(jnp.where(ok, t, -1))
                valid = valid.at[nodes].set(ok)
            return tokens

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
        def fused(params, kv_k, kv_v, harvest, seen, history, hist_len,
                  start_token, budget, eos_id):
            def cond(st):
                (kv_k, kv_v, harvest, seen, history, hist_len, start, budget,
                 done, steps) = st
                return (~done & (steps < self.cfg.steps_per_call)
                        & (budget > 0) & (hist_len + N <= S))

            def body(st):
                (kv_k, kv_v, harvest, seen, history, hist_len, start, budget,
                 done, steps) = st
                draft_tokens = fill_tree(harvest, seen, start)
                mask = block_decode_mask(tree_mask, hist_len, S)
                logits, _, kv_k, kv_v = forward(
                    params, cfg, jnp.maximum(draft_tokens, 0)[None],
                    positions[None, :] + hist_len, kv_k, kv_v, hist_len, mask)
                res = greedy_accept(logits[0], draft_tokens, paths)
                kv_k = compact_accepted(kv_k, hist_len, res.path_nodes, N, seq_axis=_sa)
                kv_v = compact_accepted(kv_v, hist_len, res.path_nodes, N, seq_axis=_sa)
                # harvest the block (valid nodes only; invalid -> row V)
                from .fused_base import harvest_topk

                topk = harvest_topk(logits[0], K, self.cfg.approx_harvest)
                rows = jnp.where(draft_tokens >= 0, draft_tokens, V)
                harvest = harvest.at[rows].set(topk)
                seen = seen.at[rows].set(True).at[V].set(False)
                # commit accepted tokens + EOS/budget bookkeeping
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
                        res.next_token, budget, done, steps + 1)

            init = (kv_k, kv_v, harvest, seen, history, hist_len, start_token,
                    budget, jnp.bool_(False), jnp.int32(0))
            out = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            ctrl = pack_ctrl(out[5], out[9], out[8])
            return out[:8] + (ctrl,)

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
        (self.kv_k, self.kv_v, self.harvest, self.seen, next_token) = \
            self._prefill_fns[P](self.params, self.kv_k, self.kv_v,
                                 self.harvest, self.seen, jnp.asarray(padded),
                                 jnp.int32(len(input_ids)))

        from .fused_base import init_history

        history = init_history(input_ids, self.S)
        hist_len = jnp.int32(len(input_ids))
        budget = jnp.int32(gen.max_new_tokens)
        start = next_token
        done = False
        decode_steps = 0
        hl = len(input_ids)
        while not done:
            (self.kv_k, self.kv_v, self.harvest, self.seen, history, hist_len,
             start, budget, ctrl) = self._fused(
                self.params, self.kv_k, self.kv_v, self.harvest, self.seen,
                history, hist_len, start, budget,
                jnp.int32(self.eos_token_id))
            hl, steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            done = bool(done_d) or steps == 0 or hl + self.N > self.S
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])
