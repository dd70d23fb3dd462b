"""Device-resident prompt-lookup decoding (PLD): a fused multi-step loop.

The reference ships PLD as a host-side baseline — brute-force n-gram search
over ``input_ids`` then a draft/verify step per Python iteration
(/root/reference/evaluation/model/pld/pld.py:16-48,51-158).  Retrieval over
the *own* token history doesn't need a host data structure at all: the
history lives in a device buffer, the n-gram match is a vectorized window
comparison, and therefore draft → verify → accept → history/KV update can run
for MANY steps inside ONE ``lax.while_loop`` — zero host↔device traffic per
step.  On dispatch-bound deployments (pods, tunneled chips) this removes the
per-step RPC entirely; on bare metal it removes launch/sync overhead.

The SAM engines (samd_tpu.sam) remain the stronger retrieval drafters — a
true suffix automaton can't live on device — so PLD is the low-latency
device-only mode, exactly mirroring the reference's PLD-vs-SAM positioning.

Greedy-equality invariant holds like everywhere else: verification uses the
same forward, so accepted tokens equal the AR baseline's.
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


@dataclass(frozen=True)
class PldConfig:
    """Reference defaults: max_matching_ngram_size=3, num_pred_tokens=10
    (/root/reference/evaluation/model/pld/pld.py:53-55)."""
    max_ngram: int = 3
    n_predicts: int = 10          # draft continuation length
    steps_per_call: int = 256    # device loop iterations per dispatch

    @property
    def block(self) -> int:       # verify block M = start token + draft
        return self.n_predicts + 1


def pld_draft(history: jax.Array, hist_len: jax.Array, start_token: jax.Array,
              *, max_ngram: int, n_predicts: int
              ) -> Tuple[jax.Array, jax.Array]:
    """Find the first occurrence of the longest trailing n-gram (ending with
    ``start_token``) in ``history[:hist_len]`` and return its continuation as
    a chain draft: (tokens [M], draft_len scalar), M = n_predicts + 1."""
    S = history.shape[0]
    M = n_predicts + 1
    # windows[i, j] = history[i + j]
    idx = jnp.arange(S)[:, None] + jnp.arange(max_ngram)[None, :]
    windows = history[jnp.clip(idx, 0, S - 1)]               # [S, G]
    # full query = last (max_ngram-1) history tokens + start_token
    qidx = hist_len - max_ngram + 1 + jnp.arange(max_ngram)
    query = jnp.where(qidx >= 0, history[jnp.clip(qidx, 0, S - 1)], -1)
    query = query.at[-1].set(start_token)                    # [G]

    pos = jnp.int32(0)
    n_hit = jnp.int32(0)
    for n in range(max_ngram, 0, -1):
        # window of size n at i: history[i : i+n] vs query[-n:]
        sub = windows[:, :n]
        tgt = query[max_ngram - n:]
        eq = jnp.all(sub == tgt[None, :], axis=1)
        valid = (jnp.arange(S) + n) <= hist_len
        hit = eq & valid
        found = jnp.any(hit)
        first = jnp.argmax(hit).astype(jnp.int32)
        take = found & (n_hit == 0)
        pos = jnp.where(take, first, pos)
        n_hit = jnp.where(take, n, n_hit)

    cont_start = pos + n_hit
    cont_len = jnp.where(n_hit > 0,
                         jnp.clip(hist_len - cont_start, 0, n_predicts), 0)
    cidx = cont_start + jnp.arange(M - 1)
    cont = history[jnp.clip(cidx, 0, S - 1)]
    tokens = jnp.concatenate([start_token[None], cont]).astype(jnp.int32)
    return tokens, (cont_len + 1).astype(jnp.int32)


class PldEngine:
    """Greedy prompt-lookup speculative decoding with a fused device loop."""

    def __init__(self, model_cfg: ModelConfig, params: Params,
                 pld_cfg: Optional[PldConfig] = None, *,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        self.model_cfg = model_cfg
        self.params = params
        self.cfg = pld_cfg or PldConfig()
        self.S = max_cache_len
        self.eos_token_id = eos_token_id
        self.prefill_buckets = tuple(b for b in prefill_buckets
                                     if b <= max_cache_len)
        from .cache import init_kv_cache

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        self._prefill_fns: Dict[int, callable] = {}
        self._fused = self._build_fused()

    def _build_prefill(self, P: int):
        cfg, S = self.model_cfg, self.S

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, kv_k, kv_v, tokens, true_len):
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
                jnp.int32(0), prefill_mask(1, P, S))
            last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                                axis=0, keepdims=False)
            return kv_k, kv_v, jnp.argmax(last).astype(jnp.int32)

        return prefill

    def _build_fused(self):
        cfg, S = self.model_cfg, self.S
        pc = self.cfg
        M = pc.block
        tri = jnp.tril(jnp.ones((M, M), bool))
        chain_pos = jnp.arange(M, dtype=jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def fused(params, kv_k, kv_v, history, hist_len, start_token,
                  budget, eos_id):
            """Run up to steps_per_call speculative steps on device.

            history: [S] int32 — committed tokens (prompt + generation);
            hist_len == committed KV length.  Returns updated state + stats.
            """

            def cond(st):
                (kv_k, kv_v, history, hist_len, start, budget, done,
                 steps, accepted_total) = st
                return (~done & (steps < pc.steps_per_call) & (budget > 0)
                        & (hist_len + M <= S))

            def body(st):
                (kv_k, kv_v, history, hist_len, start, budget, done,
                 steps, accepted_total) = st
                draft_tokens, draft_len = pld_draft(
                    history, hist_len, start, max_ngram=pc.max_ngram,
                    n_predicts=pc.n_predicts)
                # chain verify: causal mask over the block; block columns
                # beyond draft_len masked out so junk continuations can
                # never be attended/accepted (each query keeps itself)
                s = jnp.arange(S)[None, None, :]
                mask = block_decode_mask(tri, hist_len, S)
                in_block = (s >= hist_len) & (s < hist_len + M)
                mask = mask & (~in_block | (s < hist_len + draft_len))
                mask = mask | (s == (hist_len + chain_pos)[None, :, None])
                in_draft = chain_pos < draft_len
                logits, _, kv_k, kv_v = forward(
                    params, cfg, draft_tokens[None],
                    chain_pos[None, :] + hist_len, kv_k, kv_v, hist_len, mask)
                argmax_tok = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                hit = (draft_tokens[1:] == argmax_tok[:-1]) & in_draft[1:]
                run = jnp.cumprod(hit.astype(jnp.int32)).sum()
                alen = run + 1
                acc = draft_tokens  # accepted prefix = chain prefix
                # EOS trim
                is_eos = (acc == eos_id) & (chain_pos < alen)
                any_eos = jnp.any(is_eos)
                eos_pos = jnp.argmax(is_eos).astype(jnp.int32)
                alen = jnp.where(any_eos, eos_pos + 1, alen)
                bonus = argmax_tok[alen - 1]
                # commit: chain prefix is already contiguous in the KV cache
                # (no compaction needed) and in the draft tokens
                history = jax.lax.dynamic_update_slice(
                    history, acc, (hist_len,))
                hist_len = hist_len + alen
                budget = budget - alen
                done = any_eos | (budget <= 0)
                return (kv_k, kv_v, history, hist_len, bonus, budget, done,
                        steps + 1, accepted_total + alen)

            init = (kv_k, kv_v, history, hist_len, start_token, budget,
                    jnp.bool_(False), jnp.int32(0), jnp.int32(0))
            (kv_k, kv_v, history, hist_len, start, budget, done, steps,
             accepted_total) = jax.lax.while_loop(cond, body, init)
            from .fused_base import pack_ctrl
            ctrl = pack_ctrl(hist_len, steps, done)
            return (kv_k, kv_v, history, hist_len, start, budget, ctrl)

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
        self.kv_k, self.kv_v, next_token = self._prefill_fns[P](
            self.params, self.kv_k, self.kv_v, jnp.asarray(padded),
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
            (self.kv_k, self.kv_v, history, hist_len, start, budget,
             ctrl) = self._fused(
                self.params, self.kv_k, self.kv_v, history, hist_len, start,
                budget, jnp.int32(self.eos_token_id))
            hl, steps, done_d = (int(x) for x in np.asarray(ctrl))
            decode_steps += steps
            done = bool(done_d) or steps == 0 or \
                hl + self.cfg.block > self.S
        from .fused_base import finalize_generation

        output = finalize_generation(history, hl, len(input_ids),
                                     self.eos_token_id, gen.max_new_tokens)
        return Outputs(output, len(output) - len(input_ids), decode_steps,
                       [])
