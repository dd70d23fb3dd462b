"""SamdEngine — the speculative-decoding orchestrator.

Replaces the reference's ``SamdModel`` (/root/reference/samd/samd_model.py)
with a TPU-native loop:

  * ONE jitted decode step per engine config: target forward over the draft
    block + acceptance + KV compaction + top-K harvest, all static shapes,
    KV buffers donated (true in-place).  The reference instead interleaves
    host logic between device calls (mask-state mutation, `.item()` syncs,
    per-layer cache rollback).
  * Sequence and tree drafts share the step: a sequence is a chain tree.
  * Prefill is jitted per power-of-two length bucket.
  * Per-step host↔device traffic: draft buffers up; accepted tokens, bonus
    token and the [M, K] top-K harvest down.

Greedy output equality with plain autoregressive decoding holds by
construction: the AR baseline (`ar_generate`) runs the *same* forward with a
1-node chain draft, so logits agree step-for-step.
"""

from __future__ import annotations

import functools
import time
from collections import namedtuple
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .cache import compact_accepted, init_kv_cache
from .config import GenerationConfig, SamdConfig
from .drafters.base import Draft, Drafter
from .models.configs import ModelConfig
from .models.llama import Params, block_decode_mask, forward, prefill_mask
from .verify import AcceptResult, greedy_accept, sampling_accept

Outputs = namedtuple(
    "Outputs",
    ["output_ids", "decode_tokens", "decode_steps", "accept_length_per_step"])

HARVEST_TOPK = 8


@dataclass
class StepStats:
    """Draft-source / accept-length diagnostics (the reference collects these
    via profiling decorators, /root/reference/profile_utils.py:37-52)."""
    source_counts: Dict[str, int] = field(default_factory=dict)
    accept_by_source: Dict[str, int] = field(default_factory=dict)

    def record(self, source: str, accept_len: int) -> None:
        self.source_counts[source] = self.source_counts.get(source, 0) + 1
        self.accept_by_source[source] = (
            self.accept_by_source.get(source, 0) + accept_len)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class SamdEngine:
    def __init__(self, model_cfg: ModelConfig, params: Params,
                 samd_cfg: SamdConfig, drafter: Drafter, *,
                 max_cache_len: int = 2048,
                 eos_token_id: int = 2,
                 stop_token_id: Optional[int] = None,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048),
                 harvest_topk: int = HARVEST_TOPK):
        self.model_cfg = model_cfg
        self.params = params
        self.samd_cfg = samd_cfg
        self.drafter = drafter
        self.max_cache_len = max_cache_len
        self.eos_token_id = eos_token_id
        self.stop_token_id = stop_token_id
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= max_cache_len)
        self.harvest_topk = harvest_topk
        self.stats = StepStats()

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        self._prefill_fns: Dict[int, callable] = {}
        self._decode_fn = self._build_decode_step()
        self._sampling_fns: Dict[tuple, callable] = {}
        self._ar_fn = None

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------
    def _build_prefill(self, P: int):
        cfg, S, K = self.model_cfg, self.max_cache_len, self.harvest_topk

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, kv_k, kv_v, tokens, true_len):
            mask = prefill_mask(1, P, S)
            logits, _, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :],
                kv_k, kv_v, jnp.int32(0), mask)
            last_logits = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            topk_tok = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            next_token = jnp.argmax(last_logits).astype(jnp.int32)
            return kv_k, kv_v, next_token, last_logits, topk_tok

        return prefill

    def _build_decode_step(self):
        cfg, S, K = self.model_cfg, self.max_cache_len, self.harvest_topk
        M = self.samd_cfg.max_predicts

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_step(params, kv_k, kv_v, cache_len, draft_tokens,
                        tree_mask, position_ids, retrieve_indices):
            mask = block_decode_mask(tree_mask, cache_len, S)
            logits, _, kv_k, kv_v = forward(
                params, cfg, draft_tokens[None],
                position_ids[None] + cache_len, kv_k, kv_v, cache_len, mask)
            res = greedy_accept(logits[0], draft_tokens, retrieve_indices)
            kv_k = compact_accepted(kv_k, cache_len, res.path_nodes, M)
            kv_v = compact_accepted(kv_v, cache_len, res.path_nodes, M)
            topk_tok = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            return kv_k, kv_v, res, topk_tok

        return decode_step

    def _build_sampling_step(self, temperature: float, top_p: float,
                             top_k: int):
        cfg, S, K = self.model_cfg, self.max_cache_len, self.harvest_topk
        M = self.samd_cfg.max_predicts

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_step(params, kv_k, kv_v, cache_len, draft_tokens,
                        tree_mask, position_ids, retrieve_indices, key):
            mask = block_decode_mask(tree_mask, cache_len, S)
            logits, _, kv_k, kv_v = forward(
                params, cfg, draft_tokens[None],
                position_ids[None] + cache_len, kv_k, kv_v, cache_len, mask)
            res = sampling_accept(
                logits[0], draft_tokens, retrieve_indices, key,
                temperature=temperature, top_p=top_p, top_k=top_k)
            kv_k = compact_accepted(kv_k, cache_len, res.path_nodes, M)
            kv_v = compact_accepted(kv_v, cache_len, res.path_nodes, M)
            topk_tok = jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
            return kv_k, kv_v, res, topk_tok

        return decode_step

    # ------------------------------------------------------------------
    # Generation loop
    # ------------------------------------------------------------------
    def _prefill(self, input_ids: List[int]):
        P = _bucket(len(input_ids), self.prefill_buckets)
        if P not in self._prefill_fns:
            self._prefill_fns[P] = self._build_prefill(P)
        padded = np.zeros(P, np.int32)
        padded[:len(input_ids)] = input_ids
        self.kv_k, self.kv_v, next_token, last_logits, topk = \
            self._prefill_fns[P](self.params, self.kv_k, self.kv_v,
                                 jnp.asarray(padded),
                                 jnp.int32(len(input_ids)))
        return next_token, last_logits, np.asarray(topk)

    def generate(self, input_ids: Sequence[int],
                 gen_config: Optional[GenerationConfig] = None) -> Outputs:
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        M = self.samd_cfg.max_predicts
        S = min(self.max_cache_len, gen.max_cache_len)

        self.drafter.reset()
        next_token_dev, last_logits, topk = self._prefill(input_ids)
        self.drafter.observe_prompt(input_ids,
                                    topk[:len(input_ids)])

        sampling = not gen.greedy
        if sampling:
            sig = (gen.temperature, gen.top_p, gen.top_k)
            if sig not in self._sampling_fns:
                self._sampling_fns[sig] = self._build_sampling_step(*sig)
            step_fn = self._sampling_fns[sig]
            key = jax.random.PRNGKey(gen.seed)
            if gen.temperature > 0:
                warped = last_logits / gen.temperature
                key, sub = jax.random.split(key)
                next_token_dev = jax.random.categorical(sub, warped)
        else:
            step_fn = self._decode_fn

        cache_len = len(input_ids)
        output = list(input_ids)
        decode_tokens = 0
        decode_steps = 0
        accept_lens: List[int] = []
        start_token = int(next_token_dev)

        for _ in range(gen.max_steps):
            if cache_len + M > S:
                break
            draft = self.drafter.lookup(start_token)
            b = draft.buffers
            args = (self.params, self.kv_k, self.kv_v, jnp.int32(cache_len),
                    jnp.asarray(b.tokens), jnp.asarray(b.attn_mask),
                    jnp.asarray(b.position_ids),
                    jnp.asarray(b.retrieve_indices))
            if sampling:
                key, sub = jax.random.split(key)
                self.kv_k, self.kv_v, res, topk = step_fn(*args, sub)
            else:
                self.kv_k, self.kv_v, res, topk = step_fn(*args)

            accept_len = int(res.accept_len)
            accepted = np.asarray(res.accepted_tokens)[:accept_len].tolist()
            next_start = int(res.next_token)

            # EOS / stop-token truncation (reference samd_model.py:256-262)
            eos_hit = False
            for stop in (self.eos_token_id, self.stop_token_id):
                if stop is not None and stop in accepted:
                    accepted = accepted[:accepted.index(stop) + 1]
                    eos_hit = True
                    break

            self.drafter.observe_accepted(accepted)
            self.drafter.observe_verify(b.tokens, np.asarray(topk),
                                        b.num_nodes)
            self.stats.record(draft.source, len(accepted))

            output.extend(accepted)
            cache_len += accept_len  # cache holds full accepted path
            decode_steps += 1
            decode_tokens += len(accepted)
            accept_lens.append(len(accepted))
            start_token = next_start
            if eos_hit or decode_tokens >= gen.max_new_tokens:
                break

        output = output[:len(input_ids) + gen.max_new_tokens]
        return Outputs(output, decode_tokens, decode_steps, accept_lens)

    def stream_generate(self, input_ids: Sequence[int],
                        gen_config: Optional[GenerationConfig] = None):
        """Yield accepted-token chunks as they commit (CLI streaming;
        reference samd_model.py:276-323)."""
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        M = self.samd_cfg.max_predicts
        S = min(self.max_cache_len, gen.max_cache_len)
        self.drafter.reset()
        next_token_dev, _, topk = self._prefill(input_ids)
        self.drafter.observe_prompt(input_ids, topk[:len(input_ids)])
        cache_len = len(input_ids)
        decode_tokens = 0
        start_token = int(next_token_dev)
        for _ in range(gen.max_steps):
            if cache_len + M > S:
                break
            draft = self.drafter.lookup(start_token)
            b = draft.buffers
            self.kv_k, self.kv_v, res, topk = self._decode_fn(
                self.params, self.kv_k, self.kv_v, jnp.int32(cache_len),
                jnp.asarray(b.tokens), jnp.asarray(b.attn_mask),
                jnp.asarray(b.position_ids), jnp.asarray(b.retrieve_indices))
            accept_len = int(res.accept_len)
            accepted = np.asarray(res.accepted_tokens)[:accept_len].tolist()
            eos_hit = False
            for stop in (self.eos_token_id, self.stop_token_id):
                if stop is not None and stop in accepted:
                    accepted = accepted[:accepted.index(stop) + 1]
                    eos_hit = True
                    break
            self.drafter.observe_accepted(accepted)
            self.drafter.observe_verify(b.tokens, np.asarray(topk),
                                        b.num_nodes)
            cache_len += accept_len
            decode_tokens += len(accepted)
            yield accepted
            start_token = int(res.next_token)
            if eos_hit or decode_tokens >= gen.max_new_tokens:
                break


# ----------------------------------------------------------------------
# Autoregressive baseline (speedup denominator + equality oracle)
# ----------------------------------------------------------------------

class ArBaseline:
    """Plain autoregressive decoding through the same forward/cache code:
    the engine's speedup denominator (reference
    evaluation/inference_baseline.py) and greedy-equality oracle."""

    def __init__(self, model_cfg: ModelConfig, params: Params, *,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 stop_token_id: Optional[int] = None,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048)):
        samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=1,
                              max_tree_paths=1, max_tree_depth=1)
        self.cfg = model_cfg
        self._engine = SamdEngine(
            model_cfg, params, samd_cfg, _SingleTokenDrafter(),
            max_cache_len=max_cache_len, eos_token_id=eos_token_id,
            stop_token_id=stop_token_id, prefill_buckets=prefill_buckets)

    def generate(self, input_ids, gen_config=None) -> Outputs:
        return self._engine.generate(input_ids, gen_config)


class _SingleTokenDrafter:
    """Draft = just the start token: every step verifies exactly one token,
    which is always accepted — i.e. vanilla AR decoding."""

    def reset(self):
        pass

    def observe_prompt(self, tokens, topk=None):
        pass

    def observe_accepted(self, tokens):
        pass

    def observe_verify(self, block_tokens, block_topk, num_nodes):
        pass

    def lookup(self, start_token: int) -> Draft:
        from .sam.trees import chain_buffers
        return Draft(buffers=chain_buffers([start_token], max_nodes=1,
                                           max_depth=1), source="ar")
