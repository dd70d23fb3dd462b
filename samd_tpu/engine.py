"""SamdEngine — the speculative-decoding orchestrator.

Replaces the reference's ``SamdModel`` (/root/reference/samd/samd_model.py)
with a TPU-native loop:

  * ONE jitted decode step per engine config: in-jit draft-tree buffer
    derivation (samd_tpu.ops.treeops), target forward over the draft block,
    acceptance, KV compaction and top-K harvest — all static shapes, KV
    buffers donated (true in-place).  The reference instead interleaves host
    logic between device calls (mask-state mutation, `.item()` syncs,
    per-layer cache rollback).
  * Sequence and tree drafts share the step: a sequence is a chain tree.
  * Host↔device traffic per step is exactly one [2, M] int32 upload (draft
    tokens + parents) and one [D+2] int32 download (accept_len, bonus token,
    accepted path) — plus, only when a model-based drafter consumes it, the
    [M, K] top-K harvest.  On pod/tunnel deployments every transfer is an
    RPC, so this is the difference between dispatch-bound and compute-bound
    decoding.
  * Prefill is jitted per power-of-two length bucket.

Losslessness: ``ArBaseline(block_size=M)`` runs vanilla AR decoding through
the *same* M-wide compiled step (one real token + padding), which makes
greedy outputs bitwise comparable to speculative runs — row position inside
a block does not change per-row matmul accumulation order, whereas different
block shapes (an M=1 AR step) may tile reductions differently and flip
near-tie argmaxes in bf16.
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
from .ops.treeops import pack_draft_host, unpack_draft
from .verify import greedy_accept, sampling_accept

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

    def mean_accept(self) -> float:
        steps = sum(self.source_counts.values())
        return sum(self.accept_by_source.values()) / max(steps, 1)


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
                 harvest_topk: int = HARVEST_TOPK,
                 mesh=None):
        self.model_cfg = model_cfg
        self.mesh = mesh
        if mesh is not None:
            assert not getattr(model_cfg, "kv_quant", False), \
                "int8 KV under a mesh needs a QuantizedKV sharding spec"
            # Tensor-parallel serving: shard weights/KV once; every jitted
            # step then compiles under GSPMD with ICI collectives.
            from .parallel.sharding import check_shardable, shard_params
            check_shardable(model_cfg, mesh)
            params = shard_params(params, mesh, model_cfg)
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
        self.profiler = None  # optionally a samd_tpu.profiling.PhaseTimer

        self.kv_k, self.kv_v = init_kv_cache(model_cfg, 1, max_cache_len)
        if mesh is not None:
            from .parallel.sharding import shard_kv
            self.kv_k, self.kv_v = shard_kv(self.kv_k, self.kv_v, mesh)
        self._prefill_fns: Dict[int, callable] = {}
        self._decode_fn = self._build_decode_step()
        self._sampling_fns: Dict[tuple, callable] = {}

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------
    def _build_prefill(self, P: int):
        cfg, S, K = self.model_cfg, self.max_cache_len, self.harvest_topk
        wants_harvest = getattr(self.drafter, "wants_harvest", False)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, kv_k, kv_v, tokens, true_len):
            mask = prefill_mask(1, P, S)
            logits, hidden, kv_k, kv_v = forward(
                params, cfg, tokens[None], jnp.arange(P)[None, :],
                kv_k, kv_v, jnp.int32(0), mask)
            last_logits = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, axis=0, keepdims=False)
            # top-K harvest only when the drafter consumes it: lax.top_k
            # over [P, V] costs real milliseconds per call on TPU, and the
            # pure-automaton policies never read it
            topk_tok = (jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            next_token = jnp.argmax(last_logits).astype(jnp.int32)
            return kv_k, kv_v, next_token, last_logits, topk_tok, hidden[0]

        return prefill

    def _verify_core(self, params, kv_k, kv_v, cache_len, draft):
        """Shared forward + in-jit buffer derivation for decode steps."""
        cfg, S = self.model_cfg, self.max_cache_len
        D = self.samd_cfg.max_tree_depth
        draft_tokens, tree_mask, depths, paths = unpack_draft(draft, D)
        mask = block_decode_mask(tree_mask, cache_len, S)
        logits, hidden, kv_k, kv_v = forward(
            params, cfg, draft_tokens[None], depths[None, :] + cache_len,
            kv_k, kv_v, cache_len, mask)
        return logits, hidden, draft_tokens, paths, kv_k, kv_v

    def _build_decode_step(self):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        M = self.samd_cfg.max_predicts
        K = self.harvest_topk
        return_hidden = getattr(self.drafter, "wants_hidden", False)
        wants_harvest = getattr(self.drafter, "wants_harvest", False)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_step(params, kv_k, kv_v, cache_len, draft):
            logits, hidden, draft_tokens, paths, kv_k, kv_v = \
                self._verify_core(params, kv_k, kv_v, cache_len, draft)
            res = greedy_accept(logits[0], draft_tokens, paths)
            kv_k = compact_accepted(kv_k, cache_len, res.path_nodes, M, seq_axis=_sa)
            kv_v = compact_accepted(kv_v, cache_len, res.path_nodes, M, seq_axis=_sa)
            # one-transfer result: [accept_len, next_token, path tokens...]
            pack = jnp.concatenate([
                res.accept_len[None], res.next_token[None],
                res.accepted_tokens]).astype(jnp.int32)
            # harvest only when consumed: lax.top_k over [M, V] costs ~4.6 ms
            # per step on the 1B model (measured, v5e) — the difference
            # between 1.55x and 1.85x for the pure-automaton policy
            topk_tok = (jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            # target hidden states along the accepted path (for EAGLE-style
            # drafters; reference plumbs these via a patched forward,
            # /root/reference/samd/model_patch/llama.py:114-204)
            path_hidden = hidden[0][res.path_nodes] if return_hidden else None
            return kv_k, kv_v, pack, topk_tok, path_hidden

        return decode_step

    def _build_sampling_step(self, sig: tuple):
        _sa = 4 if getattr(self.model_cfg, "kv_layout", "sd") == "ds" else 3
        """One compiled sampling step per GenerationConfig.sampling_signature
        (temperature, top_p, top_k, accept_mode, posterior knobs)."""
        from .verify import make_accept_fn

        accept = make_accept_fn(sig)
        M = self.samd_cfg.max_predicts
        K = self.harvest_topk

        return_hidden = getattr(self.drafter, "wants_hidden", False)
        wants_harvest = getattr(self.drafter, "wants_harvest", False)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_step(params, kv_k, kv_v, cache_len, draft, key):
            logits, hidden, draft_tokens, paths, kv_k, kv_v = \
                self._verify_core(params, kv_k, kv_v, cache_len, draft)
            res = accept(logits[0], draft_tokens, paths, key)
            kv_k = compact_accepted(kv_k, cache_len, res.path_nodes, M, seq_axis=_sa)
            kv_v = compact_accepted(kv_v, cache_len, res.path_nodes, M, seq_axis=_sa)
            pack = jnp.concatenate([
                res.accept_len[None], res.next_token[None],
                res.accepted_tokens]).astype(jnp.int32)
            topk_tok = (jax.lax.top_k(logits[0], K)[1].astype(jnp.int32)
                        if wants_harvest else None)
            path_hidden = hidden[0][res.path_nodes] if return_hidden else None
            return kv_k, kv_v, pack, topk_tok, path_hidden

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
        self.kv_k, self.kv_v, next_token, last_logits, topk, hidden = \
            self._prefill_fns[P](self.params, self.kv_k, self.kv_v,
                                 jnp.asarray(padded),
                                 jnp.int32(len(input_ids)))
        return next_token, last_logits, topk, hidden

    def _truncate_at_stop(self, accepted: List[int]):
        for stop in (self.eos_token_id, self.stop_token_id):
            if stop is not None and stop in accepted:
                return accepted[:accepted.index(stop) + 1], True
        return accepted, False

    def generate(self, input_ids: Sequence[int],
                 gen_config: Optional[GenerationConfig] = None) -> Outputs:
        gen = gen_config or GenerationConfig()
        input_ids = list(input_ids)
        if not input_ids:
            raise ValueError("generate() requires a non-empty prompt")
        M = self.samd_cfg.max_predicts
        S = min(self.max_cache_len, gen.max_cache_len)
        wants_harvest = getattr(self.drafter, "wants_harvest", False)
        wants_hidden = getattr(self.drafter, "wants_hidden", False)

        self.drafter.reset()
        next_token_dev, last_logits, topk, hidden = self._prefill(input_ids)
        self.drafter.observe_prompt(
            input_ids,
            np.asarray(topk)[:len(input_ids)] if wants_harvest else None)
        if wants_hidden:
            self.drafter.observe_prompt_hidden(input_ids, hidden)

        sampling = not gen.greedy
        if sampling:
            sig = gen.sampling_signature
            if sig not in self._sampling_fns:
                self._sampling_fns[sig] = self._build_sampling_step(sig)
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

        prof = self.profiler
        for _ in range(gen.max_steps):
            if cache_len + M > S:
                break
            t0 = time.perf_counter() if prof else 0.0
            draft = self.drafter.lookup(start_token)
            if prof:
                prof.record("draft_lookup", time.perf_counter() - t0)
                t0 = time.perf_counter()
            args = (self.params, self.kv_k, self.kv_v, jnp.int32(cache_len),
                    jnp.asarray(draft.packed))
            if sampling:
                key, sub = jax.random.split(key)
                self.kv_k, self.kv_v, pack, topk, path_hidden = \
                    step_fn(*args, sub)
            else:
                self.kv_k, self.kv_v, pack, topk, path_hidden = step_fn(*args)

            if wants_harvest:
                # start the harvest transfer so it rides alongside the pack
                # fetch instead of costing a second blocking round trip
                topk.copy_to_host_async()
            pack = np.asarray(pack)  # single device→host fetch
            if prof:
                prof.record("device_step", time.perf_counter() - t0)
                t0 = time.perf_counter()
            accept_len = int(pack[0])
            next_start = int(pack[1])
            accepted = pack[2:2 + accept_len].tolist()

            accepted, eos_hit = self._truncate_at_stop(accepted)
            self.drafter.observe_accepted(accepted)
            if wants_harvest:
                self.drafter.observe_verify(
                    np.asarray(draft.packed[0]), np.asarray(topk),
                    draft.num_nodes)
            if wants_hidden:
                self.drafter.observe_step_hidden(accepted, path_hidden,
                                                 len(accepted))
            self.stats.record(draft.source, len(accepted))
            if prof:
                prof.record("host_update", time.perf_counter() - t0)

            output.extend(accepted)
            cache_len += accept_len  # cache holds the full accepted path
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
        wants_harvest = getattr(self.drafter, "wants_harvest", False)
        wants_hidden = getattr(self.drafter, "wants_hidden", False)
        self.drafter.reset()
        next_token_dev, last_logits, topk, hidden = self._prefill(input_ids)
        self.drafter.observe_prompt(
            input_ids,
            np.asarray(topk)[:len(input_ids)] if wants_harvest else None)
        if wants_hidden:
            self.drafter.observe_prompt_hidden(input_ids, hidden)
        sampling = not gen.greedy
        if sampling:
            sig = gen.sampling_signature
            if sig not in self._sampling_fns:
                self._sampling_fns[sig] = self._build_sampling_step(sig)
            step_fn = self._sampling_fns[sig]
            key = jax.random.PRNGKey(gen.seed)
            if gen.temperature > 0:
                key, sub = jax.random.split(key)
                next_token_dev = jax.random.categorical(
                    sub, last_logits / gen.temperature)
        else:
            step_fn = self._decode_fn
        cache_len = len(input_ids)
        decode_tokens = 0
        start_token = int(next_token_dev)
        for _ in range(gen.max_steps):
            if cache_len + M > S:
                break
            draft = self.drafter.lookup(start_token)
            args = (self.params, self.kv_k, self.kv_v, jnp.int32(cache_len),
                    jnp.asarray(draft.packed))
            if sampling:
                key, sub = jax.random.split(key)
                self.kv_k, self.kv_v, pack, topk, path_hidden = \
                    step_fn(*args, sub)
            else:
                self.kv_k, self.kv_v, pack, topk, path_hidden = step_fn(*args)
            pack = np.asarray(pack)
            accept_len = int(pack[0])
            accepted = pack[2:2 + accept_len].tolist()
            accepted, eos_hit = self._truncate_at_stop(accepted)
            self.drafter.observe_accepted(accepted)
            if wants_harvest:
                self.drafter.observe_verify(
                    np.asarray(draft.packed[0]), np.asarray(topk),
                    draft.num_nodes)
            if wants_hidden:
                self.drafter.observe_step_hidden(accepted, path_hidden,
                                                 len(accepted))
            cache_len += accept_len
            decode_tokens += len(accepted)
            yield accepted
            start_token = int(pack[1])
            if eos_hit or decode_tokens >= gen.max_new_tokens:
                break


# ----------------------------------------------------------------------
# Autoregressive baseline (speedup denominator + equality oracle)
# ----------------------------------------------------------------------

class _SingleTokenDrafter:
    """Draft = just the start token (padded to the block size): every step
    verifies one token, which is always accepted — vanilla AR decoding."""

    wants_harvest = False

    def __init__(self, block_size: int = 1):
        self.block_size = block_size

    def reset(self):
        pass

    def observe_prompt(self, tokens, topk=None):
        pass

    def observe_accepted(self, tokens):
        pass

    def observe_verify(self, block_tokens, block_topk, num_nodes):
        pass

    def lookup(self, start_token: int) -> Draft:
        packed = pack_draft_host([start_token], [-1], self.block_size)
        return Draft(packed=packed, num_nodes=1, source="ar")


class ArBaseline:
    """Plain autoregressive decoding through the same forward/cache code.

    ``block_size=1`` (default) is the efficient speed baseline (reference
    evaluation/inference_baseline.py).  ``block_size=M`` runs AR through the
    same M-wide compiled step as a speculative engine with
    ``max_predicts=M`` — the bitwise greedy-equality oracle (see module
    docstring)."""

    def __init__(self, model_cfg: ModelConfig, params: Params, *,
                 max_cache_len: int = 2048, eos_token_id: int = 2,
                 stop_token_id: Optional[int] = None,
                 prefill_buckets: Sequence[int] = (128, 256, 512, 1024, 2048),
                 block_size: int = 1, mesh=None):
        samd_cfg = SamdConfig(draft_source="sam_only",
                              max_predicts=block_size,
                              max_tree_paths=block_size,
                              max_tree_depth=block_size)
        self.cfg = model_cfg
        self._engine = SamdEngine(
            model_cfg, params, samd_cfg, _SingleTokenDrafter(block_size),
            max_cache_len=max_cache_len, eos_token_id=eos_token_id,
            stop_token_id=stop_token_id, prefill_buckets=prefill_buckets,
            mesh=mesh)

    def generate(self, input_ids, gen_config=None) -> Outputs:
        return self._engine.generate(input_ids, gen_config)
