"""KV-cache management for the speculative decode loop.

The cache is a pair of arrays ``[L, B, KH, S, D]`` (layers stacked for
``lax.scan``), preallocated at engine construction like the reference's
``SamdStaticCache`` (/root/reference/samd/cache.py:37-115).  Unlike the
reference — which rolls back with per-layer ``index_select`` + ``copy_``
launched from Python (/root/reference/samd/cache.py:117-133) — acceptance
compaction here is a pure function running *inside* the jitted decode step
with static shapes, so XLA keeps it on-device and in-place (donated buffers).

Committed length is tracked host-side as part of the engine loop state, not
inside the arrays; masks derive from it each step.

INT8 KV (``ModelConfig.kv_quant``, beyond the reference like the paged
pool): the cache stores int8 values + one fp32 scale per (token, kv-head)
— a ``QuantizedKV`` pytree the engines thread through their jitted steps
opaquely.  Halves the KV footprint (2× the context / slots per chip) and
halves the attention read traffic; the per-token scale is computed when
the block is written, so the dequantized value of a cache slot never
depends on which block wrote it (incremental decode stays bitwise-equal
to one full forward).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from .models.configs import ModelConfig


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedKV:
    """int8 KV values + per-(token, head) scales.

    q:     int8  [..., KH, S, D] ("sd") or [..., KH, D, S] ("ds")
    scale: fp32  [..., KH, S]    (no D axis — amax over head_dim)
    """

    q: jax.Array
    scale: jax.Array

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape


KV = Union[jax.Array, QuantizedKV]


def quantize_kv_block(block: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """block: [B, KH, T, D] high precision → (int8 [B, KH, T, D],
    scale fp32 [B, KH, T]).  Symmetric per-token-per-head: amax over D."""
    bf = block.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(bf), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(bf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(kv: KV, dtype, *, ds_layout: bool) -> jax.Array:
    """Pre-dequant form (the ops/quant.qmatmul lesson): ``q · scale`` as an
    elementwise producer XLA fuses into the consuming dot's operand load —
    the attention then streams 1-byte KV + 4-byte/64 scales from HBM."""
    if not isinstance(kv, QuantizedKV):
        return kv
    sc = kv.scale.astype(dtype)
    sc = sc[..., None, :] if ds_layout else sc[..., :, None]
    return kv.q.astype(dtype) * sc


def init_kv_cache(cfg: ModelConfig, batch: int, max_cache_len: int,
                  dtype=None) -> Tuple[KV, KV]:
    if getattr(cfg, "kv_layout", "sd") == "ds":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, cfg.head_dim,
                 max_cache_len)
    else:
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_cache_len,
                 cfg.head_dim)
    if getattr(cfg, "kv_quant", False):
        sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_cache_len)
        return (QuantizedKV(jnp.zeros(shape, jnp.int8),
                            jnp.zeros(sshape, jnp.float32)),
                QuantizedKV(jnp.zeros(shape, jnp.int8),
                            jnp.zeros(sshape, jnp.float32)))
    dtype = dtype or cfg.dtype
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def update_slot(kv: KV, fk: KV, slot: jax.Array) -> KV:
    """Write a single-request cache (batch axis of size 1) into ``slot`` of
    a batched cache — continuous-batching admission.  Dispatches on
    QuantizedKV (q and scale written separately)."""
    if isinstance(kv, QuantizedKV):
        return QuantizedKV(update_slot(kv.q, fk.q, slot),
                           update_slot(kv.scale, fk.scale, slot))
    starts = (jnp.int32(0), slot) + (jnp.int32(0),) * (kv.ndim - 2)
    return jax.lax.dynamic_update_slice(kv, fk, starts)


def compact_accepted_batched(kv: KV, offsets: jax.Array,
                             indices: jax.Array, block_size: int, *,
                             seq_axis: int = 3) -> KV:
    """Per-slot gather-compaction over a batched cache [L, B, KH, S, D]
    ("sd"; seq_axis counts WITH the batch axis).  offsets: [B]; indices:
    [B, A] block-relative accepted positions per slot."""
    if isinstance(kv, QuantizedKV):
        return QuantizedKV(
            compact_accepted_batched(kv.q, offsets, indices, block_size,
                                     seq_axis=seq_axis),
            compact_accepted_batched(kv.scale, offsets, indices, block_size,
                                     seq_axis=kv.scale.ndim - 1))
    sa = seq_axis - 1   # the per-slot slice drops the batch axis (axis 1)

    def one(kv_b, off, idx):
        starts = [0] * kv_b.ndim
        starts[sa] = off
        sizes = list(kv_b.shape)
        sizes[sa] = block_size
        blk = jax.lax.dynamic_slice(kv_b, starts, sizes)
        sel = jnp.take(blk, idx, axis=sa)
        return jax.lax.dynamic_update_slice(kv_b, sel, starts)

    return jax.vmap(one, in_axes=(1, 0, 0), out_axes=1)(kv, offsets,
                                                        indices)


def compact_accepted(kv: KV, offset: jax.Array, indices: jax.Array,
                     block_size: int, *, seq_axis: int = 3) -> KV:
    """Compact accepted draft positions to the front of the draft block.

    kv:         [L, B, KH, S, D] (seq_axis=3, "sd" layout) or
                [L, B, KH, D, S] (seq_axis=4, "ds" layout), or QuantizedKV
                (whose scale's sequence axis is its last, index 3)
    offset:     scalar — block start (committed cache length before the step)
    indices:    [A] int32 — positions *within the block* of the accepted path
                (from retrieve_indices[best]; entries may be clamped
                duplicates past the accept length — harmless, those slots are
                beyond the new committed length and get overwritten later)
    block_size: static M — the draft block width

    Gathers the accepted block slots along ``seq_axis`` and writes them back
    at [offset, offset+A).  All shapes static; `offset` is the only dynamic
    value.  Requires offset + block_size <= S (the engine's loop guard,
    mirroring /root/reference/samd/samd_model.py:254).
    """
    if isinstance(kv, QuantizedKV):
        return QuantizedKV(
            compact_accepted(kv.q, offset, indices, block_size,
                             seq_axis=seq_axis),
            compact_accepted(kv.scale, offset, indices, block_size,
                             seq_axis=kv.scale.ndim - 1))
    starts = [0] * kv.ndim
    starts[seq_axis] = offset
    sizes = list(kv.shape)
    sizes[seq_axis] = block_size
    block = jax.lax.dynamic_slice(kv, starts, sizes)
    sel = jnp.take(block, indices, axis=seq_axis)
    return jax.lax.dynamic_update_slice(kv, sel, starts)
