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
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .models.configs import ModelConfig


def init_kv_cache(cfg: ModelConfig, batch: int, max_cache_len: int,
                  dtype=None) -> Tuple[jax.Array, jax.Array]:
    if getattr(cfg, "kv_layout", "sd") == "ds":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, cfg.head_dim,
                 max_cache_len)
    else:
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_cache_len,
                 cfg.head_dim)
    dtype = dtype or cfg.dtype
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def compact_accepted(kv: jax.Array, offset: jax.Array, indices: jax.Array,
                     block_size: int, *, seq_axis: int = 3) -> jax.Array:
    """Compact accepted draft positions to the front of the draft block.

    kv:         [L, B, KH, S, D] (seq_axis=3, "sd" layout) or
                [L, B, KH, D, S] (seq_axis=4, "ds" layout)
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
    starts = [0] * kv.ndim
    starts[seq_axis] = offset
    sizes = list(kv.shape)
    sizes[seq_axis] = block_size
    block = jax.lax.dynamic_slice(kv, starts, sizes)
    sel = jnp.take(block, indices, axis=seq_axis)
    return jax.lax.dynamic_update_slice(kv, sel, starts)
