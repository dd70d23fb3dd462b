"""Paged KV-cache pool for memory-efficient multi-request serving.

The dense engines preallocate ``[L, B, KH, S_max, D]`` per slot — fine for a
handful of streams, wasteful when requests vary widely in length.  This
module provides a vLLM-style page pool:

  * one pool ``[L, n_pages, KH, page_size, D]`` per k/v, shared by all
    requests;
  * a host-side free-list allocator; each request holds an ordered page table
    (grown on demand);
  * jitted gather/scatter: ``gather_request`` materializes a request's
    contiguous KV view for the standard forward; ``scatter_block`` writes a
    freshly computed block back into its pages (blocks may straddle pages).

v1 integration is gather-before-forward (one extra read+write of the
request's live KV per step — bounded by the attention's own KV traffic).  A
paged flash-attention kernel that consumes page tables directly is the
follow-up that removes the copy (see ops/pallas_attention.py for the
block-streaming machinery it will reuse).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.configs import ModelConfig


class PagedAux(NamedTuple):
    """Per-call paged-mode context for models/llama.forward: the page
    tables (traced, loop-invariant inside fused segments), the reserved
    scratch page index and the kernel interpret flag (both static)."""

    tables: jax.Array        # [B, P] int32 page ids, -1 padded
    scratch_page: int
    interpret: bool = False


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKV:
    """One cache side (k or v) of a transposed ("dp") page pool.

    pool:  [L, n_pages(+1 scratch), KH, D, page] — cfg.dtype, or int8 when
           quantized (the paged analogue of cache.QuantizedKV)
    scale: [L, n_pages(+1), KH, 1, page] f32 per-token dequant scales
           (None for the full-precision pool); the singleton axis keeps the
           kernel's per-(page, head) scale DMA a 2-D [1, page] slice.
    Threads through jitted fused loops opaquely (models/llama.forward's
    ``paged`` mode consumes it)."""

    pool: jax.Array
    scale: Optional[jax.Array]

    def tree_flatten(self):
        return (self.pool, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def page_size(self) -> int:
        return self.pool.shape[-1]


class PagedKVPool:
    def __init__(self, cfg: ModelConfig, *, n_pages: int, page_size: int,
                 dtype=None, layout: str = "sd", quantized: bool = False):
        """layout "sd": [L, n_pages, KH, page, D] (gather-based v1 path);
        layout "dp": [L, n_pages, KH, D, page] — the paged flash kernel's
        native transposed layout (ops/paged_attention.py).

        ``quantized`` (dp only): int8 pools + f32 per-token scales — HALF
        the per-page KV bytes both at rest (2× the token capacity per HBM
        byte) and on the kernel's DMA stream.  ``self.k``/``self.v`` are
        then ``PagedKV`` pytrees instead of raw arrays."""
        dtype = dtype or cfg.dtype
        if layout == "dp":
            # +1 physical page: a reserved scratch page absorbing writes of
            # released/inactive slots so the paged step never needs a
            # full-pool select
            shape = (cfg.num_layers, n_pages + 1, cfg.num_kv_heads,
                     cfg.head_dim, page_size)
            self.scratch_page = n_pages
        else:
            assert not quantized, "quantized pool requires the dp layout"
            shape = (cfg.num_layers, n_pages, cfg.num_kv_heads, page_size,
                     cfg.head_dim)
            self.scratch_page = -1
        self.layout = layout
        self.quantized = quantized
        if quantized:
            sshape = shape[:3] + (1, page_size)
            self.k = PagedKV(jnp.zeros(shape, jnp.int8),
                             jnp.zeros(sshape, jnp.float32))
            self.v = PagedKV(jnp.zeros(shape, jnp.int8),
                             jnp.zeros(sshape, jnp.float32))
        else:
            self.k = jnp.zeros(shape, dtype)
            self.v = jnp.zeros(shape, dtype)
        self.page_size = page_size
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages))

    # -- host-side allocator -------------------------------------------
    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"paged KV pool exhausted ({n} pages requested, "
                f"{len(self._free)} free)")
        out, self._free = self._free[:n], self._free[n:]
        return out

    def free(self, pages: List[int]) -> None:
        self._free.extend(pages)

    def pages_for(self, length: int) -> int:
        return -(-length // self.page_size)


@functools.partial(jax.jit, static_argnames=())
def gather_request(pool_k: jax.Array, pool_v: jax.Array,
                   page_table: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """page_table: [P] int32 page ids (-1 padded) → contiguous KV view
    [L, 1, KH, P*page_size, D] for the standard forward."""
    safe = jnp.maximum(page_table, 0)
    def g(pool):
        gathered = jnp.take(pool, safe, axis=1)     # [L, P, KH, page, D]
        L, P, KH, page, D = gathered.shape
        return gathered.transpose(0, 2, 1, 3, 4).reshape(
            L, 1, KH, P * page, D)
    return g(pool_k), g(pool_v)


def scatter_block(pool: jax.Array, page_table: jax.Array, offset: jax.Array,
                  block: jax.Array, block_size: int) -> jax.Array:
    """Write ``block`` [L, 1, KH, block_size, D] at logical position
    ``offset`` of the request's paged KV.  Scatters per-token (block_size is
    small — the draft block)."""
    L, _, KH, _, D = block.shape
    page_size = pool.shape[3]
    tok_pos = offset + jnp.arange(block_size)              # [T]
    page_idx = page_table[tok_pos // page_size]            # [T]
    in_page = tok_pos % page_size                          # [T]
    # pool[:, page_idx[t], :, in_page[t], :] = block[:, 0, :, t, :]
    blk = block[:, 0].transpose(0, 2, 1, 3)                # [L, T, KH, D]
    return pool.at[:, page_idx, :, in_page, :].set(
        blk.transpose(1, 0, 2, 3))


def paged_forward(params, cfg: ModelConfig, tokens, position_ids,
                  pool_k, pool_v, tables, write_offsets, attn_mask,
                  kv_limits, scratch_page: int, *,
                  interpret: bool = False):
    """Batched decode forward consuming the transposed ("dp") page pool
    directly — no dense gather ever exists (the v1 per-step copy this
    replaces is gather_request + scatter_block).

    tokens/position_ids: [B, T]; pool_k/v: [L, n_pages, KH, D, page];
    tables: [B, P]; write_offsets/kv_limits: [B] (kv_limits must be
    write_offsets + T — the kernel derives each slot's boundary-window
    origin from it); attn_mask: [B, T, W·page] bool boundary windows from
    ops.paged_attention.boundary_mask_window (committed pages below the
    window are implicitly all-allowed — no full [T, P·page] mask is ever
    materialized); scratch_page: reserved page index absorbing writes of
    released/inactive slots (-1 table entries) — cheaper than a full-pool
    select per slot.
    Returns (logits, hidden, pool_k, pool_v)."""
    from .models.llama import apply_rope, rms_norm, rope_tables
    from .ops.paged_attention import paged_block_attention, scatter_block_t

    B, T = tokens.shape
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = params["embed"][tokens]
    cos, sin = rope_tables(position_ids, D, cfg.rope_theta)
    # one fused scatter for all slots: flatten (slot, token) -> (page, slot)
    flat_pages = []
    flat_slots = []
    for b in range(B):
        tok_pos = write_offsets[b] + jnp.arange(T)
        pg = tables[b][tok_pos // pool_k.shape[-1]]
        pg = jnp.where(pg < 0, scratch_page, pg)
        flat_pages.append(pg)
        flat_slots.append(tok_pos % pool_k.shape[-1])
    flat_pages = jnp.concatenate(flat_pages)              # [B*T]
    flat_slots = jnp.concatenate(flat_slots)

    def layer_step(carry, xs):
        h = carry
        lp, pk, pv = xs                     # pk/pv: [n_pages, KH, D, page]
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q = (x @ lp["wq"]).reshape(B, T, NH, D)
        k = (x @ lp["wk"]).reshape(B, T, KH, D)
        v = (x @ lp["wv"]).reshape(B, T, KH, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # [B, T, KH, D] -> [B*T, KH, D] rows scattered to (page, slot)
        pk = pk.at[flat_pages, :, :, flat_slots].set(
            k.reshape(B * T, KH, D))
        pv = pv.at[flat_pages, :, :, flat_slots].set(
            v.reshape(B * T, KH, D))
        ctx = paged_block_attention(q, pk, pv, tables, attn_mask, kv_limits,
                                    interpret=interpret)
        h = h + ctx @ lp["wo"]
        x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
        gated = jax.nn.silu(x @ lp["w_gate"]) * (x @ lp["w_up"])
        h = h + gated @ lp["w_down"]
        return h, (pk, pv)

    h, (pool_k, pool_v) = jax.lax.scan(layer_step, h,
                                       (params["layers"], pool_k, pool_v))
    from .models.llama import rms_norm as _rn

    h = _rn(h, params["final_norm"], cfg.rms_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    logits = jnp.dot(h, head, preferred_element_type=jnp.float32)
    return logits, h, pool_k, pool_v


class PagedRequest:
    """A request's page table + committed length."""

    def __init__(self, pool: PagedKVPool, max_len: int):
        self.pool = pool
        self.max_pages = pool.pages_for(max_len)
        self.pages: List[int] = []
        self.length = 0

    def ensure(self, new_length: int) -> None:
        need = self.pool.pages_for(new_length)
        if need > self.max_pages:
            raise ValueError("request exceeds its max_len")
        if need > len(self.pages):
            self.pages.extend(self.pool.alloc(need - len(self.pages)))

    def ensure_upto(self, want_length: int) -> int:
        """Best-effort growth toward ``want_length`` tokens (fused segments
        pre-allocate their worst-case growth; a tight pool just shortens
        the segment instead of failing).  Returns the token capacity."""
        want = min(self.pool.pages_for(want_length), self.max_pages)
        grab = min(want - len(self.pages), len(self.pool._free))
        if grab > 0:
            self.pages.extend(self.pool.alloc(grab))
        return len(self.pages) * self.pool.page_size

    def host_table(self):
        import numpy as np

        t = np.full(self.max_pages, -1, np.int32)
        t[:len(self.pages)] = self.pages
        return t

    def table(self) -> jax.Array:
        return jnp.asarray(self.host_table())

    def release(self) -> None:
        self.pool.free(self.pages)
        self.pages = []
        self.length = 0


# ----------------------------------------------------------------------
# Unified paged write path (consumed by models/llama.forward's paged mode)
# ----------------------------------------------------------------------

def quantize_rows(block: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """block [..., D] bf16 → (int8 [..., D], f32 scale [...]): symmetric
    per-row (per-token-per-head) quantization — identical formula to
    cache.quantize_kv_block so dense↔paged int8 KV values agree bitwise."""
    bf = block.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(bf), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(bf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def paged_flat_indices(tables: jax.Array, write_offsets: jax.Array, T: int,
                       page: int, scratch_page: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """(page ids, in-page slots), each [B*T], for a block written at
    ``write_offsets`` per slot.  Rows past a slot's table (-1 entries or
    out-of-range logical positions) are remapped to the scratch page, so
    finished/over-length slots scribble harmlessly."""
    B, P = tables.shape
    tok_pos = write_offsets[:, None] + jnp.arange(T)[None, :]   # [B, T]
    row = tok_pos // page
    pg = jnp.take_along_axis(tables, jnp.clip(row, 0, P - 1), axis=1)
    pg = jnp.where((pg < 0) | (row >= P), scratch_page, pg)
    return pg.reshape(-1), (tok_pos % page).reshape(-1)


def paged_write_block(cache: PagedKV, block: jax.Array,
                      flat_pages: jax.Array,
                      flat_slots: jax.Array) -> PagedKV:
    """Scatter a fresh KV block [B, KH, T, D] into one layer's page pool
    (pool [n_pages, KH, D, page]); quantizes per token when the pool is
    int8.  flat indices from ``paged_flat_indices``."""
    B, KH, T, D = block.shape
    rows = block.transpose(0, 2, 1, 3).reshape(B * T, KH, D)
    if cache.scale is not None:
        qrows, srows = quantize_rows(rows)
        return PagedKV(cache.pool.at[flat_pages, :, :, flat_slots].set(qrows),
                       cache.scale.at[flat_pages, :, 0, flat_slots].set(srows))
    return PagedKV(cache.pool.at[flat_pages, :, :, flat_slots].set(
        rows.astype(cache.pool.dtype)), None)


def paged_compact_block(cache: PagedKV, tables: jax.Array,
                        offsets: jax.Array, path_nodes: jax.Array,
                        block_size: int, scratch_page: int) -> PagedKV:
    """Per-slot gather-compaction of accepted tree-draft rows, directly on
    the page pool — the paged analogue of cache.compact_accepted_batched
    (reference rollback: /root/reference/samd/cache.py:117-133).

    For every slot the block rows [offset, offset+M) are gathered at the
    accepted path's in-block positions and written back as a contiguous
    prefix.  One fused [B*M]-row gather + scatter per layer (~the block's
    own KV bytes), never a pool rewrite.  Dead slots' rows collide on the
    scratch page where write order is irrelevant."""
    B, P = tables.shape
    M = block_size
    A = path_nodes.shape[1]                  # path width (== M for chains)
    page = cache.page_size

    def flat_idx(width):
        tok = offsets[:, None] + jnp.arange(width)[None, :]  # [B, width]
        row = tok // page
        pg = jnp.take_along_axis(tables, jnp.clip(row, 0, P - 1), axis=1)
        pg = jnp.where((pg < 0) | (row >= P), scratch_page, pg)
        return pg.reshape(-1), (tok % page).reshape(-1)

    r_pg, r_sl = flat_idx(M)        # gather the whole written block
    w_pg, w_sl = flat_idx(A)        # write the compacted path prefix

    def per_layer(c: PagedKV) -> PagedKV:
        blk = c.pool[r_pg, :, :, r_sl]                       # [B*M, KH, D]
        KH, D = blk.shape[1], blk.shape[2]
        sel = jnp.take_along_axis(
            blk.reshape(B, M, KH * D), path_nodes[:, :, None], axis=1)
        pool = c.pool.at[w_pg, :, :, w_sl].set(
            sel.reshape(B * A, KH, D))
        scale = c.scale
        if scale is not None:
            sb = scale[r_pg, :, 0, r_sl].reshape(B, M, KH)
            ssel = jnp.take_along_axis(sb, path_nodes[:, :, None], axis=1)
            scale = scale.at[w_pg, :, 0, w_sl].set(
                ssel.reshape(B * A, KH))
        return PagedKV(pool, scale)

    return jax.vmap(per_layer)(cache)
