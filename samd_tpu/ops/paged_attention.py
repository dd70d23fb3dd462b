"""Pallas TPU kernel: paged flash attention for draft-block verification.

`paged_kv.PagedKVPool` v1 gathered every request's live pages into a dense
view before each decode step — a full read+write of the live KV per step.
This kernel consumes the page pool *directly*: the page table is a
scalar-prefetch argument, and the kernel DMA-streams exactly the live pages
(``cdiv(kv_limit, page_size)``) per (slot, kv-head), accumulating with the
online (flash) softmax.  No dense copy ever exists.

Pool layout: ``[n_pages, KH, D, page_size]`` per layer ("dp" transposed
layout — the page axis is the sliced axis and the lane dim page_size is
block-aligned, mirroring ops/pallas_attention.py's [D, S] choice).

Logical columns: page j of a request covers logical columns
[j*page, (j+1)*page); the caller's [T, S_logical] mask (from
block_decode_mask over the contiguous view) is sliced per page — the
logical→physical remap touches only WHICH page is DMA'd, never the mask.

Reference context: this replaces the rollback/copy traffic of the
reference's cache (/root/reference/samd/cache.py:117-133) and the v1
gather (samd_tpu/paged_kv.py), the step this whole path is meant to beat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _paged_kernel(kv_limits_ref, tables_ref, q_ref, k_pool, v_pool,
                  mask_hbm, out_ref, *, page: int, scale: float, T: int,
                  KH: int, k_scale_hbm=None, v_scale_hbm=None):
    """One slot, ALL kv-heads.  q_ref/out_ref: [1, KH, R, D] VMEM; k/v_pool:
    [n_pages, KH, D, page] HBM; mask_hbm: [B, Tp, W] HBM int8 — the
    *boundary window*: the mask for logical columns
    [⌊hist/page⌋·page, +W) only, where hist = kv_limit - T.  Pages fully
    below hist are committed prefix — every query row attends them, no mask
    bytes needed (this is most pages, and why the window replaces the old
    per-page [Tp, page] mask DMA of a full [B, Tp, S_logical] mask).
    kv_limits_ref: [B] SMEM; tables_ref: [B, P] SMEM.

    The head loop lives INSIDE the program (one flattened (head, page)
    fori_loop with double-buffered DMA across head boundaries): at serving
    shapes each (slot, head) does only a few small DMAs, so per-program
    fixed cost dominates a (B, KH) grid — folding KH cuts program count 4×
    and shares the single mask-window DMA across heads.

    k/v_scale_hbm (int8 paged pool): [n_pages, KH, 1, page] f32 per-token
    dequant scales; k/v_pool are then int8 and the kernel DMAs HALF the KV
    bytes per page, dequantizing in-register after each page lands (same
    scheme as ops/pallas_attention's int8-KV mode)."""
    b = pl.program_id(0)
    _, _, R, D = q_ref.shape
    quantized = k_scale_hbm is not None
    kv_limit = kv_limits_ref[b]
    num_pages = pl.cdiv(kv_limit, page)
    # first page touching uncommitted columns; window column 0 = w0p * page
    w0p = (kv_limit - T) // page

    def body(k_buf, v_buf, ks_buf, vs_buf, m_buf, sem_k, sem_v, sem_ks,
             sem_vs, sem_m, acc, m_i, l_i):
        # one window DMA per program (not per page, not per head)
        mask_cp = pltpu.make_async_copy(mask_hbm.at[b], m_buf, sem_m)
        mask_cp.start()

        def get_copies(idx, slot):
            # clamp: released slots carry -1 page ids; their rows are
            # discarded by the host, but the DMA address must stay valid
            h = idx // num_pages
            j = idx - h * num_pages
            p = jnp.maximum(tables_ref[b, j], 0)
            copies = (
                pltpu.make_async_copy(k_pool.at[p, h],
                                      k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(v_pool.at[p, h],
                                      v_buf.at[slot], sem_v.at[slot]),
            )
            if quantized:
                copies += (
                    pltpu.make_async_copy(k_scale_hbm.at[p, h],
                                          ks_buf.at[slot], sem_ks.at[slot]),
                    pltpu.make_async_copy(v_scale_hbm.at[p, h],
                                          vs_buf.at[slot], sem_vs.at[slot]),
                )
            return copies

        for c in get_copies(0, 0):
            c.start()
        mask_cp.wait()
        total = KH * num_pages

        def loop(idx, _):
            slot = idx % 2
            h = idx // num_pages
            j = idx - h * num_pages

            @pl.when(j == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)
                m_i[:] = jnp.full_like(m_i, NEG_INF)
                l_i[:] = jnp.zeros_like(l_i)

            @pl.when(idx + 1 < total)
            def _():
                for c in get_copies(idx + 1, (idx + 1) % 2):
                    c.start()

            for c in get_copies(idx, slot):
                c.wait()

            q = q_ref[0, h].astype(jnp.float32)            # [R, D]
            if quantized:
                # per-column (token) dequant: scale broadcasts over D rows
                kT = k_buf[slot].astype(jnp.float32) * ks_buf[slot][0][None]
                vT = v_buf[slot].astype(jnp.float32) * vs_buf[slot][0][None]
            else:
                kT = k_buf[slot].astype(jnp.float32)       # [D, page]
                vT = v_buf[slot].astype(jnp.float32)
            G = R // T
            # committed pages (j < w0p): all rows attend; boundary pages:
            # window slice (j - w0p) carries the prefix/tree predicate
            rel = j - w0p
            off = jnp.maximum(rel, 0) * page
            mask_t = (m_buf[:T, pl.ds(off, page)] != 0) | (rel < 0)
            mask_r = jnp.broadcast_to(mask_t[None], (G, T, page)
                                      ).reshape(R, page)
            s = jax.lax.dot_general(
                q, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [R, page]
            s = jnp.where(mask_r, s, NEG_INF)
            m_new = jnp.maximum(m_i[:], jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_i[:] - m_new)
            l_i[:] = l_i[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc[:] = acc[:] * alpha + jax.lax.dot_general(
                p, vT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_i[:] = m_new

            @pl.when(j == num_pages - 1)
            def _():
                out_ref[0, h] = (acc[:] / jnp.maximum(l_i[:], 1e-30)
                                 ).astype(out_ref.dtype)

            return 0

        jax.lax.fori_loop(0, total, loop, 0)

    D = q_ref.shape[-1]
    Tp, W = mask_hbm.shape[1], mask_hbm.shape[2]
    R = q_ref.shape[2]
    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, D, page), k_pool.dtype),
        v_buf=pltpu.VMEM((2, D, page), v_pool.dtype),
        ks_buf=pltpu.VMEM((2, 1, page), jnp.float32),
        vs_buf=pltpu.VMEM((2, 1, page), jnp.float32),
        m_buf=pltpu.VMEM((Tp, W), jnp.int8),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_ks=pltpu.SemaphoreType.DMA((2,)),
        sem_vs=pltpu.SemaphoreType.DMA((2,)),
        sem_m=pltpu.SemaphoreType.DMA(()),
        acc=pltpu.VMEM((R, D), jnp.float32),
        m_i=pltpu.VMEM((R, 1), jnp.float32),
        l_i=pltpu.VMEM((R, 1), jnp.float32),
    )


def window_pages(T: int, page: int) -> int:
    """Number of pages a boundary mask window must cover: the draft block
    [hist, hist+T) spans at most cdiv(T, page) + 1 pages of the pool."""
    return -(-T // page) + 1


def boundary_mask_window(tree_mask: jax.Array, cache_len: jax.Array,
                         page: int) -> jax.Array:
    """Mask for the boundary pages only: logical columns
    [⌊cache_len/page⌋·page, +W·page) of a draft block written at
    ``cache_len`` — committed prefix columns allowed for every row, in-block
    columns per the [T, T] tree mask.  Replaces materializing the full
    [T, S_logical] mask (the committed pages below the window need no mask
    at all; the kernel treats them as all-allowed).  Returns [T, W·page]."""
    T = tree_mask.shape[0]
    W = window_pages(T, page) * page
    c = (cache_len // page) * page + jnp.arange(W)          # [W] logical cols
    prefix = c < cache_len
    rel = jnp.clip(c - cache_len, 0, T - 1)
    in_block = (c >= cache_len) & (c < cache_len + T)
    tm = jnp.take_along_axis(tree_mask,
                             jnp.broadcast_to(rel[None], (T, W)), axis=1)
    return prefix[None, :] | (in_block[None, :] & tm)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_block_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                          tables: jax.Array, mask_win: jax.Array,
                          kv_limits: jax.Array, *,
                          k_scale: jax.Array = None,
                          v_scale: jax.Array = None,
                          interpret: bool = False) -> jax.Array:
    """Batched paged attention over one layer's page pool.

    q:         [B, T, NH, D]
    k/v_pool:  [n_pages, KH, D, page] (one layer, transposed page layout)
    tables:    [B, P] int32 page ids (-1 padded beyond the live pages)
    mask_win:  [B, T, W·page] bool — per-slot boundary window from
               ``boundary_mask_window`` (W = window_pages(T, page));
               committed pages below the window are implicitly all-allowed
    kv_limits: [B] int32 — attend to logical columns < kv_limits[b];
               MUST equal the slot's committed length + T (the kernel
               derives the window origin as (kv_limit - T) // page)
    k/v_scale: [n_pages, KH, 1, page] f32 — int8-pool mode: k/v_pool hold
               int8 values, dequantized in-register per page
    Returns [B, T, NH*D]."""
    B, T, NH, D = q.shape
    _, KH, _, page = k_pool.shape
    G = NH // KH
    R = G * T
    quantized = k_scale is not None
    assert mask_win.shape[-1] == window_pages(T, page) * page, mask_win.shape
    # [B, KH, R, D] query rows (row r = g*T + t)
    qh = q.transpose(0, 2, 1, 3).reshape(B, KH, G, T, D).reshape(B, KH, R, D)
    Tp = _round_up(T, 32)
    W = mask_win.shape[-1]
    mask8 = jnp.zeros((B, Tp, W), jnp.int8)
    mask8 = mask8.at[:, :T].set(mask_win.astype(jnp.int8))

    n_hbm = 5 if quantized else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # kv_limits, tables
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KH, R, D), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * n_hbm,
        ],
        out_specs=pl.BlockSpec((1, KH, R, D), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    if quantized:
        def kernel(kv_limits_ref, tables_ref, q_ref, k_ref, v_ref, ks_ref,
                   vs_ref, mask_ref, out_ref):
            _paged_kernel(kv_limits_ref, tables_ref, q_ref, k_ref, v_ref,
                          mask_ref, out_ref, page=page, scale=D ** -0.5,
                          T=T, KH=KH, k_scale_hbm=ks_ref, v_scale_hbm=vs_ref)
        operands = (qh, k_pool, v_pool, k_scale, v_scale, mask8)
    else:
        def kernel(kv_limits_ref, tables_ref, q_ref, k_ref, v_ref, mask_ref,
                   out_ref):
            _paged_kernel(kv_limits_ref, tables_ref, q_ref, k_ref, v_ref,
                          mask_ref, out_ref, page=page, scale=D ** -0.5,
                          T=T, KH=KH)
        operands = (qh, k_pool, v_pool, mask8)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, R, D), q.dtype),
        interpret=interpret,
    )(kv_limits.astype(jnp.int32), tables.astype(jnp.int32), *operands)
    # [B, KH, G, T, D] -> [B, T, NH*D]
    return out.reshape(B, KH, G, T, D).transpose(0, 3, 1, 2, 4).reshape(
        B, T, NH * D)


def scatter_block_t(pool: jax.Array, table: jax.Array, offset: jax.Array,
                    block: jax.Array, *,
                    scratch_page: int = -1) -> jax.Array:
    """Write ``block`` [KH, T, D] at logical position ``offset`` into one
    layer's transposed page pool [n_pages, KH, D, page] (per-token scatter;
    T is the small draft block).

    ``scratch_page`` >= 0 remaps -1 table entries there — released/inactive
    slots scribble on a reserved page instead of needing a full-pool
    select (jnp.where over the pool costs ~a weight-read per slot)."""
    page = pool.shape[3]
    T = block.shape[1]
    tok_pos = offset + jnp.arange(T)
    page_idx = table[tok_pos // page]                     # [T]
    if scratch_page >= 0:
        page_idx = jnp.where(page_idx < 0, scratch_page, page_idx)
    in_page = tok_pos % page                              # [T]
    # pool[page_idx[t], :, :, in_page[t]] = block[:, t, :].T
    blk = block.transpose(1, 0, 2)                        # [T, KH, D]
    return pool.at[page_idx, :, :, in_page].set(blk)
