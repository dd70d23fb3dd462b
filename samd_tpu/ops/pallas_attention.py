"""Pallas TPU kernel: flash attention for draft-block verification.

The decode step attends a block of T draft tokens against a preallocated KV
cache of static size S (e.g. 2048).  XLA's dot-product attention reads and
masks the *entire* [S] axis every step; with a 300-token committed prefix
that is ~7x wasted HBM traffic on the dominant memory stream.  This kernel
streams only ``ceil(kv_limit / BLOCK)`` KV blocks (``kv_limit = cache_len +
T``), double-buffering HBM→VMEM copies and accumulating with the online
(flash) softmax.

v2 (the paged kernel's launch-cost lessons, ops/paged_attention.py):
  * Head-folded grid — ONE program per call with a flattened (head, block)
    DMA loop inside, instead of grid=(KH,).  At decode shapes each head
    streams only 1–4 blocks, so per-program fixed cost dominated the old
    per-head grid (KH × layers program instances per step).
  * Boundary-window mask — blocks fully below the committed length need no
    mask bytes (every query row attends them); the kernel DMAs one
    [Tp, 2·BLOCK] window covering the block boundary once per call, not a
    [Tp, BLOCK] slice of the full [T, S] mask per (head, block).

Layouts (chosen for Mosaic's tiling rules — memref slices must keep the lane
dim 128-aligned, and head_dim is often 64):
  * KV are consumed transposed, ``[KH, D, S]`` — the sliced/streamed axis S
    is the lane dim, always block-aligned.  The wrapper transposes per call
    unless the cache is stored in the native "ds" layout
    (``pre_transposed``).
  * The mask window is cast to int8 (bool DMA is unsupported) and padded to
    sublane multiple 32.

Exactness: same f32 score/softmax math as the XLA path (tests compare both,
interpret-mode on CPU and compiled on TPU)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(kv_limit_ref, q_ref, kT_hbm, vT_hbm, mask_hbm, out_ref, *,
            block_s: int, scale: float, T: int, KH: int,
            scales_hbm=None):
    """One program, ALL kv-heads.  q_ref/out_ref: [KH, R, D] VMEM;
    kT/vT_hbm: [KH, D, S] (transposed); mask_hbm: [Tp, 2·block_s] int8 —
    the *boundary window*: mask for columns [⌊cache_len/block⌋·block, +2B)
    only, where cache_len = kv_limit - T.  Blocks fully below the window
    are committed prefix — every query row attends them.
    R = G*T; row r ↔ query t = r % T.

    scales_hbm (int8-KV mode): [KH, 2, S] f32 — per-(head, token) k/v
    dequant scales; kT/vT are then int8 and the kernel DMAs HALF the KV
    bytes, dequantizing in-register after each block lands."""
    _, R, D = q_ref.shape
    S = kT_hbm.shape[2]
    G = R // T
    quantized = scales_hbm is not None
    kv_limit = kv_limit_ref[0]
    num_blocks = pl.cdiv(jnp.minimum(kv_limit, S), block_s)
    # first block touching uncommitted columns; window col 0 = jw * block_s
    jw = (kv_limit - T) // block_s

    def body(k_buf, v_buf, s_buf, m_buf, sem_k, sem_v, sem_s, sem_m, acc,
             m_i, l_i):
        # one window DMA per program (not per block, not per head)
        mask_cp = pltpu.make_async_copy(mask_hbm, m_buf, sem_m)
        mask_cp.start()

        def get_copies(idx, slot):
            h = idx // num_blocks
            j = idx - h * num_blocks
            off = pl.multiple_of(j * block_s, block_s)
            copies = (
                pltpu.make_async_copy(kT_hbm.at[h, :, pl.ds(off, block_s)],
                                      k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(vT_hbm.at[h, :, pl.ds(off, block_s)],
                                      v_buf.at[slot], sem_v.at[slot]),
            )
            if quantized:
                copies += (pltpu.make_async_copy(
                    scales_hbm.at[h, :, pl.ds(off, block_s)],
                    s_buf.at[slot], sem_s.at[slot]),)
            return copies

        for c in get_copies(0, 0):
            c.start()
        mask_cp.wait()
        total = KH * num_blocks

        def loop(idx, _):
            slot = idx % 2
            h = idx // num_blocks
            j = idx - h * num_blocks

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

            q = q_ref[h].astype(jnp.float32)               # [R, D]
            if quantized:
                sc = s_buf[slot]                           # [2, BS] f32
                kT = k_buf[slot].astype(jnp.float32) * sc[0][None, :]
                vT = v_buf[slot].astype(jnp.float32) * sc[1][None, :]
            else:
                kT = k_buf[slot].astype(jnp.float32)       # [D, BS]
                vT = v_buf[slot].astype(jnp.float32)
            # committed blocks (j < jw): all rows attend; boundary blocks:
            # window slice (j - jw) carries the prefix/tree/tail predicate
            rel = j - jw
            off = jnp.maximum(rel, 0) * block_s
            mask_t = (m_buf[:T, pl.ds(off, block_s)] != 0) | (rel < 0)
            mask_r = jnp.broadcast_to(mask_t[None], (G, T, block_s)
                                      ).reshape(R, block_s)
            s = jax.lax.dot_general(
                q, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [R, BS]
            s = jnp.where(mask_r, s, NEG_INF)
            m_new = jnp.maximum(m_i[:], jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)                           # [R, BS]
            alpha = jnp.exp(m_i[:] - m_new)
            l_i[:] = l_i[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc[:] = acc[:] * alpha + jax.lax.dot_general(
                p, vT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [R, D]
            m_i[:] = m_new

            @pl.when(j == num_blocks - 1)
            def _():
                out_ref[h] = (acc[:] / jnp.maximum(l_i[:], 1e-30)
                              ).astype(out_ref.dtype)

            return 0

        jax.lax.fori_loop(0, total, loop, 0)

    Tp, W = mask_hbm.shape
    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, D, block_s), kT_hbm.dtype),
        v_buf=pltpu.VMEM((2, D, block_s), vT_hbm.dtype),
        s_buf=pltpu.VMEM((2, 2, block_s), jnp.float32),
        m_buf=pltpu.VMEM((Tp, W), jnp.int8),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_s=pltpu.SemaphoreType.DMA((2,)),
        sem_m=pltpu.SemaphoreType.DMA(()),
        acc=pltpu.VMEM((R, D), jnp.float32),
        m_i=pltpu.VMEM((R, 1), jnp.float32),
        l_i=pltpu.VMEM((R, 1), jnp.float32),
    )


def _kernel_foldkv(kv_limit_ref, q_ref, kT_hbm, vT_hbm, mask_hbm, out_ref,
                   *, block_s: int, scale: float, T: int, KH: int,
                   scales_hbm=None):
    """Block-major variant for MANY-kv-head models (7B-class: KH=32).

    ``_kernel`` loops (head × block) with per-head [D, block] DMAs — at
    KH=32 and short live prefixes that is 32+ serialized tiny DMAs per
    layer and the kernel is latency-bound (measured: WORSE than XLA's
    full-cache read at 7B).  Here each KV block is DMA'd ONCE for all
    heads ([KH, D, block] slices, double-buffered across blocks) and the
    per-head flash update runs from VMEM (unrolled 2-D dots — Mosaic has
    no batched dot).  DMA count: cdiv(live, block) per layer instead of
    KH × cdiv(live, block).

    VMEM: 2 × 2 × KH·D·block·dtype buffers + [KH, R, D] f32 accumulators —
    at 7B shapes (KH=32, D=128, block 256, bf16) that is 8 MB of KV
    buffers; callers cap block_s accordingly."""
    _, R, D = q_ref.shape
    S = kT_hbm.shape[2]
    G = R // T
    quantized = scales_hbm is not None
    kv_limit = kv_limit_ref[0]
    num_blocks = pl.cdiv(jnp.minimum(kv_limit, S), block_s)
    jw = (kv_limit - T) // block_s

    def body(k_buf, v_buf, s_buf, m_buf, sem_k, sem_v, sem_s, sem_m, acc,
             m_i, l_i):
        mask_cp = pltpu.make_async_copy(mask_hbm, m_buf, sem_m)
        mask_cp.start()

        def get_copies(j, slot):
            off = pl.multiple_of(j * block_s, block_s)
            copies = (
                pltpu.make_async_copy(kT_hbm.at[:, :, pl.ds(off, block_s)],
                                      k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(vT_hbm.at[:, :, pl.ds(off, block_s)],
                                      v_buf.at[slot], sem_v.at[slot]),
            )
            if quantized:
                copies += (pltpu.make_async_copy(
                    scales_hbm.at[:, :, pl.ds(off, block_s)],
                    s_buf.at[slot], sem_s.at[slot]),)
            return copies

        for c in get_copies(0, 0):
            c.start()
        mask_cp.wait()
        acc[:] = jnp.zeros_like(acc)
        m_i[:] = jnp.full_like(m_i, NEG_INF)
        l_i[:] = jnp.zeros_like(l_i)

        def loop(j, _):
            slot = j % 2

            @pl.when(j + 1 < num_blocks)
            def _():
                for c in get_copies(j + 1, (j + 1) % 2):
                    c.start()

            for c in get_copies(j, slot):
                c.wait()

            rel = j - jw
            off = jnp.maximum(rel, 0) * block_s
            mask_t = (m_buf[:T, pl.ds(off, block_s)] != 0) | (rel < 0)
            mask_r = jnp.broadcast_to(mask_t[None], (G, T, block_s)
                                      ).reshape(R, block_s)
            for h in range(KH):          # unrolled: VMEM-resident per-head
                q = q_ref[h].astype(jnp.float32)             # [R, D]
                if quantized:
                    sc = s_buf[slot, h]                      # [2, BS]
                    kT = k_buf[slot, h].astype(jnp.float32) * sc[0][None]
                    vT = v_buf[slot, h].astype(jnp.float32) * sc[1][None]
                else:
                    kT = k_buf[slot, h].astype(jnp.float32)  # [D, BS]
                    vT = v_buf[slot, h].astype(jnp.float32)
                s = jax.lax.dot_general(
                    q, kT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(mask_r, s, NEG_INF)
                m_new = jnp.maximum(m_i[h], jnp.max(s, axis=1,
                                                    keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_i[h] - m_new)
                l_i[h] = l_i[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc[h] = acc[h] * alpha + jax.lax.dot_general(
                    p, vT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_i[h] = m_new
            return 0

        jax.lax.fori_loop(0, num_blocks, loop, 0)
        out_ref[...] = (acc[...] / jnp.maximum(l_i[...], 1e-30)
                        ).astype(out_ref.dtype)

    Tp, W = mask_hbm.shape
    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, KH, D, block_s), kT_hbm.dtype),
        v_buf=pltpu.VMEM((2, KH, D, block_s), vT_hbm.dtype),
        s_buf=pltpu.VMEM((2, KH, 2, block_s), jnp.float32),
        m_buf=pltpu.VMEM((Tp, W), jnp.int8),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_s=pltpu.SemaphoreType.DMA((2,)),
        sem_m=pltpu.SemaphoreType.DMA(()),
        acc=pltpu.VMEM((KH, R, D), jnp.float32),
        m_i=pltpu.VMEM((KH, R, 1), jnp.float32),
        l_i=pltpu.VMEM((KH, R, 1), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("block_s", "interpret", "pre_transposed"))
def flash_block_attention(q: jax.Array, k, v,
                          mask: jax.Array, kv_limit: jax.Array, *,
                          block_s: int = 512, pre_transposed: bool = False,
                          interpret: bool = False) -> jax.Array:
    """Drop-in for the XLA attention on batch 1.

    q: [1, T, NH, D]; k, v: [1, KH, S, D] — or the kernel-native transposed
    [1, KH, D, S] with ``pre_transposed=True`` (the "ds" cache layout, which
    removes the per-call transpose that made this kernel net-negative
    in-loop) — or ``cache.QuantizedKV`` holding the transposed int8 cache
    (``kv_quant`` + "ds"): the kernel then DMAs half the KV bytes and
    dequantizes in-register.  mask: [1, T, S] bool; kv_limit: scalar int32
    (attend only to slots < kv_limit).  Returns [1, T, NH*D].

    Requires T <= block_s (the boundary window spans two blocks)."""
    from ..cache import QuantizedKV

    quantized = isinstance(k, QuantizedKV)
    _, T, NH, D = q.shape
    if quantized:
        assert pre_transposed, "int8-KV flash requires the ds cache layout"
        scales = jnp.stack([k.scale[0], v.scale[0]], axis=1)  # [KH, 2, S]
        k, v = k.q, v.q
    if pre_transposed:
        _, KH, _, S = k.shape
    else:
        _, KH, S, _ = k.shape
    G = NH // KH
    R = G * T
    # many-kv-head models (7B-class, KH>=8): block-major kernel — one
    # [KH, D, block] DMA per block instead of KH per-head DMAs (see
    # _kernel_foldkv).  Its KV VMEM is KH-proportional, so cap the block
    # size to ~8 MB of double-buffered k+v (floor 128 lanes; T <= block
    # must hold for the 2-block boundary window).
    fold_kv = KH >= 8
    if fold_kv:
        itemsize = 1 if quantized else 2
        cap = max(128, (8 << 20) // (4 * KH * D * itemsize) // 128 * 128)
        block_s = min(block_s, cap)
        block_s = max(block_s, _round_up(T, 128))
    block_s = min(block_s, S)
    assert S % block_s == 0, (S, block_s)
    assert T <= block_s, (T, block_s)
    # [KH, G*T, D] query rows per kv head (row r = g*T + t)
    qh = q[0].transpose(1, 0, 2).reshape(KH, G, T, D).reshape(KH, R, D)
    if pre_transposed:
        kT, vT = k[0], v[0]        # already [KH, D, S]
    else:
        kT = k[0].transpose(0, 2, 1)   # [KH, D, S]
        vT = v[0].transpose(0, 2, 1)
    # boundary window: mask columns [⌊cache_len/block⌋·block, +2·block);
    # pad S by one block so the slice stays in bounds when the window's
    # second block would start at S (then it is never streamed: the last
    # streamed block index is cdiv(kv_limit, block)-1 <= jw when
    # jw = (S-block)/block)
    Tp = _round_up(T, 32)
    w0 = ((kv_limit.astype(jnp.int32) - T) // block_s) * block_s
    maskp = jnp.zeros((Tp, S + block_s), jnp.int8)
    maskp = maskp.at[:T, :S].set(mask[0].astype(jnp.int8))
    win8 = jax.lax.dynamic_slice(maskp, (0, w0), (Tp, 2 * block_s))

    n_hbm = 4 if quantized else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((KH, R, D), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # KV (+ scales) + mask window stay whole-array in HBM; the
            # kernel slices (head, block) and DMA-streams into VMEM itself.
            *[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * n_hbm,
        ],
        out_specs=pl.BlockSpec((KH, R, D), lambda *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    kern = _kernel_foldkv if fold_kv else _kernel
    if quantized:
        def kernel(kv_limit_ref, q_ref, k_ref, v_ref, s_ref, mask_ref,
                   out_ref):
            kern(kv_limit_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                 block_s=block_s, scale=D ** -0.5, T=T, KH=KH,
                 scales_hbm=s_ref)
        operands = (qh, kT, vT, scales, win8)
    else:
        def kernel(kv_limit_ref, q_ref, k_ref, v_ref, mask_ref, out_ref):
            kern(kv_limit_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                 block_s=block_s, scale=D ** -0.5, T=T, KH=KH)
        operands = (qh, kT, vT, win8)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KH, R, D), q.dtype),
        interpret=interpret,
    )(kv_limit[None].astype(jnp.int32), *operands)
    # [KH, G, T, D] -> [T, KH*G*D]
    return out.reshape(KH, G, T, D).transpose(2, 0, 1, 3).reshape(1, T, NH * D)
