"""Pallas TPU kernel: flash attention for draft-block verification.

The decode step attends a block of T draft tokens against a preallocated KV
cache of static size S (e.g. 2048).  XLA's dot-product attention reads and
masks the *entire* [S] axis every step; with a 300-token committed prefix
that is ~7x wasted HBM traffic on the dominant memory stream.  This kernel
streams only ``ceil(kv_limit / BLOCK)`` KV blocks (``kv_limit = cache_len +
T``), double-buffering HBM→VMEM copies and accumulating with the online
(flash) softmax.

Layouts (chosen for Mosaic's tiling rules — memref slices must keep the lane
dim 128-aligned, and head_dim is often 64):
  * KV are consumed transposed, ``[KH, D, S]`` — the sliced/streamed axis S
    is the lane dim, always block-aligned.  The wrapper transposes per call
    (bytes ≈ one KV block read; negligible next to the traffic saved).
  * The [T, S] prefix+tree mask is computed in-jit, cast to int8 (bool DMA is
    unsupported) and padded to sublane multiple 32.
  * Grid over KV heads; the per-head query block folds the G = NH/KH grouped
    query heads into rows ([G*T, D]).

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
            block_s: int, scale: float, T: int):
    """One KV head.  q_ref/out_ref: [1, R, D] VMEM blocks; kT/vT_hbm: [D, S]
    (transposed); mask_hbm: [Tp, S] int8 (Tp = T padded to 32).
    R = G*T; row r ↔ query t = r % T."""
    _, R, D = q_ref.shape
    Tp = mask_hbm.shape[0]
    S = kT_hbm.shape[1]
    G = R // T
    kv_limit = kv_limit_ref[0]
    num_blocks = pl.cdiv(jnp.minimum(kv_limit, S), block_s)

    def body(k_buf, v_buf, m_buf, sem_k, sem_v, sem_m, acc, m_i, l_i):
        q = q_ref[0].astype(jnp.float32)                   # [R, D]

        def get_copies(j, slot):
            off = pl.multiple_of(j * block_s, block_s)
            return (
                pltpu.make_async_copy(kT_hbm.at[:, pl.ds(off, block_s)],
                                      k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(vT_hbm.at[:, pl.ds(off, block_s)],
                                      v_buf.at[slot], sem_v.at[slot]),
                pltpu.make_async_copy(mask_hbm.at[:, pl.ds(off, block_s)],
                                      m_buf.at[slot], sem_m.at[slot]),
            )

        for c in get_copies(0, 0):
            c.start()

        acc[:] = jnp.zeros((R, D), jnp.float32)
        m_i[:] = jnp.full((R, 1), NEG_INF, jnp.float32)
        l_i[:] = jnp.zeros((R, 1), jnp.float32)

        def loop(j, _):
            slot = j % 2

            @pl.when(j + 1 < num_blocks)
            def _():
                for c in get_copies(j + 1, (j + 1) % 2):
                    c.start()

            for c in get_copies(j, slot):
                c.wait()

            kT = k_buf[slot].astype(jnp.float32)           # [D, BS]
            vT = v_buf[slot].astype(jnp.float32)           # [D, BS]
            mask_t = m_buf[slot][:T, :] != 0               # [T, BS]
            # expand to grouped rows: row r = g*T + t
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
            return 0

        jax.lax.fori_loop(0, num_blocks, loop, 0)
        out_ref[0] = (acc[:] / jnp.maximum(l_i[:], 1e-30)).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, D, block_s), kT_hbm.dtype),
        v_buf=pltpu.VMEM((2, D, block_s), vT_hbm.dtype),
        m_buf=pltpu.VMEM((2, Tp, block_s), jnp.int8),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_m=pltpu.SemaphoreType.DMA((2,)),
        acc=pltpu.VMEM((R, D), jnp.float32),
        m_i=pltpu.VMEM((R, 1), jnp.float32),
        l_i=pltpu.VMEM((R, 1), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("block_s", "interpret", "pre_transposed"))
def flash_block_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: jax.Array, kv_limit: jax.Array, *,
                          block_s: int = 512, pre_transposed: bool = False,
                          interpret: bool = False) -> jax.Array:
    """Drop-in for the XLA attention on batch 1.

    q: [1, T, NH, D]; k, v: [1, KH, S, D] — or the kernel-native transposed
    [1, KH, D, S] with ``pre_transposed=True`` (the "ds" cache layout, which
    removes the per-call transpose that made this kernel net-negative
    in-loop); mask: [1, T, S] bool; kv_limit: scalar int32 (attend only to
    slots < kv_limit).  Returns [1, T, NH*D]."""
    _, T, NH, D = q.shape
    if pre_transposed:
        _, KH, _, S = k.shape
    else:
        _, KH, S, _ = k.shape
    G = NH // KH
    R = G * T
    block_s = min(block_s, S)
    assert S % block_s == 0, (S, block_s)
    # [KH, G*T, D] query rows per kv head (row r = g*T + t)
    qh = q[0].transpose(1, 0, 2).reshape(KH, G, T, D).reshape(KH, R, D)
    if pre_transposed:
        kT, vT = k[0], v[0]        # already [KH, D, S]
    else:
        kT = k[0].transpose(0, 2, 1)   # [KH, D, S]
        vT = v[0].transpose(0, 2, 1)
    Tp = _round_up(T, 32)
    mask8 = jnp.zeros((Tp, S), jnp.int8).at[:T].set(mask[0].astype(jnp.int8))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(KH,),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda h, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            # KV + mask stay whole-array in HBM; the kernel slices the
            # current head and DMA-streams S-blocks into VMEM itself.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, R, D), lambda h, *_: (h, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(kv_limit_ref, q_ref, k_ref, v_ref, mask_ref, out_ref):
        h = pl.program_id(0)
        _kernel(kv_limit_ref, q_ref, k_ref.at[h], v_ref.at[h],
                mask_ref, out_ref, block_s=block_s, scale=D ** -0.5, T=T)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KH, R, D), q.dtype),
        interpret=interpret,
    )(kv_limit[None].astype(jnp.int32), qh, kT, vT, mask8)
    # [KH, G, T, D] -> [T, KH*G*D]
    return out.reshape(KH, G, T, D).transpose(2, 0, 1, 3).reshape(1, T, NH * D)
