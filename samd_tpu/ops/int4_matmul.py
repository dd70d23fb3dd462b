"""Pallas TPU kernel: weight-streaming int4 matmul (0.5 bytes/weight).

Decode steps are weight-streaming-bound (docs/PERFORMANCE.md roofline: the
1B int8 step is ~55% of streaming speed-of-light, the 7B step's floor is the
int8 weight stream).  int4 halves that stream again — but NO pure-XLA
formulation achieves it (measured on the v5e):

  * ``bitcast_convert_type`` to ``jnp.int4`` is emulated: 5x SLOWER than
    int8 (16.9 vs 3.3 ms on the 1B forward).
  * shift-unpack + stack/reshape interleave materializes the unpacked
    weight per layer.
  * any concat/stack form that XLA does fuse into the dot operand reads
    each packed byte once PER NIBBLE — int8-parity traffic at best
    (measured 0.97 vs 0.80 ms on a 22-layer scan microbench).

This kernel DMAs each packed byte block HBM→VMEM exactly once, unpacks the
two zero-point-8 unsigned nibbles in-register (one mask + one shift on the
VPU — the unpack arithmetic, not the DMA, bounds the streaming rate; see
_kernel), and runs two MXU dots — one per output half
(ops/quant.Int4Tensor packs out-channel ``j`` and ``j + out/2`` into byte
``j``, so both dots write contiguous column ranges; no interleave
anywhere).  Measured in the 7B forward (M=16, S=1024): 10.8 ms/step vs
int8's 14.9 (0.72x) — the weight stream halves and the unpack overlaps it.

Scan-stacked weights: the model's layer loop is a ``lax.scan`` whose xs
slices would force an HBM copy of the packed block in front of a Pallas
custom call (XLA fuses dynamic-slice into dot operands, but not into custom
calls).  The kernel therefore takes the FULL stacked ``[L, in, out/2]``
array plus a scalar-prefetch layer index and block-indexes the L axis in
its BlockSpec index maps — the scan body passes the loop counter, and the
only HBM traffic is the kernel's own block DMAs.

Accumulation: f32 in the revisited output block (grid = (j, k) with the
contraction dimension k innermost/sequential); per-output-channel scales are
applied once at the last k step.  Output is [2, R, out/2] f32 — the caller
concatenates the halves (an [R, out] elementwise op XLA fuses onward) and
casts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accumulate(k, nk, o_ref, s_ref, ye, yo, bias):
    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[0, :, :] = o_ref[0, :, :] + (ye - bias)
    o_ref[1, :, :] = o_ref[1, :, :] + (yo - bias)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[0][:, None, :]


def _kernel_shift(l_ref, x_ref, p_ref, s_ref, o_ref):
    """x_ref: [R, bk] bf16; p_ref: [1, bk, bnh] uint8 (halves-packed);
    s_ref: [1, 2, bnh] f32; o_ref: [2, R, bnh] f32 (revisited over k)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    # Mosaic cannot legalize i8 vector shifts (arith.shli on vector<..xi8>);
    # unpack in i32.  The kernel is VPU-bound on this arithmetic (the DMA of
    # 0.5-byte weights is faster than the per-byte unpack), so nibbles are
    # stored UNSIGNED with zero-point 8 (ops/quant.quantize_weight4): the
    # unpack is one mask + one shift + two converts per byte, and the -8
    # bias becomes a rank-1 correction ``y -= 8·Σx`` folded into the
    # accumulator (sign-extending forms measured 410 GB/s effective on the
    # 7B stream; the mask/mul-subtract original 410, shift-pair 560,
    # zero-point 650+).
    p32 = p_ref[0].astype(jnp.int32)
    lo = (p32 & 15).astype(x_ref.dtype)
    hi = (p32 >> 4).astype(x_ref.dtype)
    x = x_ref[:]
    ye = jnp.dot(x, lo, preferred_element_type=jnp.float32)
    yo = jnp.dot(x, hi, preferred_element_type=jnp.float32)
    bias = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    _accumulate(k, nk, o_ref, s_ref, ye, yo, bias)


def _kernel_sum(l_ref, x_ref, p_ref, s_ref, o_ref):
    """Output-space hi-nibble recovery: byte p = lo + 16·hi exactly, and
    0..255 is exactly representable in bf16, so ``dot(x, p_bf16)`` equals
    ``dot(x, lo) + 16·dot(x, hi)`` up to f32 accumulation rounding — the
    hi half is ``(dot_p - dot_lo)/16`` computed on the [R, bnh] OUTPUT
    block.  Per-byte full-width work drops from 5 vector ops (v1: i32
    widen, mask, shift, two bf16 converts) to 4 (widen, one mask, two
    converts — Mosaic has no u8->bf16 cast, so the widen stays)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    p32 = p_ref[0].astype(jnp.int32)
    lof = (p32 & 15).astype(x_ref.dtype)
    pf = p32.astype(x_ref.dtype)
    x = x_ref[:]
    ye = jnp.dot(x, lof, preferred_element_type=jnp.float32)
    yp = jnp.dot(x, pf, preferred_element_type=jnp.float32)
    yo = (yp - ye) * 0.0625
    bias = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    _accumulate(k, nk, o_ref, s_ref, ye, yo, bias)


def _kernel_himask(l_ref, x_ref, p_ref, s_ref, o_ref):
    """Mask-only unpack: hi·16 = p & 0xF0 (the /16 rides the output block).
    Same op count as v1 unless Mosaic lowers masks cheaper than shifts."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    p32 = p_ref[0].astype(jnp.int32)
    lo = (p32 & 15).astype(x_ref.dtype)
    hi16 = (p32 & 0xF0).astype(x_ref.dtype)
    x = x_ref[:]
    ye = jnp.dot(x, lo, preferred_element_type=jnp.float32)
    yo = jnp.dot(x, hi16, preferred_element_type=jnp.float32) * 0.0625
    bias = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    _accumulate(k, nk, o_ref, s_ref, ye, yo, bias)


def _kernel_sum16(l_ref, x_ref, p_ref, s_ref, o_ref):
    """v2's output-space trick with the widen+mask in i16 (2-byte lanes pack
    2x the values per vreg of the i32 forms) — wins iff Mosaic legalizes
    u8->i16, i16 masks and i16->bf16 on this target."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    p16 = p_ref[0].astype(jnp.int16)
    lof = (p16 & jnp.int16(15)).astype(x_ref.dtype)
    pf = p16.astype(x_ref.dtype)
    x = x_ref[:]
    ye = jnp.dot(x, lof, preferred_element_type=jnp.float32)
    yp = jnp.dot(x, pf, preferred_element_type=jnp.float32)
    yo = (yp - ye) * 0.0625
    bias = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    _accumulate(k, nk, o_ref, s_ref, ye, yo, bias)


_KERNELS = {
    "v1-shift": _kernel_shift,
    "v2-sum": _kernel_sum,
    "v3-himask": _kernel_himask,
    "v4-sum16": _kernel_sum16,
}

# v2-sum is fastest on the v5e: 11% on the isolated 7B gate-matmul stream,
# ~1.6% on the full 7B forward (11.01 vs 11.19 ms/step) — the unpack is no
# longer the step bottleneck once the output-space form removes one wide op
# (scripts/profile_int4_kernel.py / profile_int4.py --variants).
DEFAULT_VARIANT = "v2-sum"


def _pick_bk(in_dim: int, block_k: int) -> int:
    bk = block_k
    while bk >= 256:
        if in_dim % bk == 0:
            return bk
        bk //= 2
    raise ValueError(f"int4_matmul: contraction dim {in_dim} must be a "
                     "multiple of 256")


@functools.partial(jax.jit,
                   static_argnames=("block_n", "block_k", "interpret",
                                    "variant"))
def _int4_matmul_stacked(x2: jax.Array, packed: jax.Array, scale2: jax.Array,
                         layer: jax.Array, *, block_n: int = 1024,
                         block_k: int = 2048, interpret: bool = False,
                         variant: str = DEFAULT_VARIANT):
    """x2: [R, in] bf16; packed: [L, in, outh] uint8; scale2: [L, 2, outh]
    f32; layer: int32 scalar.  Returns [2, R, outh] f32."""
    R, IN = x2.shape
    L, _, OUTH = packed.shape
    bk = _pick_bk(IN, block_k)
    bn = min(block_n, OUTH)

    # Scoped-VMEM guard: Mosaic's kernel stack is 16 MB.  Empirical model
    # from compiler OOM reports (r05): scoped ≈ 6.75 bytes per packed-block
    # byte (u8 block + i32 widen + two full-width bf16 unpack forms, double
    # buffered) + R·(2·bk + 12·bn) for the x block, the [2, R, bn] f32
    # accumulator and the two [R, bn] partial sums.  At the serving shapes
    # R = B·M = 192 the old packed-only clamp left the lm_head call 0.5-1.8
    # MB over the limit (BENCH r05 dev run) — batched int4 engines OOMed at
    # compile.  Shrink bn first: splitting the parallel j axis is
    # numerics-neutral (the k accumulation order per output element is set
    # by bk alone), so engines and oracles at different R stay comparable.
    # (model fitted on the two r05 OOM reports — 1B R=192: 16.48 MB, 7B
    # R=192: 17.84 MB — and the known-good R∈{8,16,60} compiles; it keeps
    # every previously-shipped single-stream shape unchanged)
    def scoped_est(bk, bn):
        return 27 * bk * bn // 4 + R * (2 * IN + 12 * bn)

    budget = 15_728_640   # 15.5 MB: 0.5 MB margin under the 16 MB stack
    while scoped_est(bk, bn) > budget and bn > 128:
        bn //= 2
    while scoped_est(bk, bn) > budget and bk > 256 and IN % (bk // 2) == 0:
        bk //= 2
    grid = (pl.cdiv(OUTH, bn), IN // bk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, bk), lambda j, k, l: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda j, k, l: (l[0], k, j)),
            pl.BlockSpec((1, 2, bn), lambda j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((2, R, bn), lambda j, k, l: (0, 0, j)),
    )
    return pl.pallas_call(
        _KERNELS[variant],
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, R, OUTH), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * 2 * OUTH,
            bytes_accessed=IN * OUTH + 2 * R * OUTH * 4 + R * IN * 2,
            transcendentals=0),
        interpret=interpret,
    )(jnp.reshape(layer.astype(jnp.int32), (1,)), x2, packed, scale2)


def int4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array,
                layer=None, *, out_dtype=None, block_n: int = 1024,
                block_k: int = 2048, interpret: bool = False,
                variant: str = DEFAULT_VARIANT) -> jax.Array:
    """``x @ dequant(int4)`` with true 0.5-byte/weight HBM streaming.

    Args:
      x:      [..., in] activations (bf16/f32)
      packed: [in, out/2] uint8 or stacked [L, in, out/2] (then ``layer``
              selects the layer; the full array is passed and the kernel
              block-indexes L — no per-layer copy)
      scale:  [out] f32 (or [L, out])
      layer:  int32 scalar index when packed is stacked
      out_dtype: result dtype (default: x.dtype)

    Returns [..., out].
    """
    if packed.ndim == 2:
        packed = packed[None]
        scale = scale[None]
        layer = jnp.int32(0)
    assert packed.ndim == 3 and layer is not None
    L, IN, OUTH = packed.shape
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, IN)
    scale2 = scale.reshape(L, 2, OUTH)
    y2 = _int4_matmul_stacked(x2, packed, scale2, layer, block_n=block_n,
                              block_k=block_k, interpret=interpret,
                              variant=variant)
    y = jnp.concatenate([y2[0], y2[1]], axis=-1)
    return y.reshape(*lead, 2 * OUTH).astype(out_dtype or x.dtype)


def int4_matmul_tp(mesh, x: jax.Array, packed: jax.Array, scale: jax.Array,
                   layer=None, *, axis: str = "tp", out_dtype=None,
                   block_n: int = 1024, block_k: int = 2048,
                   interpret: bool = False,
                   variant: str = DEFAULT_VARIANT) -> jax.Array:
    """Tensor-parallel ``int4_matmul``: explicit shard_map partition of the
    Pallas kernel over the out-halves axis.

    A ``pallas_call`` is an unpartitioned custom call — GSPMD cannot split
    it, so under a tp mesh it either runs replicated (the composition
    ``parallel.shard_params`` chooses for Int4Tensor weights: correct,
    parity-tested, but each chip streams the FULL packed array) or, if the
    packed operand is tp-sharded, gets an all-gather inserted in front of
    it every step (worse).  This wrapper is the per-shard-streaming form:
    ``packed [L, in, out/2]`` sharded on its last axis over ``axis``, each
    device runs the kernel on its own column slab (halves layout keeps
    both nibbles of a byte inside one shard), and the [..., out] result is
    column-sharded with no collectives — the downstream row-parallel
    matmul's psum is where GSPMD reduces, exactly like the int8 megatron
    split.

    Args mirror ``int4_matmul`` plus ``mesh``/``axis``.  ``scale [.., out]``
    may be replicated or sharded consistently ([2·shard] halves per
    device); it is reshaped to halves-major [.., 2, out/2] and sharded on
    the trailing axis inside."""
    if packed.ndim == 2:
        packed = packed[None]
        scale = scale[None]
        layer = jnp.int32(0)
    L, IN, OUTH = packed.shape
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, IN)
    scale3 = scale.reshape(L, 2, OUTH)
    P = jax.sharding.PartitionSpec

    def local(x2, packed, scale3, layer):
        y = _int4_matmul_stacked(x2, packed, scale3, layer,
                                 block_n=block_n, block_k=block_k,
                                 interpret=interpret, variant=variant)
        return y  # [2, R, OUTH/shards]

    y2 = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P(None, None, axis), P()),
        out_specs=P(None, None, axis), check_vma=False,
    )(x2, packed, scale3, jnp.reshape(jnp.asarray(layer, jnp.int32), ()))
    y = jnp.concatenate([y2[0], y2[1]], axis=-1)
    return y.reshape(*lead, 2 * OUTH).astype(out_dtype or x.dtype)
