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
two nibbles in-register (two sign-extending shifts on the VPU), and runs two
MXU dots — one per output half (ops/quant.Int4Tensor packs out-channel ``j``
and ``j + out/2`` into byte ``j``, so both dots write contiguous column
ranges; no interleave anywhere).

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


def _kernel(l_ref, x_ref, p_ref, s_ref, o_ref):
    """x_ref: [R, bk] bf16; p_ref: [1, bk, bnh] uint8 (halves-packed);
    s_ref: [1, 2, bnh] f32; o_ref: [2, R, bnh] f32 (revisited over k)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    # Mosaic cannot legalize i8 vector shifts (arith.shli on vector<..xi8>);
    # unpack in i32 with mask / logical-shift / mul-subtract sign extension.
    p32 = p_ref[0].astype(jnp.int32)
    lo4 = p32 & 15
    hi4 = p32 >> 4                      # p32 >= 0: logical shift
    lo = (lo4 - 2 * (lo4 & 8)).astype(x_ref.dtype)
    hi = (hi4 - 2 * (hi4 & 8)).astype(x_ref.dtype)
    x = x_ref[:]
    ye = jnp.dot(x, lo, preferred_element_type=jnp.float32)
    yo = jnp.dot(x, hi, preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[0, :, :] = o_ref[0, :, :] + ye
    o_ref[1, :, :] = o_ref[1, :, :] + yo

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[0][:, None, :]


def _pick_bk(in_dim: int) -> int:
    for bk in (512, 256):
        if in_dim % bk == 0:
            return bk
    raise ValueError(f"int4_matmul: contraction dim {in_dim} must be a "
                     "multiple of 256")


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _int4_matmul_stacked(x2: jax.Array, packed: jax.Array, scale2: jax.Array,
                         layer: jax.Array, *, block_n: int = 512,
                         interpret: bool = False):
    """x2: [R, in] bf16; packed: [L, in, outh] uint8; scale2: [L, 2, outh]
    f32; layer: int32 scalar.  Returns [2, R, outh] f32."""
    R, IN = x2.shape
    L, _, OUTH = packed.shape
    bk = _pick_bk(IN)
    bn = min(block_n, OUTH)
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
        _kernel,
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
                layer=None, *, out_dtype=None,
                interpret: bool = False) -> jax.Array:
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
    y2 = _int4_matmul_stacked(x2, packed, scale2, layer,
                              interpret=interpret)
    y = jnp.concatenate([y2[0], y2[1]], axis=-1)
    return y.reshape(*lead, 2 * OUTH).astype(out_dtype or x.dtype)
