"""Weight-only quantization for serving (INT8 per-channel symmetric).

The reference serves fp16 only (SURVEY.md §2.5); the BASELINE north star asks
for INT8/FP8 weight-only matmuls so weights+cache fit more chips-worth of
model per host.  Design:

  * Weights quantize per output channel: ``q[in, out] int8``,
    ``scale[out] f32``; activations stay bf16.  At matmul time XLA fuses the
    int8→bf16 convert into the dot, so HBM weight traffic halves — on
    memory-bound decode steps that is the dominant cost.
  * A ``QuantizedTensor`` pytree stands in for the weight array; the model's
    matmul helper dispatches on it, so one forward serves both precisions
    (and scan-stacked layers quantize along the leading axis transparently).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """int8 values + per-output-channel scales for a [in, out]-style weight
    (optionally with leading stacked-layer axes)."""

    q: jax.Array       # int8, same shape as the original weight
    scale: jax.Array   # f32, original shape minus the contraction axis

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape


def quantize_weight(w: jax.Array, *, axis: int = -2,
                    dtype=jnp.int8) -> QuantizedTensor:
    """Symmetric per-channel quantization; `axis` is the contraction
    (input-feature) axis reduced when computing scales.

    dtype: ``jnp.int8`` (default) or an fp8 dtype (``jnp.float8_e4m3fn`` /
    ``jnp.float8_e5m2``) — fp8 keeps more dynamic range per channel at the
    same 1 byte/weight."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    if dtype == jnp.int8:
        scale = amax / 127.0
        q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127
                     ).astype(jnp.int8)
    else:
        fp8_max = float(jnp.finfo(dtype).max)
        scale = amax / fp8_max
        q = jnp.clip(wf / jnp.maximum(scale, 1e-12), -fp8_max, fp8_max
                     ).astype(dtype)
    return QuantizedTensor(q=q, scale=jnp.squeeze(scale, axis=axis))


@jax.tree_util.register_pytree_node_class
@dataclass
class Int4Tensor:
    """Packed int4 values (two nibbles per uint8 byte) + per-output-channel
    scales.

    The tunneled-TPU platform cannot transfer S4 arrays at all (axon-plugin
    recursion, docs/PERFORMANCE.md "Measured dead ends"), so int4 weights
    live as ``uint8 [..., in, out/2]`` in the param tree and are unpacked
    INSIDE the jitted forward — no S4 value ever crosses the host↔device
    boundary.  Packing runs along the *output* axis in HALVES layout: byte
    ``[..., i, j]`` holds out-channel ``j`` in the low nibble and
    ``j + out/2`` in the high nibble (each nibble UNSIGNED with zero-point
    8 — see quantize_weight4), so the unpack is one mask + one shift and a
    trailing-axis concat (no interleave/transpose anywhere), and the Pallas
    kernel (ops/int4_matmul.py) computes the two output halves as two
    contiguous dots from ONE streamed byte block — true 0.5 bytes/weight
    HBM traffic.  (Measured XLA-only alternatives all
    fail to halve the stream: ``bitcast_convert_type`` to jnp.int4 is
    emulated ~5x slower, an interleaving stack+reshape materializes the
    unpacked weight, and any concat/stack operand fusion reads the packed
    byte once PER NIBBLE — int8-parity traffic at best.)
    """

    packed: jax.Array  # uint8 [..., in, out//2]
    scale: jax.Array   # f32   [..., out]

    def tree_flatten(self):
        return (self.packed, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.packed.shape[:-1] + (self.packed.shape[-1] * 2,)


def quantize_weight4(w: jax.Array, *, axis: int = -2) -> Int4Tensor:
    """Symmetric per-output-channel int4 quantization ([-7, 7]) with
    halves-layout nibble-packing along the output axis; `axis` is the
    contraction axis reduced for the scales (same convention as
    quantize_weight)."""
    assert axis in (-2, w.ndim - 2), "int4 packs along the output (-1) axis"
    assert w.shape[-1] % 2 == 0, "output dim must be even for nibble packing"
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = amax / 7.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -7, 7
                 ).astype(jnp.int32)
    # Nibbles are stored UNSIGNED with zero-point 8 (u = q + 8 in [1, 15]):
    # the kernel's unpack is then shift+mask+convert only (2 VPU ops per
    # byte) and the -8 bias folds into a rank-1 correction
    # (y -= 8·Σx · scale) — the unpack arithmetic is what bounds the
    # kernel's streaming rate (ops/int4_matmul.py).
    half = w.shape[-1] // 2
    lo = (q[..., :half] + 8) & 0xF
    hi = (q[..., half:] + 8) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return Int4Tensor(packed=packed, scale=jnp.squeeze(scale, axis=axis))


def _deq4(w: Int4Tensor, dtype) -> jax.Array:
    """Pre-dequant XLA form for Int4Tensor: unpack the two zero-point-8
    UNSIGNED nibbles (mask / shift, then subtract 8 — matching
    quantize_weight4's packing) and concat the halves on the trailing axis
    (halves layout — no interleave).  This is the
    fallback for consumers the Pallas kernel doesn't serve (CPU tests, MoE
    expert einsums); its dot-operand fusion reads each byte once per nibble,
    i.e. int8-parity HBM traffic at half the at-rest footprint.  The hot
    path is ops/int4_matmul.int4_matmul."""
    pi = w.packed.astype(jnp.int32)
    lo = (pi & 15) - 8                        # zero-point-8 unsigned nibbles
    hi = (pi >> 4) - 8
    unpacked = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
    return unpacked.astype(dtype) * w.scale[..., None, :].astype(dtype)


def qmatmul(x: jax.Array, w: Union[jax.Array, QuantizedTensor]) -> jax.Array:
    """x @ w with transparent weight-only dequantization.

    The dequant is applied to the *weight* before the dot
    (``x @ (q·scale)``) rather than scaling the product afterwards: XLA
    fuses the cast+scale into the dot's weight-operand load, so the loop
    streams 1-byte weights from HBM.  The scale-after form
    (``dot(x, cast(q)) · scale`` with f32 accumulation) compiles to a
    program measured 23% slower on the 1B forward (3.97 vs 3.23 ms,
    TPU v5e) — the epilogue multiply blocks the operand fusion.
    """
    if isinstance(w, QuantizedTensor):
        return x @ (w.q.astype(x.dtype) * w.scale.astype(x.dtype))
    if isinstance(w, Int4Tensor):
        return x @ _deq4(w, x.dtype)
    return x @ w


def dequant(w: Union[jax.Array, QuantizedTensor], dtype) -> jax.Array:
    """Pre-dequant form for non-matmul consumers (expert einsums): returns
    ``q · scale`` with the quantized contraction axis (-2) re-expanded, so
    XLA fuses the cast+scale into the consuming contraction's weight-operand
    load exactly as qmatmul's form does.  Plain arrays pass through."""
    if isinstance(w, QuantizedTensor):
        return w.q.astype(dtype) * w.scale[..., None, :].astype(dtype)
    if isinstance(w, Int4Tensor):
        return _deq4(w, dtype)
    return w


def quantize_llama_params(params: dict, *, dtype=jnp.int8) -> dict:
    """Quantize the large projection matrices of a samd_tpu Llama param
    pytree (embed and norms stay high precision).  Works on scan-stacked
    layers: weights are [L, in, out], scales become [L, out].
    ``dtype=jnp.float8_e4m3fn`` selects fp8 weight-only."""
    out = dict(params)
    layers = dict(params["layers"])
    # MoE expert stacks [L, E, in, out] quantize along the same -2
    # contraction axis (scales [L, E, out]); router and biases stay high
    # precision like the norms.
    quant = (quantize_weight4 if dtype == jnp.int4
             else lambda w, axis=-2: quantize_weight(w, axis=axis,
                                                     dtype=dtype))
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        layers[name] = quant(layers[name], axis=-2)
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"], axis=-2)
    return out


def init_quantized_llama_params(cfg, key, *, scale: float = 0.02,
                                dtype=jnp.int8) -> dict:
    if dtype == jnp.int4:
        return _init_int4_llama_params(cfg, key, scale=scale)
    return _init_quantized_llama_params(cfg, key, scale=scale, dtype=dtype)


def _init_quantized_llama_params(cfg, key, *, scale: float = 0.02,
                                 dtype=jnp.int8) -> dict:
    """Random parameter pytree built DIRECTLY in 1-byte form — for
    random-weight benches of models whose bf16 form would not fit a single
    chip's HBM (7B-class on one 16 GB v5e: 13.5 GB bf16 vs 6.8 GB int8).
    ``init_params`` + ``quantize_llama_params`` would materialize the bf16
    tree first; this never does.

    Projection weights are uniform int8 · a per-channel constant chosen so
    the dequantized std ≈ ``scale`` (matching init_params' normal init
    scale); embed and norms stay in cfg.dtype.  Mechanics benches only —
    real checkpoints go through models.loader + quantize_llama_params."""
    import numpy as np

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 12)
    s = scale * np.sqrt(3.0) / 127.0   # uniform[-127,127]·s has std≈scale

    def qrand(k, shape):
        q = jax.random.randint(k, shape, -127, 128, dtype=jnp.int8)
        return QuantizedTensor(q=q, scale=jnp.full(shape[:-2] + shape[-1:],
                                                   s, jnp.float32))

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    params = {
        "embed": norm(keys[0], (cfg.vocab_size, H)),
        "layers": {
            "attn_norm": jnp.ones((L, H), cfg.dtype),
            "wq": qrand(keys[1], (L, H, NH * D)),
            "wk": qrand(keys[2], (L, H, KH * D)),
            "wv": qrand(keys[3], (L, H, KH * D)),
            "wo": qrand(keys[4], (L, NH * D, H)),
            "mlp_norm": jnp.ones((L, H), cfg.dtype),
            "w_gate": qrand(keys[5], (L, H, I)),
            "w_up": qrand(keys[6], (L, H, I)),
            "w_down": qrand(keys[7], (L, I, H)),
        },
        "final_norm": jnp.ones((H,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = qrand(keys[8], (H, cfg.vocab_size))
    return params


def _init_int4_llama_params(cfg, key, *, scale: float = 0.02) -> dict:
    """int4 sibling of the random 1-byte init: packed uint8 bytes generated
    directly on device (two uniform [-8, 7] nibbles per byte, std ≈ 4.61),
    per-channel constant scales matching init_params' normal-init std.  The
    7B int4 projection tree is ~3.3 GB — half the int8 one."""
    import numpy as np

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 12)
    s = scale / float(np.sqrt((16 ** 2 - 1) / 12.0))  # nibble std ≈ 4.61

    def qrand(k, shape):
        packed = jax.random.randint(k, shape[:-1] + (shape[-1] // 2,),
                                    0, 256, dtype=jnp.uint8)
        return Int4Tensor(packed=packed,
                          scale=jnp.full(shape[:-2] + shape[-1:], s,
                                         jnp.float32))

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    params = {
        "embed": norm(keys[0], (cfg.vocab_size, H)),
        "layers": {
            "attn_norm": jnp.ones((L, H), cfg.dtype),
            "wq": qrand(keys[1], (L, H, NH * D)),
            "wk": qrand(keys[2], (L, H, KH * D)),
            "wv": qrand(keys[3], (L, H, KH * D)),
            "wo": qrand(keys[4], (L, NH * D, H)),
            "mlp_norm": jnp.ones((L, H), cfg.dtype),
            "w_gate": qrand(keys[5], (L, H, I)),
            "w_up": qrand(keys[6], (L, H, I)),
            "w_down": qrand(keys[7], (L, I, H)),
        },
        "final_norm": jnp.ones((H,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = qrand(keys[8], (H, cfg.vocab_size))
    return params


def int4_requant_from_int8_init(cfg, key, *, scale: float = 0.02,
                                layer_chunk: int = 0) -> dict:
    """Packed-int4 params quantized from the SAME base weights as
    ``_init_quantized_llama_params(cfg, key, scale)`` — the apples-to-apples
    7B int4-vs-int8 bench path (VERDICT r4 #4: the previous int4 7B row was
    a fresh random init, a different model whose degenerate outputs made
    accept/equality columns incomparable).

    The int8 init draws ``q ~ randint(-127, 128)`` per projection with a
    constant per-channel scale; this REGENERATES those exact draws (same
    threefry keys, same backend as the int8 row — on the TPU in the bench,
    on CPU in tests, so no cross-backend PRNG assumption), dequantizes in
    f32 and re-quantizes to the packed int4 format (quantize_weight4's
    formula: per-out-channel amax/7 scales, zero-point-8 nibbles, halves
    layout).  One tensor at a time with a ``lax.map`` over the layer axis,
    so the peak footprint is the int8 source tensor + its packed result —
    never a wide bf16 tree, and never a multi-GB host↔device transfer
    through the tunnel.  Embed/norms regenerate bitwise-identically.

    Returns ``(params, base_checks)``: ``base_checks[name]`` is a tiny
    ``q[..0, :2, :64]`` slice of the regenerated int8 base; comparing it
    against the int8 row's device tree proves both rows share base weights
    (bench.py does).

    ``layer_chunk > 0`` draws the int8 base in leading-axis chunks of that
    many layers (per-chunk ``fold_in`` keys): ``jax.random.randint``
    materializes a u32 bits tensor the full size of the draw — 11.3 GB for
    the 13B w_gate, an HBM OOM next to anything (r05).  Chunked draws are
    the SAME distribution but NOT bitwise the int8 init, so use it only
    where no int8 row exists to compare against (the 13B single-chip
    row)."""
    import numpy as np

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    s8 = float(scale * np.sqrt(3.0) / 127.0)
    keys = jax.random.split(key, 12)

    @jax.jit
    def _requant_stack(q8):
        """[Lx, in, out] int8 -> (packed uint8 [Lx, in, out/2],
        scale f32 [Lx, out]); lax.map keeps the f32 temporaries to one
        layer slice."""
        half = q8.shape[-1] // 2

        def one(q):
            w = q.astype(jnp.float32) * s8
            amax = jnp.max(jnp.abs(w), axis=0)
            sc = jnp.maximum(amax / 7.0, 1e-12)
            q4 = jnp.clip(jnp.round(w / sc), -7, 7).astype(jnp.int32)
            lo = (q4[:, :half] + 8) & 0xF
            hi = (q4[:, half:] + 8) & 0xF
            return (lo | (hi << 4)).astype(jnp.uint8), sc

        return jax.lax.map(one, q8)

    def requant(k, shape):
        lead = shape[:-2]
        if layer_chunk and lead:
            L_axis = int(np.prod(lead))
            packs, scales, check = [], [], None
            for lo in range(0, L_axis, layer_chunk):
                hi = min(lo + layer_chunk, L_axis)
                q8 = jax.random.randint(
                    jax.random.fold_in(k, lo),
                    (hi - lo,) + shape[-2:], -127, 128, dtype=jnp.int8)
                pk, sc = _requant_stack(q8)
                if check is None:
                    check = np.asarray(q8[0, :2, :64])
                del q8
                packs.append(pk)
                scales.append(sc)
            packed = jnp.concatenate(packs, axis=0)
            scale4 = jnp.concatenate(scales, axis=0)
        else:
            q8 = jax.random.randint(k, shape, -127, 128, dtype=jnp.int8)
            q8v = q8.reshape((-1,) + shape[-2:])
            packed, scale4 = _requant_stack(q8v)
            check = np.asarray(q8v[0, :2, :64])
            del q8, q8v
        return Int4Tensor(
            packed=packed.reshape(lead + (shape[-2], shape[-1] // 2)),
            scale=scale4.reshape(lead + (shape[-1],))), check

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    tensors = {}
    checks = {}
    for idx, name, shape in (
        (1, "wq", (L, H, NH * D)), (2, "wk", (L, H, KH * D)),
        (3, "wv", (L, H, KH * D)), (4, "wo", (L, NH * D, H)),
        (5, "w_gate", (L, H, I)), (6, "w_up", (L, H, I)),
        (7, "w_down", (L, I, H)),
    ):
        tensors[name], checks[name] = requant(keys[idx], shape)
    params = {
        "embed": norm(keys[0], (cfg.vocab_size, H)),
        "layers": {
            "attn_norm": jnp.ones((L, H), cfg.dtype),
            "mlp_norm": jnp.ones((L, H), cfg.dtype),
            **tensors,
        },
        "final_norm": jnp.ones((H,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"], checks["lm_head"] = requant(
            keys[8], (H, cfg.vocab_size))
    return params, checks


def quantize_eagle_params(params: dict, *, dtype=jnp.int8) -> dict:
    """Quantize an EAGLE draft-net param dict (drafters.eagle.net): the
    expansion loop runs the net ``depth`` times per decode step, so its
    weight streaming is paid depth-fold — halving it matters as much as the
    target model's.  fc_b and mlp_norm stay high precision."""
    out = dict(params)
    quant = (quantize_weight4 if dtype == jnp.int4
             else lambda w, axis=-2: quantize_weight(w, axis=axis,
                                                     dtype=dtype))
    for name in ("fc_w", "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        out[name] = quant(params[name], axis=-2)
    return out


def quantized_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
