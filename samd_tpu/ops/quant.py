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
    return x @ w


def dequant(w: Union[jax.Array, QuantizedTensor], dtype) -> jax.Array:
    """Pre-dequant form for non-matmul consumers (expert einsums): returns
    ``q · scale`` with the quantized contraction axis (-2) re-expanded, so
    XLA fuses the cast+scale into the consuming contraction's weight-operand
    load exactly as qmatmul's form does.  Plain arrays pass through."""
    if isinstance(w, QuantizedTensor):
        return w.q.astype(dtype) * w.scale[..., None, :].astype(dtype)
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
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        layers[name] = quantize_weight(layers[name], axis=-2, dtype=dtype)
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"], axis=-2,
                                         dtype=dtype)
    return out


def quantize_eagle_params(params: dict, *, dtype=jnp.int8) -> dict:
    """Quantize an EAGLE draft-net param dict (drafters.eagle.net): the
    expansion loop runs the net ``depth`` times per decode step, so its
    weight streaming is paid depth-fold — halving it matters as much as the
    target model's.  fc_b and mlp_norm stay high precision."""
    out = dict(params)
    for name in ("fc_w", "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        out[name] = quantize_weight(params[name], axis=-2, dtype=dtype)
    return out


def quantized_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
