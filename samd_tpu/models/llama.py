"""Functional JAX Llama for speculative decoding.

Design (TPU-first, not a port):
  * Pure functions over an explicit parameter pytree; no framework modules.
    Layer parameters are stacked along a leading axis and the forward uses
    ``lax.scan``, so compile time is O(1) in depth.
  * ONE forward serves prefill, autoregressive decode, sequence-draft verify
    and tree-draft verify — callers only vary ``position_ids`` and the
    attention mask.  The reference instead monkey-patches HF Llama and splices
    a tree mask by mutating shared state
    (/root/reference/samd/model_patch/llama.py:94-96); here the mask is an
    ordinary traced argument of a single jitted step.
  * KV cache is written in-place (donated buffers) at a dynamic offset with
    static block sizes, so XLA performs true in-place updates.
  * Weights live in ``cfg.dtype`` (bf16 on TPU); normalization statistics and
    attention softmax run in fp32; logits accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import qmatmul
from .configs import ModelConfig

Params = Dict[str, object]


# ----------------------------------------------------------------------
# Initialization
# ----------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, *, scale: float = 0.02) -> Params:
    """Random-normal initialized parameter pytree (benchmarks/tests; real
    checkpoints come from samd_tpu.models.loader)."""
    keys = jax.random.split(key, 13)
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    E = cfg.num_experts
    if E:
        mlp = {
            "router": norm(keys[9], (L, H, E)),
            "w_gate": norm(keys[5], (L, E, H, I)),
            "w_up": norm(keys[6], (L, E, H, I)),
            "w_down": norm(keys[7], (L, E, I, H)),
        }
    else:
        mlp = {
            "w_gate": norm(keys[5], (L, H, I)),
            "w_up": norm(keys[6], (L, H, I)),
            "w_down": norm(keys[7], (L, I, H)),
        }
    params: Params = {
        "embed": norm(keys[0], (cfg.vocab_size, H)),
        "layers": {
            "attn_norm": jnp.ones((L, H), cfg.dtype),
            "wq": norm(keys[1], (L, H, NH * D)),
            "wk": norm(keys[2], (L, H, KH * D)),
            "wv": norm(keys[3], (L, H, KH * D)),
            "wo": norm(keys[4], (L, NH * D, H)),
            "mlp_norm": jnp.ones((L, H), cfg.dtype),
            **mlp,
        },
        "final_norm": jnp.ones((H,), cfg.dtype),
    }
    if cfg.attn_bias:
        params["layers"]["bq"] = norm(keys[10], (L, NH * D))
        params["layers"]["bk"] = norm(keys[11], (L, KH * D))
        params["layers"]["bv"] = norm(keys[12], (L, KH * D))
    if not cfg.tie_embeddings:
        params["lm_head"] = norm(keys[8], (H, cfg.vocab_size))
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ----------------------------------------------------------------------
# Building blocks
# ----------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return weight * normed.astype(dtype)


def rope_tables(position_ids: jax.Array, head_dim: int,
                theta: float) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [B, T, head_dim] (half-split convention)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [B,T,D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)              # [B,T,D]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, heads, head_dim]; cos/sin: [B, T, head_dim]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _attention(q: jax.Array, k, v, mask: jax.Array,
               cfg: ModelConfig) -> jax.Array:
    """q: [B,T,NH,D]; k,v: [B,KH,S,D] ("sd") or [B,KH,D,S] ("ds"), plain or
    QuantizedKV (int8 cache — dequant fuses into the score/context dots);
    mask: [B,T,S] bool -> [B,T,NH*D]."""
    from ..cache import dequantize_kv

    B, T = q.shape[0], q.shape[1]
    KH, G, D = cfg.num_kv_heads, cfg.kv_groups, cfg.head_dim
    ds = getattr(cfg, "kv_layout", "sd") == "ds"
    k = dequantize_kv(k, q.dtype, ds_layout=ds)
    v = dequantize_kv(v, q.dtype, ds_layout=ds)
    qg = q.reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)  # [B,KH,G,T,D]
    scores = jnp.einsum("bkgtd,bkds->bkgts" if ds else "bkgtd,bksd->bkgts",
                        qg, k, preferred_element_type=jnp.float32)
    scores = scores * (D ** -0.5)
    bias = jnp.where(mask[:, None, None, :, :], 0.0, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores + bias, axis=-1)
    out = jnp.einsum("bkgts,bkds->bkgtd" if ds else "bkgts,bksd->bkgtd",
                     probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, KH * G * D)


def _moe_mlp(x: jax.Array, lp: Dict, cfg: ModelConfig) -> jax.Array:
    """Mixtral-style sparse-MoE MLP with HF routing semantics (softmax over
    all experts → top-k → renormalize; reference's vendored
    modeling_mixtral_kv.py MixtralSparseMoeBlock) computed DENSELY over the
    expert axis.

    TPU-first rationale: decode/verify blocks are short (T ≤ M ≈ 64), so
    with top-2-of-8 routing essentially every expert is selected by some
    token — all expert weights must stream from HBM regardless, and the
    step is memory-bound.  Token gather/scatter routing (the GPU pattern)
    would introduce dynamic shapes XLA can't tile; one einsum over the
    expert axis keeps the MXU busy, fuses the routing-weight multiply, and
    lets GSPMD shard experts over an "ep" mesh axis (the weighted
    combine's expert contraction becomes one psum over ep)."""
    from ..ops.quant import dequant

    E, k = cfg.num_experts, cfg.num_experts_per_tok
    router = jnp.einsum("bth,he->bte", x.astype(jnp.float32),
                        lp["router"].astype(jnp.float32))
    probs = jax.nn.softmax(router, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    wts = jnp.sum(jax.nn.one_hot(topi, E, dtype=jnp.float32)
                  * topv[..., None], axis=-2)                      # [B,T,E]
    g = jnp.einsum("bth,ehi->beti", x, dequant(lp["w_gate"], x.dtype))
    u = jnp.einsum("bth,ehi->beti", x, dequant(lp["w_up"], x.dtype))
    d = jnp.einsum("beti,eih->beth", jax.nn.silu(g) * u,
                   dequant(lp["w_down"], x.dtype))
    return jnp.einsum("beth,bte->bth", d, wts.astype(x.dtype))


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------

def forward(params: Params, cfg: ModelConfig, tokens: jax.Array,
            position_ids: jax.Array, kv_k: jax.Array, kv_v: jax.Array,
            write_offset: jax.Array, attn_mask: jax.Array, *,
            paged=None,
            ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One forward pass writing the block's KV into the cache.

    Args:
      tokens:       [B, T] int32
      position_ids: [B, T] int32 (RoPE positions)
      kv_k, kv_v:   [L, B, KH, S, D] cache (donated by jitted callers), or
                    ``paged_kv.PagedKV`` page pools in paged mode
      write_offset: scalar int32, or [B] int32 for per-request offsets
                    (continuous batching) — cache slot of the block's first
                    token
      attn_mask:    [B, T, S] bool — True where attention is allowed; callers
                    must allow the block's own freshly-written slots
                    [offset, offset+T) per their draft-tree structure.  In
                    paged mode this is the [B, T, W·page] boundary window
                    from ops.paged_attention.boundary_mask_window instead.
      paged:        ``paged_kv.PagedAux(tables, scratch_page, interpret)``
                    — switches the KV backend to the shared page pool: the
                    SAME trunk (quantized weights, Qwen2 bias, MoE) then
                    scatters fresh KV into pages and attends through the
                    page-table-consuming Pallas kernel.  kv_k/kv_v must be
                    PagedKV; write_offset must be [B].

    Returns: (logits [B,T,V] fp32, hidden [B,T,H], kv_k, kv_v).
    The pre-head hidden states are returned for EAGLE-style drafters
    (reference plumbs them via a patched forward,
    /root/reference/samd/model_patch/llama.py:114-204).
    """
    B, T = tokens.shape
    H, D = cfg.hidden_size, cfg.head_dim
    NH, KH = cfg.num_heads, cfg.num_kv_heads

    h = params["embed"][tokens]  # [B,T,H] in cfg.dtype
    cos, sin = rope_tables(position_ids, D, cfg.rope_theta)

    write_offset = jnp.asarray(write_offset)
    ds_layout = getattr(cfg, "kv_layout", "sd") == "ds"
    if paged is not None:
        from ..ops.paged_attention import paged_block_attention
        from ..paged_kv import paged_flat_indices, paged_write_block

        assert write_offset.ndim == 1, "paged mode needs per-slot offsets"
        page = kv_k.page_size
        flat_pg, flat_sl = paged_flat_indices(
            paged.tables, write_offset, T, page, paged.scratch_page)

        def write_kv(cache, block):       # block [B, KH, T, D]
            return paged_write_block(cache, block, flat_pg, flat_sl)

        def attend(q, k_cache, v_cache):
            return paged_block_attention(
                q, k_cache.pool, v_cache.pool, paged.tables, attn_mask,
                write_offset + T, k_scale=k_cache.scale,
                v_scale=v_cache.scale, interpret=paged.interpret)
    elif write_offset.ndim == 0:
        if ds_layout:
            def write_kv(cache, block):  # cache [B,KH,D,S], blk [B,KH,T,D]
                return jax.lax.dynamic_update_slice(
                    cache, block.transpose(0, 1, 3, 2),
                    (0, 0, 0, write_offset))
        else:
            def write_kv(cache, block):  # cache [B,KH,S,D], blk [B,KH,T,D]
                return jax.lax.dynamic_update_slice(
                    cache, block, (0, 0, write_offset, 0))
    else:
        if ds_layout:
            def write_kv(cache, block):
                return jax.vmap(
                    lambda c, u, o: jax.lax.dynamic_update_slice(
                        c, u.transpose(0, 2, 1), (0, 0, o))
                )(cache, block, write_offset)
        else:
            def write_kv(cache, block):
                return jax.vmap(
                    lambda c, u, o: jax.lax.dynamic_update_slice(
                        c, u, (0, o, 0))
                )(cache, block, write_offset)

    from ..cache import QuantizedKV, quantize_kv_block

    if write_offset.ndim == 0:
        def write_scale(cache_s, sc):      # cache_s [B,KH,S], sc [B,KH,T]
            return jax.lax.dynamic_update_slice(cache_s, sc,
                                                (0, 0, write_offset))
    else:
        def write_scale(cache_s, sc):
            return jax.vmap(
                lambda c, u, o: jax.lax.dynamic_update_slice(c, u, (0, o))
            )(cache_s, sc, write_offset)

    def write_kv_any(cache, block):
        if isinstance(cache, QuantizedKV):
            qb, sc = quantize_kv_block(block)
            return QuantizedKV(write_kv(cache.q, qb),
                               write_scale(cache.scale, sc))
        return write_kv(cache, block)

    # Packed-int4 weights (ops/quant.Int4Tensor) under int4_impl="kernel*"
    # go through the Pallas weight-streaming kernel (ops/int4_matmul.py).
    # The kernel needs the FULL stacked [L, in, out/2] array (a scan-xs
    # slice would force an HBM copy in front of the custom call — XLA fuses
    # dynamic-slice into dot operands but not into pallas_call), so these
    # weights are lifted OUT of the scanned pytree and the scan body passes
    # a layer index the kernel block-indexes via scalar prefetch.  MoE
    # expert stacks keep the XLA pre-dequant path (their einsums contract
    # over the expert axis, a shape the kernel doesn't serve).
    from ..ops.quant import Int4Tensor
    layers_p = params["layers"]
    use_int4_kernel = cfg.int4_impl in ("kernel", "kernel_interpret")
    int4_interp = cfg.int4_impl == "kernel_interpret"
    kernel_names = ("wq", "wk", "wv", "wo") if cfg.num_experts else \
        ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    int4_names = tuple(n for n in kernel_names
                       if isinstance(layers_p.get(n), Int4Tensor)) \
        if use_int4_kernel else ()
    scan_layers = {k: v for k, v in layers_p.items() if k not in int4_names}

    def mm(x, lp, name, lidx):
        if name in int4_names:
            from ..ops.int4_matmul import int4_matmul
            t = layers_p[name]
            return int4_matmul(x, t.packed, t.scale, lidx,
                               block_n=cfg.int4_block_n,
                               block_k=cfg.int4_block_k,
                               interpret=int4_interp,
                               variant=cfg.int4_variant)
        return qmatmul(x, lp[name])

    def layer_step(carry, xs):
        h = carry
        lidx, lp, k_cache, v_cache = xs  # k_cache/v_cache: [B,KH,S,D]
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        if cfg.attn_bias:
            q = (mm(x, lp, "wq", lidx) + lp["bq"]).reshape(B, T, NH, D)
            k = (mm(x, lp, "wk", lidx) + lp["bk"]).reshape(B, T, KH, D)
            v = (mm(x, lp, "wv", lidx) + lp["bv"]).reshape(B, T, KH, D)
        else:
            q = mm(x, lp, "wq", lidx).reshape(B, T, NH, D)
            k = mm(x, lp, "wk", lidx).reshape(B, T, KH, D)
            v = mm(x, lp, "wv", lidx).reshape(B, T, KH, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_cache = write_kv_any(k_cache, k.transpose(0, 2, 1, 3))
        v_cache = write_kv_any(v_cache, v.transpose(0, 2, 1, 3))
        if paged is not None:
            ctx = attend(q, k_cache, v_cache)
        elif cfg.attention_impl in ("flash", "flash_interpret") and B == 1 \
                and write_offset.ndim == 0 and T <= 128 \
                and (not isinstance(k_cache, QuantizedKV) or ds_layout):
            # the flash kernel targets small decode/verify blocks; wide
            # prefill blocks (T ≫ M) would blow VMEM (G·T query rows) and
            # XLA's fused attention is already fine there
            from ..ops.pallas_attention import flash_block_attention

            ctx = flash_block_attention(
                q, k_cache, v_cache, attn_mask, write_offset + T,
                block_s=getattr(cfg, "flash_block_s", 512),
                pre_transposed=ds_layout,
                interpret=cfg.attention_impl == "flash_interpret")
        else:
            ctx = _attention(q, k_cache, v_cache, attn_mask, cfg)
        attn_out = mm(ctx, lp, "wo", lidx)
        h = h + attn_out
        x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
        if cfg.num_experts:
            h = h + _moe_mlp(x, lp, cfg)
        else:
            gated = jax.nn.silu(mm(x, lp, "w_gate", lidx)) \
                * mm(x, lp, "w_up", lidx)
            h = h + mm(gated, lp, "w_down", lidx)
        return h, (k_cache, v_cache)

    L = cfg.num_layers
    h, (kv_k, kv_v) = jax.lax.scan(
        layer_step, h,
        (jnp.arange(L, dtype=jnp.int32), scan_layers, kv_k, kv_v))
    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    # pre-dequant form for quantized heads (see ops/quant.qmatmul) but with
    # f32 logits: verify compares fp32 logit argmaxes, keep the head
    # accumulation and output dtype identical to the bf16 path
    from ..ops.quant import dequant
    if isinstance(head, Int4Tensor) and use_int4_kernel:
        from ..ops.int4_matmul import int4_matmul
        logits = int4_matmul(h, head.packed, head.scale,
                             out_dtype=jnp.float32,
                             block_n=cfg.int4_block_n,
                             block_k=cfg.int4_block_k,
                             interpret=int4_interp,
                             variant=cfg.int4_variant)
    else:
        logits = jnp.dot(h, dequant(head, h.dtype),
                         preferred_element_type=jnp.float32)
    return logits, h, kv_k, kv_v


# ----------------------------------------------------------------------
# Attention-mask builders (shared by prefill / AR / verify)
# ----------------------------------------------------------------------

def prefill_mask(batch: int, seq_len: int, cache_size: int) -> jax.Array:
    """Causal mask for a block written at offset 0: [B, T, S]."""
    q = jnp.arange(seq_len)[:, None]
    s = jnp.arange(cache_size)[None, :]
    return jnp.broadcast_to(s <= q, (batch, seq_len, cache_size))


def block_decode_mask(tree_mask: jax.Array, cache_len: jax.Array,
                      cache_size: int, batch: int = 1) -> jax.Array:
    """Mask for a draft block of M tokens written at ``cache_len``: every
    query sees the committed prefix [0, cache_len) plus its tree ancestors
    inside the block.  tree_mask: [M, M] bool.  Returns [B, M, S]."""
    M = tree_mask.shape[0]
    s = jnp.arange(cache_size)[None, :]                      # [1, S]
    prefix = s < cache_len                                   # [1, S]
    rel = jnp.clip(s - cache_len, 0, M - 1)                  # [1, S]
    in_block = (s >= cache_len) & (s < cache_len + M)        # [1, S]
    tm = jnp.take_along_axis(
        tree_mask, jnp.broadcast_to(rel, (M, cache_size)), axis=1)  # [M, S]
    allowed = prefix | (in_block & tm)
    return jnp.broadcast_to(allowed, (batch, M, cache_size))
