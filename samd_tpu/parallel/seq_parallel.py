"""Decode-time sequence parallelism: KV cache sharded along its sequence
axis, attention combined blockwise across shards.

The reference is bounded by one GPU's memory (`max_cache_len`,
/root/reference/samd/utils.py:34) and has no sequence parallelism
(SURVEY.md §2.5).  Long-context TPU serving wants the *cache*, not the
heads, split across chips: each device holds ``S/n`` cache slots of every
layer/head, queries are replicated, and the softmax is combined exactly
with the standard blockwise (flash/ring) algebra:

    m      = pmax_i  max(scores_i)
    num    = psum_i  exp(scores_i - m) @ V_i
    denom  = psum_i  sum(exp(scores_i - m))
    ctx    = num / denom

Both collectives ride ICI inside the jitted step (``shard_map`` over the
mesh axis).  The drafted block's KV write may straddle shard boundaries, so
each shard applies a masked gather-write of the block into its local slots
(cheap at test scale; a straddle-aware two-slice write is the production
optimization).

This module provides the forward; engines opt in per call for long-context
requests.  Exactness: the combine reorders float reductions, so outputs
match the unsharded forward to float tolerance (argmax-stable), not
bitwise — same caveat as tensor-parallel serving (tests/test_sharding.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig
from ..models.llama import apply_rope, rms_norm, rope_tables


def kv_seq_spec() -> P:
    """KV cache [L, B, KH, S, D] sharded along S over the "tp" axis."""
    return P(None, None, None, "tp", None)


def shard_kv_seq(kv_k, kv_v, mesh: Mesh) -> Tuple[jax.Array, jax.Array]:
    s = NamedSharding(mesh, kv_seq_spec())
    return jax.device_put(kv_k, s), jax.device_put(kv_v, s)


def _write_block_local(cache, block, write_offset, shard_base):
    """Masked gather-write of ``block`` [B, KH, T, D] into the local cache
    shard [B, KH, S_local, D]; global column ``shard_base + j`` receives
    block element ``shard_base + j - write_offset`` when in range."""
    T = block.shape[2]
    S_local = cache.shape[2]
    g = shard_base + jnp.arange(S_local)                    # global columns
    b = g - write_offset
    in_range = (b >= 0) & (b < T)
    picked = jnp.take(block, jnp.clip(b, 0, T - 1), axis=2)  # [B,KH,S_l,D]
    return jnp.where(in_range[None, None, :, None], picked, cache)


def make_sp_forward(cfg: ModelConfig, mesh: Mesh, *, axis: str = "tp"):
    """Build a jitted forward with the KV cache sequence-sharded over
    ``axis``.  Signature matches models.llama.forward (scalar write_offset,
    batch left unsharded); weights are replicated.

    Returns ``fn(params, tokens, position_ids, kv_k, kv_v, write_offset,
    attn_mask) -> (logits, hidden, kv_k, kv_v)`` where kv_k/kv_v must carry
    ``kv_seq_spec()`` sharding (shard_kv_seq)."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    KH, G, D = cfg.num_kv_heads, cfg.kv_groups, cfg.head_dim
    NH, H = cfg.num_heads, cfg.hidden_size

    def sp_attention(q, k_shard, v_shard, mask_shard, shard_base):
        """q: [B,T,NH,D] replicated; k/v_shard: [B,KH,S_l,D];
        mask_shard: [B,T,S_l] -> [B,T,NH*D] replicated."""
        B, T = q.shape[0], q.shape[1]
        qg = q.reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)
        scores = jnp.einsum("bkgtd,bksd->bkgts", qg, k_shard,
                            preferred_element_type=jnp.float32)
        scores = scores * (D ** -0.5)
        bias = jnp.where(mask_shard[:, None, None, :, :], 0.0,
                         jnp.float32(-1e30))
        scores = scores + bias
        m_local = jnp.max(scores, axis=-1)
        m = jax.lax.pmax(m_local, axis)                      # global max
        e = jnp.exp(scores - m[..., None])
        denom = jax.lax.psum(jnp.sum(e, axis=-1), axis)
        num = jax.lax.psum(
            jnp.einsum("bkgts,bksd->bkgtd", e.astype(v_shard.dtype), v_shard,
                       preferred_element_type=jnp.float32), axis)
        ctx = (num / denom[..., None]).astype(q.dtype)
        return ctx.transpose(0, 3, 1, 2, 4).reshape(B, T, KH * G * D)

    def inner(params, tokens, position_ids, kv_k, kv_v, write_offset,
              attn_mask):
        # runs per-shard: kv_* are [L,B,KH,S_local,D]; everything else full
        B, T = tokens.shape
        S_local = kv_k.shape[3]
        shard_base = jax.lax.axis_index(axis) * S_local
        h = params["embed"][tokens]
        cos, sin = rope_tables(position_ids, D, cfg.rope_theta)

        def layer_step(carry, xs):
            h = carry
            lp, k_cache, v_cache = xs
            x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
            q = (x @ lp["wq"]).reshape(B, T, NH, D)
            k = (x @ lp["wk"]).reshape(B, T, KH, D)
            v = (x @ lp["wv"]).reshape(B, T, KH, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            k_cache = _write_block_local(k_cache, k.transpose(0, 2, 1, 3),
                                         write_offset, shard_base)
            v_cache = _write_block_local(v_cache, v.transpose(0, 2, 1, 3),
                                         write_offset, shard_base)
            ctx = sp_attention(q, k_cache, v_cache, attn_mask, shard_base)
            h = h + ctx @ lp["wo"]
            x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
            gated = jax.nn.silu(x @ lp["w_gate"]) * (x @ lp["w_up"])
            h = h + gated @ lp["w_down"]
            return h, (k_cache, v_cache)

        h, (kv_k, kv_v) = jax.lax.scan(layer_step, h,
                                       (params["layers"], kv_k, kv_v))
        h = rms_norm(h, params["final_norm"], cfg.rms_eps)
        head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
        logits = jnp.dot(h, head, preferred_element_type=jnp.float32)
        return logits, h, kv_k, kv_v

    rep = P()  # replicated
    kv_in = P(None, None, None, "tp", None)
    mask_in = P(None, None, "tp")
    mapped = shard_map(
        inner, mesh=mesh,
        in_specs=(rep, rep, rep, kv_in, kv_in, rep, mask_in),
        out_specs=(rep, rep, kv_in, kv_in),
        check_rep=False)

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def sp_forward(params, tokens, position_ids, kv_k, kv_v, write_offset,
                   attn_mask):
        return mapped(params, tokens, position_ids, kv_k, kv_v,
                      jnp.asarray(write_offset), attn_mask)

    return sp_forward
