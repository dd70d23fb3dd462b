"""EAGLE draft network: one Llama-style decoder layer over fused
(token-embedding ⊕ target-hidden) inputs.

Architecture per the reference's vendored EAGLE nets
(/root/reference/samd/tree_model/eagle/eagle_model.py:576-699 and
/root/reference/samd/tree_model/eagle2/eagle2_model.py:237-666): a linear
``fc: 2H → H`` fuses the embedding of token t+1 with the target model's
hidden state at t; a single decoder layer (no input layernorm on the fused
features, EAGLE convention) predicts the target's next hidden state, decoded
through the target's own lm_head.

Functional JAX, sharing the building blocks of samd_tpu.models.llama; the
draft KV cache uses the same [1, B, KH, S, D]-style layout (one layer)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...models.configs import ModelConfig
from ...models.llama import apply_rope, rms_norm, rope_tables, _attention


@dataclass(frozen=True)
class EagleNetConfig:
    hidden_size: int
    intermediate_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_target(cls, cfg: ModelConfig) -> "EagleNetConfig":
        return cls(hidden_size=cfg.hidden_size,
                   intermediate_size=cfg.intermediate_size,
                   num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
                   head_dim=cfg.head_dim, rope_theta=cfg.rope_theta,
                   rms_eps=cfg.rms_eps, dtype=cfg.dtype)

    @property
    def kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


def init_eagle_params(cfg: EagleNetConfig, key: jax.Array,
                      scale: float = 0.02) -> Dict:
    ks = jax.random.split(key, 8)
    H, I = cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    return {
        "fc_w": norm(ks[0], (2 * H, H)),
        "fc_b": jnp.zeros((H,), cfg.dtype),
        "wq": norm(ks[1], (H, NH * D)),
        "wk": norm(ks[2], (H, KH * D)),
        "wv": norm(ks[3], (H, KH * D)),
        "wo": norm(ks[4], (NH * D, H)),
        "mlp_norm": jnp.ones((H,), cfg.dtype),
        "w_gate": norm(ks[5], (H, I)),
        "w_up": norm(ks[6], (H, I)),
        "w_down": norm(ks[7], (I, H)),
    }


def init_eagle_kv(cfg: EagleNetConfig, batch: int, max_len: int,
                  ) -> Tuple[jax.Array, jax.Array]:
    shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


def eagle_forward(params: Dict, cfg: EagleNetConfig, embeds: jax.Array,
                  prev_hidden: jax.Array, position_ids: jax.Array,
                  kv_k: jax.Array, kv_v: jax.Array, write_offset: jax.Array,
                  attn_mask: jax.Array,
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One draft-net step.

    embeds/prev_hidden: [B, T, H]; position_ids: [B, T];
    kv: [B, KH, S, D]; attn_mask: [B, T, S].  Returns (hidden [B, T, H],
    kv_k, kv_v)."""
    from ...ops.quant import qmatmul

    B, T, H = embeds.shape
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = jnp.concatenate([embeds.astype(cfg.dtype),
                         prev_hidden.astype(cfg.dtype)], axis=-1)
    h = qmatmul(x, params["fc_w"]) + params["fc_b"]
    # EAGLE: no input layernorm before the first (only) attention block
    cos, sin = rope_tables(position_ids, D, cfg.rope_theta)
    q = qmatmul(h, params["wq"]).reshape(B, T, NH, D)
    k = qmatmul(h, params["wk"]).reshape(B, T, KH, D)
    v = qmatmul(h, params["wv"]).reshape(B, T, KH, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    kv_k = jax.lax.dynamic_update_slice(
        kv_k, k.transpose(0, 2, 1, 3), (0, 0, write_offset, 0))
    kv_v = jax.lax.dynamic_update_slice(
        kv_v, v.transpose(0, 2, 1, 3), (0, 0, write_offset, 0))
    attn_out = qmatmul(_attention(q, kv_k, kv_v, attn_mask, cfg),
                       params["wo"])
    h = h + attn_out
    xm = rms_norm(h, params["mlp_norm"], cfg.rms_eps)
    gated = jax.nn.silu(qmatmul(xm, params["w_gate"])) \
        * qmatmul(xm, params["w_up"])
    h = h + qmatmul(gated, params["w_down"])
    return h, kv_k, kv_v


def convert_eagle_state_dict(sd: Dict, cfg: EagleNetConfig) -> Dict:
    """Convert an official EAGLE checkpoint state dict (pytorch_model.bin;
    reference load at /root/reference/samd/tree_model/eagle2/eagle2_model.py:659-666)."""

    def get(name):
        arr = sd[name]
        if hasattr(arr, "detach"):
            arr = arr.detach().float().numpy()
        return np.asarray(arr, dtype=np.float32)

    def lin(name):
        return jnp.asarray(get(name).T, cfg.dtype)

    p = "layers.0."
    out = {
        "fc_w": lin("fc.weight"),
        "fc_b": (jnp.asarray(get("fc.bias"), cfg.dtype)
                 if "fc.bias" in sd else jnp.zeros((cfg.hidden_size,),
                                                   cfg.dtype)),
        "wq": lin(p + "self_attn.q_proj.weight"),
        "wk": lin(p + "self_attn.k_proj.weight"),
        "wv": lin(p + "self_attn.v_proj.weight"),
        "wo": lin(p + "self_attn.o_proj.weight"),
        "mlp_norm": jnp.asarray(get(p + "post_attention_layernorm.weight"),
                                cfg.dtype),
        "w_gate": lin(p + "mlp.gate_proj.weight"),
        "w_up": lin(p + "mlp.up_proj.weight"),
        "w_down": lin(p + "mlp.down_proj.weight"),
    }
    return out
