"""Sharding rules: megatron-style tensor parallelism over a device mesh.

The reference has no distributed runtime (SURVEY.md §2.5) — multi-GPU means
HF ``device_map`` layer placement.  Here parallelism is first-class: one
``Mesh`` with axes ``("dp", "tp")``; weights and KV cache carry
``NamedSharding``s and every jitted step compiles under GSPMD, which inserts
the ICI collectives (all-reduce after row-sharded matmuls, all-gather for the
sharded-vocab argmax) automatically.

Layout:
  * column-parallel: wq/wk/wv, w_gate/w_up  → shard output dim over "tp"
  * row-parallel:    wo, w_down             → shard input dim over "tp"
    (GSPMD inserts one psum per attention/MLP block, riding ICI)
  * embed: vocab-sharded rows; lm_head: vocab-sharded columns — the fp32
    logits stay sharded through argmax/top-k reductions
  * KV cache [L, B, KH, S, D]: batch over "dp", kv-heads over "tp" — the
    decode gather/compact stays local to each shard
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.configs import ModelConfig


def make_mesh(num_devices: Optional[int] = None, *, dp: int = 1, pp: int = 1,
              ep: int = 1, devices=None) -> Mesh:
    """Mesh with axes ("dp", "pp", "ep", "tp") — dp/pp/ep default to 1, so
    the common tensor-parallel case is a (1, 1, 1, tp) mesh.  "ep" shards
    the MoE expert axis (Mixtral-family configs); dense-model specs simply
    never name it, so it replicates."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % (dp * pp * ep) != 0:
        raise ValueError(
            f"{n} devices not divisible by dp*pp*ep={dp * pp * ep}")
    tp = n // (dp * pp * ep)
    return Mesh(np.asarray(devices).reshape(dp, pp, ep, tp),
                ("dp", "pp", "ep", "tp"))


def check_shardable(cfg: ModelConfig, mesh: Mesh) -> None:
    tp = mesh.shape["tp"]
    pp = mesh.shape.get("pp", 1)
    ep = mesh.shape.get("ep", 1)
    for name, dim in [("num_kv_heads", cfg.num_kv_heads),
                      ("num_heads", cfg.num_heads),
                      ("intermediate_size", cfg.intermediate_size),
                      ("vocab_size", cfg.vocab_size)]:
        if dim % tp != 0:
            raise ValueError(f"{name}={dim} not divisible by tp={tp}")
    if cfg.num_layers % pp != 0:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    if ep > 1 and cfg.num_experts % ep != 0:
        raise ValueError(
            f"num_experts={cfg.num_experts} not divisible by ep={ep}")


def param_specs(cfg: ModelConfig) -> dict:
    """PartitionSpec pytree matching samd_tpu.models.llama.init_params.

    Layer-stacked weights shard their leading (layer) axis over "pp": under
    ``lax.scan`` each pipeline stage owns its contiguous layer block, the
    hidden state flowing stage-to-stage — the TPU-native analogue of the
    reference's HF ``device_map`` layer placement (SURVEY.md §2.5)."""
    if cfg.num_experts:
        # 2-D expert×tensor sharding: experts over "ep", each expert's
        # SwiGLU megatron-split over "tp"; the weighted expert combine's
        # e-contraction becomes one psum over ep (rides ICI).
        mlp = {
            "router": P("pp", None, None),
            "w_gate": P("pp", "ep", None, "tp"),
            "w_up": P("pp", "ep", None, "tp"),
            "w_down": P("pp", "ep", "tp", None),
        }
    else:
        mlp = {
            "w_gate": P("pp", None, "tp"),
            "w_up": P("pp", None, "tp"),
            "w_down": P("pp", "tp", None),
        }
    specs = {
        "embed": P("tp", None),
        "layers": {
            "attn_norm": P("pp", None),
            "wq": P("pp", None, "tp"),
            "wk": P("pp", None, "tp"),
            "wv": P("pp", None, "tp"),
            "wo": P("pp", "tp", None),
            "mlp_norm": P("pp", None),
            **mlp,
        },
        "final_norm": P(None),
    }
    if cfg.attn_bias:
        specs["layers"]["bq"] = P("pp", "tp")
        specs["layers"]["bk"] = P("pp", "tp")
        specs["layers"]["bv"] = P("pp", "tp")
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def kv_spec() -> P:
    return P("pp", "dp", "tp", None, None)


def _put_leaf(s: P, x, mesh: Mesh):
    """device_put one param leaf under spec ``s`` — including quantized
    pytrees, whose scale drops the contraction (-2) axis of the weight spec.

    Int4Tensor composition note (VERDICT r4 #5): the packed [.., in, out/2]
    array is placed REPLICATED over "tp" (only "pp" from the weight spec is
    kept — layer-stacked axes slice outside the matmul, so pipeline
    sharding composes fine).  The Pallas weight-streaming kernel is an
    unpartitioned custom call: GSPMD cannot split it, and a tp-sharded
    packed operand gets an all-gather inserted in FRONT of it every decode
    step — strictly worse than replication (measured correct either way;
    tests/test_sharding.py).  Per-shard streaming exists as the explicit
    ``ops.int4_matmul.int4_matmul_tp`` shard_map wrapper for future
    multi-chip serving.  The XLA int4 path (int4_impl="xla") has no custom
    call, but engines share one placement regardless of impl, so int4
    weights replicate over tp across the board."""
    from ..ops.quant import Int4Tensor, QuantizedTensor

    if isinstance(x, QuantizedTensor):
        scale_spec = P(*(e for i, e in enumerate(s) if i != len(s) - 2))
        return QuantizedTensor(
            jax.device_put(x.q, NamedSharding(mesh, s)),
            jax.device_put(x.scale, NamedSharding(mesh, scale_spec)))
    if isinstance(x, Int4Tensor):
        pp_only = P(*((e if e == "pp" else None) for e in s))
        scale_spec = P(*(e for i, e in enumerate(pp_only)
                         if i != len(pp_only) - 2))
        return Int4Tensor(
            jax.device_put(x.packed, NamedSharding(mesh, pp_only)),
            jax.device_put(x.scale, NamedSharding(mesh, scale_spec)))
    return jax.device_put(x, NamedSharding(mesh, s))


def shard_params(params, mesh: Mesh, cfg: ModelConfig):
    """Place a param pytree (plain, int8/fp8 QuantizedTensor, or packed-int4
    Int4Tensor leaves) on ``mesh`` per ``param_specs``."""
    specs = param_specs(cfg)
    # specs is the first tree with PartitionSpec treated as a leaf, so this is
    # robust regardless of whether PartitionSpec registers as a container.
    return jax.tree.map(
        lambda s, x: _put_leaf(s, x, mesh),
        specs, params,
        is_leaf=lambda x: isinstance(x, P))


def shard_kv(kv_k, kv_v, mesh: Mesh) -> Tuple[jax.Array, jax.Array]:
    s = NamedSharding(mesh, kv_spec())
    return jax.device_put(kv_k, s), jax.device_put(kv_v, s)
