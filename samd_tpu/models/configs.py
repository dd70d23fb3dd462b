"""Model architecture configs.

Only the fields the decode path needs; presets cover the reference's target
models (Vicuna-7B-v1.3 per /root/reference/README.md:46, Llama-3-8B per
/root/reference/evaluation/eval_llama3.py) plus tiny configs for tests and
benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


import jax.numpy as jnp


@dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_position_embeddings: int = 4096
    tie_embeddings: bool = False
    # Qwen2-family attention: q/k/v projections carry biases (HF Qwen2
    # hardcodes qkv bias on, o_proj bias off — the reference serves Qwen2
    # targets through its vendored modeling_qwen2_kv.py).
    attn_bias: bool = False
    # Mixtral-family MoE: >0 replaces the dense MLP with num_experts
    # SwiGLU experts under top-(num_experts_per_tok) routing (reference
    # vendored modeling_mixtral_kv.py).  0 = dense (Llama/Qwen2).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    # attention implementation for decode/verify blocks:
    #   "xla"             – plain dot-product attention over the full cache
    #   "flash"           – Pallas flash kernel streaming only live KV blocks
    #   "flash_interpret" – same kernel in interpreter mode (CPU tests)
    # Measured guidance (docs/PERFORMANCE.md "Kernel-level"): kernel v2
    # (head-folded grid + boundary-window mask) wins from S≈2048 up
    # (5.27 vs 5.42 ms/step at S=2048; 10.8 vs 15.4 at S=8192, with
    # kv_layout="ds"); XLA stays ~2% ahead at S=1024.
    attention_impl: str = "xla"
    # KV block size streamed by the flash kernel: the dead-tail skip
    # granularity (attention reads ceil(live/block)·block columns).  Smaller
    # blocks help short-prefix decode (live ≪ S); 512 amortizes DMA better
    # when most of the cache is live.
    flash_block_s: int = 512
    # KV-cache layout:
    #   "sd" – [L, B, KH, S, D] (sequence-major; default)
    #   "ds" – [L, B, KH, D, S] (transposed: the flash kernel's native
    #          layout — streams S-blocks with the 128-aligned lane dim and
    #          no per-layer transpose; XLA attention handles it via einsum)
    kv_layout: str = "sd"
    # Matmul implementation for packed-int4 weights (ops/quant.Int4Tensor):
    #   "xla"              – pre-dequant fallback (int8-parity HBM traffic,
    #                        half at-rest footprint; CPU-safe)
    #   "kernel"           – Pallas weight-streaming kernel
    #                        (ops/int4_matmul.py): true 0.5 bytes/weight —
    #                        the speed path on TPU (dense-MLP projections +
    #                        quantized lm_head; MoE expert einsums stay XLA)
    #   "kernel_interpret" – same kernel interpreted (CPU tests)
    # Engines and their equality oracles must share the setting (the two
    # forms round differently — own-trajectory rule, docs/PERFORMANCE.md).
    int4_impl: str = "xla"
    # int4 kernel tile sizes (contraction rows / output-half columns per
    # block; clamped to the 2 MB scoped-VMEM budget in ops/int4_matmul):
    # 2048x1024 won the sweep at both 1B and 7B shapes
    # (scripts/profile_int4.py)
    int4_block_n: int = 1024
    int4_block_k: int = 2048
    # int4 kernel unpack-arithmetic variant (ops/int4_matmul._KERNELS):
    # "v2-sum" recovers the hi nibble in output space — one fewer
    # full-width VPU op per packed byte than v1's shift form; measured
    # faster at both microbench and 7B-forward scale
    # (scripts/profile_int4_kernel.py).  Engines + oracles share it via
    # this config (the variants round differently — own-trajectory rule).
    int4_variant: str = "v2-sum"
    # INT8 KV cache (cache.QuantizedKV): int8 values + one fp32 scale per
    # (token, kv-head).  Halves KV footprint; trajectories differ from the
    # bf16 cache's (near-tie argmaxes), so greedy-equality oracles must
    # share the flag.  All dense-cache engines (single-stream + batched);
    # the flash kernel dequantizes in-register, the paged pool stays bf16.
    kv_quant: bool = False

    @property
    def kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    def with_dtype(self, dtype) -> "ModelConfig":
        return replace(self, dtype=dtype)


def llama_7b() -> ModelConfig:
    """Vicuna-7B-v1.3 / Llama-2-7B shape."""
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        rope_theta=10000.0, rms_eps=1e-6, max_position_embeddings=4096,
    )


def llama_13b() -> ModelConfig:
    """Vicuna-13B-v1.3 / Llama-2-13B shape (the reference's largest
    Spec-Bench target, /root/reference/README.md).  bf16 (26 GB) and int8
    (13 GB + KV) do not fit one 16 GB v5e; packed int4 (~6.6 GB) does —
    the single-chip 13B serving config."""
    return ModelConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_layers=40, num_heads=40, num_kv_heads=40, head_dim=128,
        rope_theta=10000.0, rms_eps=1e-6, max_position_embeddings=4096,
    )


def llama3_8b() -> ModelConfig:
    return ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, rms_eps=1e-5, max_position_embeddings=8192,
    )


def llama_1b() -> ModelConfig:
    """~1.1B TinyLlama shape: the default benchmark model when no real
    checkpoint is available on the machine."""
    return ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, rms_eps=1e-5, max_position_embeddings=2048,
    )


def qwen2_7b() -> ModelConfig:
    """Qwen2-7B-Instruct shape (reference's vendored Qwen2 target family)."""
    return ModelConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, rms_eps=1e-6, max_position_embeddings=32768,
        attn_bias=True,
    )


def mixtral_8x7b() -> ModelConfig:
    """Mixtral-8x7B shape (reference's vendored Mixtral target family)."""
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, rms_eps=1e-5, max_position_embeddings=32768,
        num_experts=8, num_experts_per_tok=2,
    )


def tiny_config(vocab_size: int = 256, *, num_kv_heads: int = 2,
                dtype=jnp.float32) -> ModelConfig:
    """Small config for unit tests (fast CPU compile, fp32 for exactness)."""
    return ModelConfig(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=num_kv_heads, head_dim=16,
        rope_theta=10000.0, rms_eps=1e-6, max_position_embeddings=512,
        dtype=dtype,
    )


def tiny_qwen2_config(vocab_size: int = 256, *, dtype=jnp.float32
                      ) -> ModelConfig:
    """Qwen2-family tiny config (qkv biases) for tests."""
    return replace(tiny_config(vocab_size, dtype=dtype), attn_bias=True,
                   rope_theta=1000000.0)


def tiny_moe_config(vocab_size: int = 256, *, num_experts: int = 4,
                    dtype=jnp.float32) -> ModelConfig:
    """Mixtral-family tiny config (top-2 of num_experts) for tests."""
    return replace(tiny_config(vocab_size, dtype=dtype),
                   num_experts=num_experts, num_experts_per_tok=2)


def from_hf_config(hf_config, dtype=jnp.bfloat16) -> ModelConfig:
    """Build from a transformers config object (Llama / Qwen2 / Mixtral
    families — the targets the reference's vendored tree-mask modeling
    files cover, SURVEY.md §2: modeling_llama/qwen2/mixtral_kv.py)."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    model_type = getattr(hf_config, "model_type", "llama")
    return ModelConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        head_dim=head_dim,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
        max_position_embeddings=hf_config.max_position_embeddings,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        attn_bias=(model_type == "qwen2"
                   or getattr(hf_config, "attention_bias", False)),
        num_experts=getattr(hf_config, "num_local_experts", 0)
        if model_type == "mixtral" else 0,
        num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 2),
        dtype=dtype,
    )
