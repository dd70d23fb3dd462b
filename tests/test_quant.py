"""INT8 weight-only quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.models import init_params, tiny_config
from samd_tpu.ops.quant import (
    QuantizedTensor,
    qmatmul,
    quantize_llama_params,
    quantize_weight,
    quantized_bytes,
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (32,)
    deq = qt.q.astype(jnp.float32) * qt.scale
    err = jnp.abs(deq - w).max() / jnp.abs(w).max()
    assert float(err) < 0.01  # ~1/127 relative


def test_qmatmul_close_to_full_precision():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (8, 64))
    w = jax.random.normal(k2, (64, 32))
    full = x @ w
    quant = qmatmul(x, quantize_weight(w))
    rel = jnp.abs(quant - full).max() / jnp.abs(full).max()
    assert float(rel) < 0.05


def test_param_size_reduction():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_llama_params(params)
    assert quantized_bytes(qparams) < 0.45 * quantized_bytes(params)
    # stacked layers keep the leading axis
    assert qparams["layers"]["wq"].q.shape == params["layers"]["wq"].shape
    assert qparams["layers"]["wq"].scale.shape == (
        cfg.num_layers, cfg.num_heads * cfg.head_dim)


def test_quantized_engine_lossless_vs_quantized_ar():
    """Speculative decoding with int8 weights must equal the int8 AR
    baseline (losslessness holds at any weight precision)."""
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    qparams = quantize_llama_params(params)
    gen = GenerationConfig(max_new_tokens=32, max_cache_len=256)
    prompt = np.random.default_rng(0).integers(3, 128, size=16).tolist()

    ar = ArBaseline(cfg, qparams, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,))
    ref = ar.generate(prompt, gen)

    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    engine = SamdEngine(cfg, qparams, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=256, eos_token_id=-1,
                        prefill_buckets=(32,))
    out = engine.generate(prompt, gen)
    assert out.output_ids == ref.output_ids


def test_quantized_fused_engine_lossless_vs_quantized_ar():
    """The fused device-loop engine (the INT8 serving config, bench.py)
    stays trajectory-lossless with quantized weights: block-AR oracle with
    the same int8 params and block shape produces identical tokens."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    qparams = quantize_llama_params(params)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    prompt = np.random.default_rng(1).integers(3, 128, size=16).tolist()

    M = 8
    oracle = ArBaseline(cfg, qparams, max_cache_len=256, eos_token_id=-1,
                        prefill_buckets=(32,), block_size=M)
    ref = oracle.generate(prompt, gen)
    eng = FusedSamEngine(cfg, qparams,
                         FusedSamConfig(n_predicts=M - 1, steps_per_call=64,
                                        corpus_capacity=512),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == ref.output_ids


def test_fp8_weight_only_quantization():
    """FP8 (e4m3) weight-only: same 1 byte/weight as int8, wider per-channel
    dynamic range; engine stays lossless vs its own fp8-quantized AR oracle."""
    import jax.numpy as jnp

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import ArBaseline, SamdEngine
    from samd_tpu.models import init_params, tiny_config
    from samd_tpu.ops.quant import QuantizedTensor, quantize_llama_params

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    qparams = quantize_llama_params(params, dtype=jnp.float8_e4m3fn)
    assert isinstance(qparams["layers"]["wq"], QuantizedTensor)
    assert qparams["layers"]["wq"].q.dtype == jnp.float8_e4m3fn
    # quantization error is small relative to weight magnitude
    w = np.asarray(params["layers"]["wq"], np.float32)
    qt = qparams["layers"]["wq"]
    deq = np.asarray(qt.q.astype(jnp.float32)) * np.asarray(qt.scale)[:, None]
    assert np.abs(deq - w).max() < 0.1 * np.abs(w).max()

    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    prompt = np.random.default_rng(0).integers(3, 128, size=20).tolist()
    oracle = ArBaseline(cfg, qparams, max_cache_len=256, eos_token_id=-1,
                        prefill_buckets=(32,), block_size=8)
    scfg = SamdConfig(draft_source="sam_only", max_predicts=8)
    eng = SamdEngine(cfg, qparams, scfg, make_drafter(scfg, cfg.vocab_size),
                     max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        oracle.generate(prompt, gen).output_ids


def test_init_quantized_params_serves():
    """Direct 1-byte random init (no bf16 intermediate) drives the engine:
    the 7B-class single-chip bench path (bench.py)."""
    from samd_tpu.config import GenerationConfig
    from samd_tpu.engine import ArBaseline
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import tiny_config
    from samd_tpu.ops.quant import (QuantizedTensor,
                                    init_quantized_llama_params)

    cfg = tiny_config(vocab_size=128)
    params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0),
                                         scale=0.4)
    assert isinstance(params["layers"]["wq"], QuantizedTensor)
    assert params["layers"]["wq"].q.dtype == jnp.int8
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    prompt = np.random.default_rng(1).integers(3, 128, size=20).tolist()
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, params, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


# ----------------------------------------------------------------------
# INT4 (packed-nibble) weight-only
# ----------------------------------------------------------------------

def test_int4_pack_roundtrip():
    """quantize_weight4 packs two out-channels per byte (low nibble =
    even channel); the in-jit unpack reproduces the quantized values."""
    from samd_tpu.ops.quant import Int4Tensor, _deq4, quantize_weight4

    w = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (64, 32)))
    qt = quantize_weight4(jnp.asarray(w))
    assert isinstance(qt, Int4Tensor)
    assert qt.packed.dtype == jnp.uint8
    assert qt.packed.shape == (64, 16)
    assert qt.shape == (64, 32)
    assert qt.scale.shape == (32,)

    scale = np.abs(w).max(axis=0) / 7.0
    q = np.clip(np.round(w / scale), -7, 7)
    deq = np.asarray(jax.jit(lambda t: _deq4(t, jnp.float32))(qt))
    assert np.array_equal(deq, q * scale)
    # relative error bounded by the 4-bit grid
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 0.08  # ~1/14 relative


def test_int4_qmatmul_matches_manual_dequant():
    from samd_tpu.ops.quant import qmatmul, quantize_weight4

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (8, 64))
    w = jax.random.normal(k2, (64, 32))
    qt = quantize_weight4(w)
    scale = np.abs(np.asarray(w)).max(axis=0) / 7.0
    q = np.clip(np.round(np.asarray(w) / scale), -7, 7)
    ref = np.asarray(x) @ (q * scale)
    got = np.asarray(jax.jit(qmatmul)(x, qt))
    assert np.allclose(got, ref, atol=1e-5)


def test_int4_stacked_layer_shapes():
    from samd_tpu.models import init_params, tiny_config
    from samd_tpu.ops.quant import Int4Tensor, quantize_llama_params

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    wq = q4["layers"]["wq"]
    assert isinstance(wq, Int4Tensor)
    out = cfg.num_heads * cfg.head_dim
    assert wq.packed.shape == (cfg.num_layers, cfg.hidden_size, out // 2)
    assert wq.scale.shape == (cfg.num_layers, out)
    from samd_tpu.ops.quant import quantized_bytes
    assert quantized_bytes(q4) < 0.30 * quantized_bytes(params)


def test_int4_engine_lossless_vs_int4_ar():
    """Speculative decoding with packed-int4 weights equals the int4 AR
    baseline bitwise (losslessness holds at any weight precision)."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=256)
    prompt = np.random.default_rng(2).integers(3, 128, size=16).tolist()

    M = 8
    oracle = ArBaseline(cfg, q4, max_cache_len=256, eos_token_id=-1,
                        prefill_buckets=(32,), block_size=M)
    ref = oracle.generate(prompt, gen)
    eng = FusedSamEngine(cfg, q4,
                         FusedSamConfig(n_predicts=M - 1, steps_per_call=64,
                                        corpus_capacity=512),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == ref.output_ids

    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    engine = SamdEngine(cfg, q4, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=256, eos_token_id=-1,
                        prefill_buckets=(32,))
    host_ref = ArBaseline(cfg, q4, max_cache_len=256, eos_token_id=-1,
                          prefill_buckets=(32,)).generate(prompt, gen)
    assert engine.generate(prompt, gen).output_ids == host_ref.output_ids


def test_int4_init_params_serves():
    """Direct packed-int4 random init (no wider intermediate) drives the
    fused engine losslessly — the 7B int4 single-chip bench path."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.ops.quant import Int4Tensor, init_quantized_llama_params

    cfg = tiny_config(vocab_size=128)
    params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0),
                                         scale=0.4, dtype=jnp.int4)
    assert isinstance(params["layers"]["wq"], Int4Tensor)
    assert params["layers"]["wq"].packed.dtype == jnp.uint8
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    prompt = np.random.default_rng(3).integers(3, 128, size=20).tolist()
    ar = ArBaseline(cfg, params, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, params, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


def test_int4_eagle_params():
    from samd_tpu.drafters.eagle.net import init_eagle_params, EagleNetConfig
    from samd_tpu.ops.quant import Int4Tensor, quantize_eagle_params

    ncfg = EagleNetConfig(hidden_size=32, intermediate_size=64,
                          num_heads=2, num_kv_heads=2, head_dim=16)
    net = init_eagle_params(ncfg, jax.random.PRNGKey(0))
    q4 = quantize_eagle_params(net, dtype=jnp.int4)
    assert isinstance(q4["wq"], Int4Tensor)
    assert not isinstance(q4["mlp_norm"], Int4Tensor)


# ----------------------------------------------------------------------
# INT4 Pallas kernel path (ops/int4_matmul, ModelConfig.int4_impl)
# ----------------------------------------------------------------------

def _kernel_cfg(**kw):
    """256-divisible dims (the kernel's contraction-block requirement)."""
    from samd_tpu.models import ModelConfig
    return ModelConfig(vocab_size=512, hidden_size=256,
                       intermediate_size=512, num_layers=3, num_heads=4,
                       num_kv_heads=2, head_dim=64, dtype=jnp.float32, **kw)


def test_int4_kernel_matches_xla_dequant():
    """The Pallas kernel (interpret mode) reproduces the XLA pre-dequant
    form up to dequant-order rounding, for 2D and stacked weights."""
    from samd_tpu.ops.int4_matmul import int4_matmul
    from samd_tpu.ops.quant import Int4Tensor, _deq4, quantize_weight4

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (8, 512)).astype(jnp.float32)
    w = jax.random.normal(k2, (512, 256))
    qt = quantize_weight4(w)
    ref = np.asarray(jax.jit(lambda x, t: x @ _deq4(t, x.dtype))(x, qt))
    got = np.asarray(int4_matmul(x, qt.packed, qt.scale, interpret=True))
    assert np.allclose(got, ref, atol=1e-4, rtol=1e-4)

    packed = jnp.stack([quantize_weight4(
        jax.random.normal(jax.random.PRNGKey(i), (512, 256))).packed
        for i in range(3)])
    scale = jnp.stack([quantize_weight4(
        jax.random.normal(jax.random.PRNGKey(i), (512, 256))).scale
        for i in range(3)])
    for layer in range(3):
        t = Int4Tensor(packed[layer], scale[layer])
        ref = np.asarray(jax.jit(lambda x, t: x @ _deq4(t, x.dtype))(x, t))
        got = np.asarray(int4_matmul(x, packed, scale, jnp.int32(layer),
                                     interpret=True))
        assert np.allclose(got, ref, atol=1e-4, rtol=1e-4), layer


def test_int4_kernel_variants_agree():
    """All unpack-arithmetic variants (v1 shift, v2 output-space sum, v3
    hi-mask) compute the same matmul: v2 recovers the hi nibble as
    (dot(x,p) - dot(x,lo))/16 on the output block — exact because bytes
    0..255 are exactly representable and products accumulate in f32."""
    from samd_tpu.ops.int4_matmul import _KERNELS, int4_matmul
    from samd_tpu.ops.quant import quantize_weight4

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (8, 512)).astype(jnp.float32)
    qt = quantize_weight4(jax.random.normal(k2, (512, 256)))
    outs = {v: np.asarray(int4_matmul(x, qt.packed, qt.scale,
                                      interpret=True, variant=v))
            for v in _KERNELS}
    ref = outs.pop("v1-shift")
    for v, got in outs.items():
        # v2/v4 recover yo by subtracting two f32-accumulated sums, so the
        # agreement bound is relative to the SUM magnitudes, not elementwise
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
        assert err < 1e-4, (v, err)


def test_int4_kernel_forward_matches_xla_path():
    """forward() with int4_impl="kernel_interpret" matches the XLA dequant
    path (fp32 activations: the two dequant orders agree to float rounding)."""
    from dataclasses import replace

    from samd_tpu.models import init_params
    from samd_tpu.models.llama import forward, prefill_mask
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = _kernel_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.1)
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    B, T, S = 1, 8, 32
    toks = (jnp.arange(B * T, dtype=jnp.int32).reshape(B, T)) % cfg.vocab_size
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    kv = jnp.zeros((cfg.num_layers, B, cfg.num_kv_heads, S, cfg.head_dim),
                   cfg.dtype)
    mask = prefill_mask(B, T, S)
    lx = jax.jit(lambda p: forward(p, cfg, toks, pos, kv, kv, jnp.int32(0),
                                   mask))(q4)[0]
    cfgk = replace(cfg, int4_impl="kernel_interpret")
    lk = jax.jit(lambda p: forward(p, cfgk, toks, pos, kv, kv, jnp.int32(0),
                                   mask))(q4)[0]
    assert np.allclose(np.asarray(lx), np.asarray(lk), atol=1e-4, rtol=1e-4)


def test_int4_kernel_engine_lossless_vs_own_ar():
    """Fused engine with the int4 kernel path equals the block-AR oracle
    sharing int4_impl (own-trajectory rule: kernel and XLA dequant round
    differently, so the oracle must share the implementation)."""
    from samd_tpu.engine import ArBaseline
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = _kernel_cfg(int4_impl="kernel_interpret")
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128)
    prompt = np.random.default_rng(7).integers(3, 512, size=12).tolist()
    M = 8
    ar = ArBaseline(cfg, q4, max_cache_len=128, eos_token_id=-1,
                    prefill_buckets=(16,), block_size=M)
    eng = FusedSamEngine(cfg, q4,
                         FusedSamConfig(n_predicts=M - 1, steps_per_call=64,
                                        corpus_capacity=256),
                         max_cache_len=128, eos_token_id=-1,
                         prefill_buckets=(16,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


def test_int4_requant_from_int8_init_same_base_weights():
    """int4_requant_from_int8_init derives its packed weights from the SAME
    random int8 base as _init_quantized_llama_params (same key): the
    dequantized int4 tree approximates the dequantized int8 tree within the
    int4 quantization step, the base-check slices match the int8 tree's q
    values exactly, and the tree serves the fused engine losslessly."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.ops.quant import (Int4Tensor, _deq4,
                                    init_quantized_llama_params,
                                    int4_requant_from_int8_init)

    cfg = tiny_config(vocab_size=128)
    key = jax.random.PRNGKey(0)
    p8 = init_quantized_llama_params(cfg, key, scale=0.4)
    p4, checks = int4_requant_from_int8_init(cfg, key, scale=0.4)
    assert isinstance(p4["layers"]["wq"], Int4Tensor)

    for name in ("wq", "wo", "w_down"):
        q8 = np.asarray(p8["layers"][name].q)
        # base-check slices reproduce the int8 init bitwise (threefry is
        # backend/counter deterministic)
        np.testing.assert_array_equal(checks[name],
                                      q8[0, :2, :min(64, q8.shape[-1])])
        w8 = q8.astype(np.float64) * np.asarray(
            p8["layers"][name].scale, np.float64)[..., None, :]
        w4 = np.asarray(_deq4(p4["layers"][name], jnp.float32), np.float64)
        # int4 quant error bound: half a step = amax/14 per channel (plus
        # f32 rounding of the stored scale: measured ~2e-8 absolute)
        step = np.abs(w8).max(axis=-2, keepdims=True) / 7.0
        assert np.all(np.abs(w8 - w4) <= 0.5 * step + 1e-6), name
    # embeds identical
    np.testing.assert_array_equal(np.asarray(p8["embed"]),
                                  np.asarray(p4["embed"]))

    gen = GenerationConfig(max_new_tokens=16, max_cache_len=256)
    prompt = np.random.default_rng(5).integers(3, 128, size=18).tolist()
    ar = ArBaseline(cfg, p4, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, p4, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


def test_int4_qwen2_family_kernel_lossless():
    """Packed int4 through the Pallas kernel on the Qwen2-family trunk
    (qkv biases stay high-precision and add AFTER the kernel matmul):
    fused engine == own int4 block-AR oracle."""
    from dataclasses import replace

    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params
    from samd_tpu.ops.quant import quantize_llama_params

    cfg = replace(_kernel_cfg(int4_impl="kernel_interpret"),
                  attn_bias=True, rope_theta=1e6)
    params = init_params(cfg, jax.random.PRNGKey(2), scale=0.4)
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    assert "bq" in q4["layers"] and not hasattr(q4["layers"]["bq"], "packed")
    gen = GenerationConfig(max_new_tokens=14, max_cache_len=128)
    prompt = np.random.default_rng(9).integers(3, 512, size=12).tolist()
    ar = ArBaseline(cfg, q4, max_cache_len=128, eos_token_id=-1,
                    prefill_buckets=(16,), block_size=8)
    eng = FusedSamEngine(cfg, q4,
                         FusedSamConfig(n_predicts=7, corpus_capacity=256),
                         max_cache_len=128, eos_token_id=-1,
                         prefill_buckets=(16,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


def test_int4_moe_family_lossless():
    """Packed int4 on the Mixtral-family trunk: expert stacks [L, E, in,
    out] quantize to Int4Tensor and dequantize through the XLA halves
    unpack inside the expert einsums (the kernel serves only 2D
    contractions — models/llama.py dispatch note); router stays
    high-precision.  Fused engine == own int4 block-AR oracle."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params, tiny_moe_config
    from samd_tpu.ops.quant import Int4Tensor, quantize_llama_params

    cfg = tiny_moe_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(3), scale=0.4)
    q4 = quantize_llama_params(params, dtype=jnp.int4)
    wg = q4["layers"]["w_gate"]
    assert isinstance(wg, Int4Tensor)
    assert wg.packed.ndim == 4 and not hasattr(q4["layers"]["router"],
                                               "packed")
    gen = GenerationConfig(max_new_tokens=14, max_cache_len=256)
    prompt = np.random.default_rng(10).integers(3, 128, size=14).tolist()
    ar = ArBaseline(cfg, q4, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, q4,
                         FusedSamConfig(n_predicts=7, corpus_capacity=256),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids


def test_int4_requant_layer_chunked_matches_format():
    """layer_chunk draws bound the randint transient (13B path); chunked
    trees serve the engine losslessly and keep the packed format (the
    draws differ from the unchunked base by design — same distribution)."""
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.ops.quant import (Int4Tensor,
                                    int4_requant_from_int8_init)

    cfg = tiny_config(vocab_size=128)
    p4, checks = int4_requant_from_int8_init(cfg, jax.random.PRNGKey(1),
                                             scale=0.4, layer_chunk=1)
    wq = p4["layers"]["wq"]
    assert isinstance(wq, Int4Tensor)
    assert wq.packed.shape == (cfg.num_layers, cfg.hidden_size,
                               cfg.num_heads * cfg.head_dim // 2)
    assert checks["wq"].shape[0] == 2
    gen = GenerationConfig(max_new_tokens=12, max_cache_len=256)
    prompt = np.random.default_rng(6).integers(3, 128, size=14).tolist()
    ar = ArBaseline(cfg, p4, max_cache_len=256, eos_token_id=-1,
                    prefill_buckets=(32,), block_size=8)
    eng = FusedSamEngine(cfg, p4, FusedSamConfig(n_predicts=7),
                         max_cache_len=256, eos_token_id=-1,
                         prefill_buckets=(32,))
    assert eng.generate(prompt, gen).output_ids == \
        ar.generate(prompt, gen).output_ids
