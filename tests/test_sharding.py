"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates that the engine compiles and runs under GSPMD tensor parallelism
and that TP sharding does not change greedy outputs.
"""

import numpy as np
import pytest

import jax

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import SamdEngine
from samd_tpu.models import init_params
from samd_tpu.models.configs import ModelConfig
from samd_tpu.parallel import make_mesh, param_specs, shard_params


def shardable_config():
    return ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=8,
        max_position_embeddings=512, dtype=jax.numpy.float32)


def test_mesh_creation():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, dp=2)
    assert dict(mesh.shape) == {"dp": 2, "pp": 1, "ep": 1, "tp": 4}
    mesh = make_mesh(8, dp=1, pp=2)
    assert dict(mesh.shape) == {"dp": 1, "pp": 2, "ep": 1, "tp": 4}
    mesh = make_mesh(8, ep=2)
    assert dict(mesh.shape) == {"dp": 1, "pp": 1, "ep": 2, "tp": 4}


def test_param_sharding_layout():
    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, dp=1)
    sharded = shard_params(params, mesh, cfg)
    wq = sharded["layers"]["wq"]
    # column-parallel: local shard holds 1/8 of the output dim
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(cfg.num_layers, 64, 64 // 8 * 8 // 8)} or all(
        s.data.shape[2] == wq.shape[2] // 8 for s in wq.addressable_shards)


def test_tp_engine_matches_single_device():
    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(1), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=128)
    prompt = np.random.default_rng(0).integers(3, 256, size=16).tolist()

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    ref = single.generate(prompt, gen)

    mesh = make_mesh(8, dp=1)
    tp = SamdEngine(cfg, params, samd_cfg,
                    make_drafter(samd_cfg, cfg.vocab_size),
                    max_cache_len=128, eos_token_id=-1,
                    prefill_buckets=(32,), mesh=mesh)
    out = tp.generate(prompt, gen)
    assert out.output_ids == ref.output_ids
    assert out.decode_tokens == ref.decode_tokens


def test_pp_tp_engine_matches_single_device():
    """Pipeline (layer-axis) + tensor parallel: same greedy outputs."""
    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(1), scale=0.4)
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128)
    prompt = np.random.default_rng(3).integers(3, 256, size=16).tolist()

    single = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    ref = single.generate(prompt, gen)

    mesh = make_mesh(8, dp=1, pp=2)  # 2 stages x tp=4
    eng = SamdEngine(cfg, params, samd_cfg,
                     make_drafter(samd_cfg, cfg.vocab_size),
                     max_cache_len=128, eos_token_id=-1,
                     prefill_buckets=(32,), mesh=mesh)
    out = eng.generate(prompt, gen)
    assert out.output_ids == ref.output_ids


def test_dp_tp_batched_forward():
    """Exercise dp+tp jointly on a batched raw forward (the continuous-
    batching layout: batch over dp, heads over tp)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models.llama import forward, prefill_mask
    from samd_tpu.parallel import kv_spec

    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(2))
    mesh = make_mesh(8, dp=2)
    params = shard_params(params, mesh, cfg)
    B, T, S = 2, 8, 32
    kv_k, kv_v = init_kv_cache(cfg, B, S)
    sh = NamedSharding(mesh, kv_spec())
    kv_k, kv_v = jax.device_put(kv_k, sh), jax.device_put(kv_v, sh)
    tokens = jax.device_put(
        jax.numpy.ones((B, T), jax.numpy.int32),
        NamedSharding(mesh, P("dp", None)))
    pos = jax.numpy.broadcast_to(jax.numpy.arange(T)[None], (B, T))
    logits, _, kv_k, kv_v = jax.jit(forward, static_argnums=1)(
        params, cfg, tokens, pos, kv_k, kv_v, jax.numpy.int32(0),
        prefill_mask(B, T, S))
    assert logits.shape == (B, T, cfg.vocab_size)
    assert not bool(jax.numpy.isnan(logits).any())


def test_sequence_parallel_prefill():
    """Sequence-sharded prefill: queries split over the tp axis; GSPMD
    gathers KV — logits must match the unsharded prefill exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models.llama import forward, prefill_mask

    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(4), scale=0.4)
    B, T, S = 1, 32, 64
    tokens = jax.numpy.asarray(
        np.random.default_rng(0).integers(3, 256, size=(B, T)),
        jax.numpy.int32)
    pos = jax.numpy.arange(T)[None]
    mask = prefill_mask(B, T, S)

    kv_k, kv_v = init_kv_cache(cfg, B, S)
    ref, _, _, _ = jax.jit(forward, static_argnums=1)(
        params, cfg, tokens, pos, kv_k, kv_v, jax.numpy.int32(0), mask)

    mesh = make_mesh(8, dp=1)
    sp = NamedSharding(mesh, P(None, "tp"))          # sequence over tp
    sp3 = NamedSharding(mesh, P(None, "tp", None))   # mask rows over tp
    params_s = shard_params(params, mesh, cfg)
    kv_k, kv_v = init_kv_cache(cfg, B, S)
    out, _, _, _ = jax.jit(forward, static_argnums=1)(
        params_s, cfg, jax.device_put(tokens, sp), jax.device_put(pos, sp),
        kv_k, kv_v, jax.numpy.int32(0), jax.device_put(mask, sp3))
    # partitioned reductions may reorder float sums; argmax must agree and
    # values must match to float tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
    assert (np.asarray(out).argmax(-1) == np.asarray(ref).argmax(-1)).all()


def test_sequence_parallel_decode():
    """Decode-time sequence parallelism (VERDICT r01 item 9): KV sharded
    along S over the 8-device axis (S_local=8 << context), multi-step
    greedy decode matches the unsharded forward's tokens exactly."""
    import jax.numpy as jnp
    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models.llama import (
        block_decode_mask,
        forward,
        prefill_mask,
    )
    from samd_tpu.parallel.seq_parallel import make_sp_forward, shard_kv_seq

    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(5), scale=0.4)
    B, T0, S = 1, 24, 64  # S_local = 8 < prompt length
    tokens = jax.numpy.asarray(
        np.random.default_rng(1).integers(3, 256, size=(B, T0)),
        jax.numpy.int32)

    mesh = make_mesh(8, dp=1)
    sp_fwd = make_sp_forward(cfg, mesh)

    # reference: unsharded prefill + AR decode
    kv_k, kv_v = init_kv_cache(cfg, B, S)
    ref_logits, _, kv_k, kv_v = jax.jit(forward, static_argnums=1)(
        params, cfg, tokens, jnp.arange(T0)[None], kv_k, kv_v,
        jnp.int32(0), prefill_mask(B, T0, S))
    ref_tokens = [int(ref_logits[0, T0 - 1].argmax())]
    chain_mask = jnp.ones((1, 1), bool)
    for step in range(8):
        cl = T0 + step
        lo, _, kv_k, kv_v = jax.jit(forward, static_argnums=1)(
            params, cfg, jnp.asarray([[ref_tokens[-1]]], jnp.int32),
            jnp.asarray([[cl]], jnp.int32), kv_k, kv_v, jnp.int32(cl),
            block_decode_mask(chain_mask, jnp.int32(cl), S))
        ref_tokens.append(int(lo[0, 0].argmax()))

    # sequence-parallel: same schedule with the KV sharded along S
    kv_k, kv_v = init_kv_cache(cfg, B, S)
    kv_k, kv_v = shard_kv_seq(kv_k, kv_v, mesh)
    sp_logits, _, kv_k, kv_v = sp_fwd(
        params, tokens, jnp.arange(T0)[None], kv_k, kv_v,
        jnp.int32(0), prefill_mask(B, T0, S))
    sp_tokens = [int(sp_logits[0, T0 - 1].argmax())]
    for step in range(8):
        cl = T0 + step
        lo, _, kv_k, kv_v = sp_fwd(
            params, jnp.asarray([[sp_tokens[-1]]], jnp.int32),
            jnp.asarray([[cl]], jnp.int32), kv_k, kv_v, jnp.int32(cl),
            block_decode_mask(chain_mask, jnp.int32(cl), S))
        sp_tokens.append(int(lo[0, 0].argmax()))

    assert sp_tokens == ref_tokens
    # prefill logits agree to float tolerance (reduction reorder only)
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# int4 × GSPMD composition (VERDICT r4 #5)
# ---------------------------------------------------------------------------

def _int4_kernel_cfg():
    """256-divisible contraction dims (kernel constraint) AND tp=8-divisible
    heads/intermediate/vocab."""
    return ModelConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
        max_position_embeddings=512, dtype=jax.numpy.float32,
        int4_impl="kernel_interpret")


def test_int4_kernel_forward_under_tp_mesh_matches_unsharded():
    """forward() with packed-int4 weights through the Pallas kernel
    (interpret mode) under a tp=8 mesh reproduces the unsharded result.

    Composition (parallel/sharding._put_leaf): the kernel is an
    unpartitioned custom call, so Int4Tensor leaves replicate over "tp"
    while the KV cache/embed shard normally — GSPMD runs the custom call
    whole on each device and shards everything around it."""
    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models.llama import forward, prefill_mask
    from samd_tpu.ops.quant import Int4Tensor, quantize_llama_params
    from samd_tpu.parallel import kv_spec
    from jax.sharding import NamedSharding

    cfg = _int4_kernel_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    q4 = quantize_llama_params(params, dtype=jax.numpy.int4)
    B, T, S = 1, 8, 32
    toks = (jax.numpy.arange(B * T, dtype=jax.numpy.int32).reshape(B, T)
            % cfg.vocab_size)
    pos = jax.numpy.arange(T, dtype=jax.numpy.int32)[None]
    mask = prefill_mask(B, T, S)
    kv_k, kv_v = init_kv_cache(cfg, B, S)
    ref = jax.jit(forward, static_argnums=1)(
        q4, cfg, toks, pos, kv_k, kv_v, jax.numpy.int32(0), mask)[0]

    mesh = make_mesh(8, dp=1)
    q4s = shard_params(q4, mesh, cfg)
    assert isinstance(q4s["layers"]["wq"], Int4Tensor)
    # packed weights replicated over tp (single full-size shard per device)
    packed = q4s["layers"]["wq"].packed
    assert all(s.data.shape == packed.shape
               for s in packed.addressable_shards)
    sh = NamedSharding(mesh, kv_spec())
    kv_k2, kv_v2 = init_kv_cache(cfg, B, S)
    kv_k2, kv_v2 = jax.device_put(kv_k2, sh), jax.device_put(kv_v2, sh)
    got = jax.jit(forward, static_argnums=1)(
        q4s, cfg, toks, pos, kv_k2, kv_v2, jax.numpy.int32(0), mask)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_int4_matmul_tp_shard_map_matches_dense():
    """ops.int4_matmul.int4_matmul_tp (explicit shard_map partition over the
    out-halves axis — the per-shard weight-streaming form for multi-chip
    serving) matches the single-device kernel for 2D and stacked weights."""
    from samd_tpu.ops.int4_matmul import int4_matmul, int4_matmul_tp
    from samd_tpu.ops.quant import quantize_weight4

    mesh = make_mesh(8, dp=1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (8, 512)).astype(jax.numpy.float32)
    qt = quantize_weight4(jax.random.normal(k2, (512, 256)))
    ref = np.asarray(int4_matmul(x, qt.packed, qt.scale, interpret=True))
    got = np.asarray(jax.jit(
        lambda x, p, s: int4_matmul_tp(mesh, x, p, s, interpret=True)
    )(x, qt.packed, qt.scale))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    # stacked [L, in, out/2] with a traced layer index
    packed = jax.numpy.stack([quantize_weight4(
        jax.random.normal(jax.random.PRNGKey(i), (512, 256))).packed
        for i in range(3)])
    scale = jax.numpy.stack([quantize_weight4(
        jax.random.normal(jax.random.PRNGKey(i), (512, 256))).scale
        for i in range(3)])
    for layer in (0, 2):
        ref = np.asarray(int4_matmul(x, packed, scale,
                                     jax.numpy.int32(layer), interpret=True))
        got = np.asarray(jax.jit(
            lambda x, p, s, l: int4_matmul_tp(mesh, x, p, s, l,
                                              interpret=True)
        )(x, packed, scale, jax.numpy.int32(layer)))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_int8_quantized_params_shard_under_tp():
    """QuantizedTensor (int8) leaves shard like their bf16 counterparts:
    q follows the weight spec, per-channel scales follow the out axis —
    and the tp engine still matches the unsharded int8 engine."""
    from samd_tpu.ops.quant import QuantizedTensor, quantize_llama_params

    cfg = shardable_config()
    params = init_params(cfg, jax.random.PRNGKey(1), scale=0.4)
    q8 = quantize_llama_params(params)
    mesh = make_mesh(8, dp=1)
    q8s = shard_params(q8, mesh, cfg)
    wq = q8s["layers"]["wq"]
    assert isinstance(wq, QuantizedTensor)
    assert all(s.data.shape[2] == wq.q.shape[2] // 8
               for s in wq.q.addressable_shards)
    assert all(s.data.shape[1] == wq.scale.shape[1] // 8
               for s in wq.scale.addressable_shards)

    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    gen = GenerationConfig(max_new_tokens=16, max_cache_len=128)
    prompt = np.random.default_rng(4).integers(3, 256, size=12).tolist()
    single = SamdEngine(cfg, q8, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=128, eos_token_id=-1,
                        prefill_buckets=(32,))
    ref = single.generate(prompt, gen)
    tp = SamdEngine(cfg, q8, samd_cfg,
                    make_drafter(samd_cfg, cfg.vocab_size),
                    max_cache_len=128, eos_token_id=-1,
                    prefill_buckets=(32,), mesh=mesh)
    out = tp.generate(prompt, gen)
    assert out.output_ids == ref.output_ids
