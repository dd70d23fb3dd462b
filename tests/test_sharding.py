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
