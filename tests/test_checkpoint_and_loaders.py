"""Checkpoint (orbax) and HF-directory loader tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.models import init_params, tiny_config
from samd_tpu.models.checkpoint import load_params, save_params


def test_orbax_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_params(str(tmp_path / "ckpt"), params, cfg)
    cfg2, params2 = load_params(str(tmp_path / "ckpt"))
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_load_llama_from_hf_dir(tmp_path):
    """load_llama consumes a saved HF checkpoint directory (safetensors)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models import forward, prefill_mask
    from samd_tpu.models.loader import load_llama

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(str(tmp_path / "hf"))

    cfg, params = load_llama(str(tmp_path / "hf"), dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.vocab_size == 256

    tokens = np.random.default_rng(0).integers(0, 256, size=(1, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    kv_k, kv_v = init_kv_cache(cfg, 1, 32)
    logits, _, _, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                              jnp.arange(9)[None], kv_k, kv_v, jnp.int32(0),
                              prefill_mask(1, 9, 32))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_eagle_state_dict_conversion():
    """convert_eagle_state_dict maps an official-layout EAGLE checkpoint."""
    torch = pytest.importorskip("torch")

    from samd_tpu.drafters.eagle.net import (
        EagleNetConfig,
        convert_eagle_state_dict,
        eagle_forward,
        init_eagle_kv,
    )
    from samd_tpu.models import tiny_config

    cfg = EagleNetConfig.from_target(tiny_config())
    H, I = cfg.hidden_size, cfg.intermediate_size
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    torch.manual_seed(0)
    sd = {
        "fc.weight": torch.randn(H, 2 * H),
        "fc.bias": torch.randn(H),
        "layers.0.self_attn.q_proj.weight": torch.randn(NH * D, H),
        "layers.0.self_attn.k_proj.weight": torch.randn(KH * D, H),
        "layers.0.self_attn.v_proj.weight": torch.randn(KH * D, H),
        "layers.0.self_attn.o_proj.weight": torch.randn(H, NH * D),
        "layers.0.post_attention_layernorm.weight": torch.randn(H),
        "layers.0.mlp.gate_proj.weight": torch.randn(I, H),
        "layers.0.mlp.up_proj.weight": torch.randn(I, H),
        "layers.0.mlp.down_proj.weight": torch.randn(H, I),
    }
    params = convert_eagle_state_dict(sd, cfg)
    assert params["fc_w"].shape == (2 * H, H)
    assert params["wq"].shape == (H, NH * D)
    # forward runs with converted params
    kv_k, kv_v = init_eagle_kv(cfg, 1, 16)
    h, _, _ = eagle_forward(
        params, cfg, jnp.ones((1, 2, H)), jnp.ones((1, 2, H)),
        jnp.arange(2)[None], kv_k, kv_v, jnp.int32(0),
        jnp.ones((1, 2, 16), bool))
    assert h.shape == (1, 2, H)
    assert not bool(jnp.isnan(h.astype(jnp.float32)).any())
