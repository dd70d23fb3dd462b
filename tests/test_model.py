"""Numerical parity of the JAX Llama against HF transformers (fp32, CPU).

This is the golden test anchoring the whole engine: if the forward matches HF,
then verify-step logits match AR logits by construction (same function), and
greedy equality of speculative vs autoregressive output follows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.cache import init_kv_cache
from samd_tpu.models import (
    block_decode_mask,
    forward,
    prefill_mask,
    tiny_config,
)
from samd_tpu.models.loader import convert_state_dict


@pytest.fixture(scope="module")
def hf_model_and_params():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = tiny_config()
    params = convert_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_forward_matches_hf(hf_model_and_params):
    import torch
    model, cfg, params = hf_model_and_params
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 17), dtype=np.int64)

    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()

    S = 64
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    pos = jnp.arange(17)[None, :]
    mask = prefill_mask(1, 17, S)
    logits, _, _, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                              pos, kv_k, kv_v, jnp.int32(0), mask)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_incremental_decode_matches_full_forward(hf_model_and_params):
    """Prefill + token-by-token decode through the KV cache must reproduce
    the logits of one full forward pass."""
    _, cfg, params = hf_model_and_params
    rng = np.random.default_rng(1)
    T = 12
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, T)), jnp.int32)

    S = 32
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    full_logits, _, _, _ = forward(
        params, cfg, tokens, jnp.arange(T)[None, :], kv_k, kv_v,
        jnp.int32(0), prefill_mask(1, T, S))

    # prefill 5, then decode one token at a time
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    P = 5
    logits_p, _, kv_k, kv_v = forward(
        params, cfg, tokens[:, :P], jnp.arange(P)[None, :], kv_k, kv_v,
        jnp.int32(0), prefill_mask(1, P, S))
    step_logits = [np.asarray(logits_p)[0, i] for i in range(P)]
    chain_mask = jnp.ones((1, 1), dtype=bool)
    for i in range(P, T):
        mask = block_decode_mask(chain_mask, jnp.int32(i), S)
        li, _, kv_k, kv_v = forward(
            params, cfg, tokens[:, i:i + 1], jnp.array([[i]]), kv_k, kv_v,
            jnp.int32(i), mask)
        step_logits.append(np.asarray(li)[0, 0])
    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full_logits)[0],
                               rtol=2e-4, atol=2e-4)


def test_tree_verify_matches_sequential(hf_model_and_params):
    """Verifying a draft *tree* in one forward must give each node the same
    logits as decoding its root-to-node path sequentially."""
    _, cfg, params = hf_model_and_params
    rng = np.random.default_rng(2)
    S = 48
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)), jnp.int32)

    # tree:  0 -> 1 -> 3 ; 0 -> 2 -> 4    (tokens arbitrary)
    parents = np.array([-1, 0, 0, 1, 2], dtype=np.int32)
    tree_tokens = rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)
    from samd_tpu.sam.trees import ancestor_closure, node_depths
    tree_mask = jnp.asarray(ancestor_closure(parents))
    depths = node_depths(parents)

    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    P = prompt.shape[1]
    _, _, kv_k, kv_v = forward(params, cfg, prompt, jnp.arange(P)[None, :],
                               kv_k, kv_v, jnp.int32(0), prefill_mask(1, P, S))

    mask = block_decode_mask(tree_mask, jnp.int32(P), S)
    pos = jnp.asarray(depths)[None, :] + P
    tree_logits, _, _, _ = forward(params, cfg, jnp.asarray(tree_tokens)[None, :],
                                   pos, kv_k, kv_v, jnp.int32(P), mask)
    tree_logits = np.asarray(tree_logits)[0]

    # sequential decode along path 0 -> 2 -> 4
    kv_k2, kv_v2 = init_kv_cache(cfg, 1, S)
    _, _, kv_k2, kv_v2 = forward(params, cfg, prompt, jnp.arange(P)[None, :],
                                 kv_k2, kv_v2, jnp.int32(0), prefill_mask(1, P, S))
    chain_mask = jnp.ones((1, 1), dtype=bool)
    seq_logits = []
    for j, node in enumerate([0, 2, 4]):
        mask1 = block_decode_mask(chain_mask, jnp.int32(P + j), S)
        li, _, kv_k2, kv_v2 = forward(
            params, cfg, jnp.array([[tree_tokens[node]]]), jnp.array([[P + j]]),
            kv_k2, kv_v2, jnp.int32(P + j), mask1)
        seq_logits.append(np.asarray(li)[0, 0])

    for j, node in enumerate([0, 2, 4]):
        np.testing.assert_allclose(tree_logits[node], seq_logits[j],
                                   rtol=2e-4, atol=2e-4)
