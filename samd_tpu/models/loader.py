"""Checkpoint loading: HF weights (Llama / Qwen2 / Mixtral families) →
samd_tpu parameter pytree.

Consumes either a transformers model directory (safetensors / pytorch .bin)
or an in-memory state dict.  The reference loads targets with
``AutoModelForCausalLM.from_pretrained``
(/root/reference/evaluation/inference_samd.py:157-163); here weights are
converted once into the stacked-layer layout that ``lax.scan`` consumes and
cast to the serving dtype.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from .configs import ModelConfig, from_hf_config
from .llama import Params


def _iter_checkpoint_tensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, array) from safetensors shards or pytorch .bin files."""
    entries = sorted(os.listdir(model_dir))
    st_files = [f for f in entries if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file  # ships with transformers
        for f in st_files:
            for name, arr in load_file(os.path.join(model_dir, f)).items():
                yield name, arr
        return
    bin_files = [f for f in entries if f.endswith(".bin")]
    if not bin_files:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    import torch
    for f in bin_files:
        sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                        weights_only=True)
        for name, t in sd.items():
            yield name, t.to(torch.float32).numpy()


def load_llama(model_dir: str, dtype=jnp.bfloat16) -> Tuple[ModelConfig, Params]:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    cfg = from_hf_config(_Cfg(hf_cfg), dtype=dtype)
    return cfg, convert_state_dict(
        dict(_iter_checkpoint_tensors(model_dir)), cfg)


# `load_llama` predates the Qwen2/Mixtral families; it dispatches on the
# checkpoint's config.json model_type, so it is the generic loader.
load_model = load_llama


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: ModelConfig) -> Params:
    """Convert an HF state dict (numpy arrays or torch tensors) into the
    stacked-layer pytree of samd_tpu.models.llama.  Handles the three
    target families the reference's vendored modeling files cover
    (SURVEY.md §2: modeling_llama/qwen2/mixtral_kv.py): Qwen2 adds qkv
    biases (cfg.attn_bias), Mixtral adds per-layer expert stacks + router
    (cfg.num_experts).

    HF linear weights are [out, in]; ours are [in, out] (x @ W)."""

    def get(name):
        arr = sd[name]
        if hasattr(arr, "detach"):  # torch tensor
            arr = arr.detach().to_dense().float().numpy()
        return np.asarray(arr, dtype=np.float32)

    def linear(name):
        return get(name).T  # [in, out]

    L, E = cfg.num_layers, cfg.num_experts
    stacked = {
        "attn_norm": [], "wq": [], "wk": [], "wv": [], "wo": [],
        "mlp_norm": [], "w_gate": [], "w_up": [], "w_down": [],
    }
    if cfg.attn_bias:
        stacked.update({"bq": [], "bk": [], "bv": []})
    if E:
        stacked["router"] = []
    for i in range(L):
        p = f"model.layers.{i}."
        stacked["attn_norm"].append(get(p + "input_layernorm.weight"))
        stacked["wq"].append(linear(p + "self_attn.q_proj.weight"))
        stacked["wk"].append(linear(p + "self_attn.k_proj.weight"))
        stacked["wv"].append(linear(p + "self_attn.v_proj.weight"))
        stacked["wo"].append(linear(p + "self_attn.o_proj.weight"))
        stacked["mlp_norm"].append(get(p + "post_attention_layernorm.weight"))
        if cfg.attn_bias:
            stacked["bq"].append(get(p + "self_attn.q_proj.bias"))
            stacked["bk"].append(get(p + "self_attn.k_proj.bias"))
            stacked["bv"].append(get(p + "self_attn.v_proj.bias"))
        if E:
            # Mixtral: w1=gate [I,H], w3=up [I,H], w2=down [H,I] per expert
            m = p + "block_sparse_moe."
            stacked["router"].append(linear(m + "gate.weight"))
            stacked["w_gate"].append(np.stack(
                [linear(f"{m}experts.{e}.w1.weight") for e in range(E)]))
            stacked["w_up"].append(np.stack(
                [linear(f"{m}experts.{e}.w3.weight") for e in range(E)]))
            stacked["w_down"].append(np.stack(
                [linear(f"{m}experts.{e}.w2.weight") for e in range(E)]))
        else:
            stacked["w_gate"].append(linear(p + "mlp.gate_proj.weight"))
            stacked["w_up"].append(linear(p + "mlp.up_proj.weight"))
            stacked["w_down"].append(linear(p + "mlp.down_proj.weight"))

    params: Params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "layers": {k: jnp.asarray(np.stack(v), cfg.dtype)
                   for k, v in stacked.items()},
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = jnp.asarray(linear("lm_head.weight"), cfg.dtype)
        else:
            params["lm_head"] = params["embed"].T
    return params
