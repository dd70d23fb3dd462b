"""Checkpoint save/restore for engine parameters (orbax).

The reference loads weights only through HF ``from_pretrained`` and pickles
SAMs (SURVEY.md §5).  Here converted/quantized parameter pytrees are saved
once via orbax and restored mmap-fast at serving time, so the torch→JAX
conversion cost is paid once per model.
"""

from __future__ import annotations

import os
from typing import Tuple

from .configs import ModelConfig
from .llama import Params


def save_params(path: str, params: Params, cfg: ModelConfig) -> None:
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    meta = dataclasses.asdict(cfg)
    meta["dtype"] = str(cfg.dtype.__name__ if hasattr(cfg.dtype, "__name__")
                        else cfg.dtype)
    with open(os.path.join(path, "model_config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_params(path: str) -> Tuple[ModelConfig, Params]:
    import json

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "model_config.json")) as f:
        meta = json.load(f)
    meta["dtype"] = getattr(jnp, meta["dtype"])
    cfg = ModelConfig(**meta)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    return cfg, params
