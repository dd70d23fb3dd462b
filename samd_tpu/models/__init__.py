from .configs import (
    ModelConfig,
    from_hf_config,
    llama3_8b,
    llama_1b,
    llama_7b,
    tiny_config,
)
from .llama import (
    block_decode_mask,
    forward,
    init_params,
    param_count,
    prefill_mask,
)

__all__ = [
    "ModelConfig", "from_hf_config", "llama3_8b", "llama_1b", "llama_7b",
    "tiny_config", "forward", "init_params", "param_count",
    "prefill_mask", "block_decode_mask",
]
