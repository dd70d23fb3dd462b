"""samd_tpu — a TPU-native speculative-decoding inference engine.

A from-scratch JAX/XLA/Pallas re-design of retrieval-based speculative
decoding with suffix automata (SAM-Decoding), plus model-based tree drafters
(Token Recycle, EAGLE/EAGLE-2), a single jitted verify/accept/rollback decode
step with static shapes, and pjit/mesh sharding for multi-chip serving.
"""

from .config import GenerationConfig, SamdConfig

__version__ = "0.1.0"

__all__ = ["SamdConfig", "GenerationConfig", "__version__"]
