"""samd_tpu — a TPU-native speculative-decoding inference engine.

A from-scratch JAX/XLA/Pallas re-design of retrieval-based speculative
decoding with suffix automata (SAM-Decoding), plus model-based tree drafters
(Token Recycle, EAGLE/EAGLE-2), a single jitted verify/accept/rollback decode
step with static shapes, fused device-resident decode loops, continuous
batching, and pjit/mesh sharding for multi-chip serving.

Engine quick reference (all share greedy-equality with the AR baseline):
  * engine.SamdEngine           — host SAM automata + jitted verify step
  * engine.ArBaseline           — autoregressive baseline / equality oracle
  * batching.BatchedSamdEngine  — continuous batching over the host engine
  * fused_sam.FusedSamEngine    — device-resident SAM-style retrieval (flagship)
  * fused_sam.BatchedFusedSamEngine — batching x fusion
  * pld.PldEngine               — device-resident prompt-lookup decoding
  * token_recycle_fused.FusedTokenRecycleEngine — device-resident Token-Recycle
"""

from .config import GenerationConfig, SamdConfig

__version__ = "0.1.0"

__all__ = ["SamdConfig", "GenerationConfig", "__version__"]
