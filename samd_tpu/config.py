"""Configuration dataclasses for the TPU-native SAM-Decoding engine.

Mirrors the knob surface of the reference configs
(/root/reference/samd/samd_config.py:9-43 and
/root/reference/samd_sam_only/samd_config.py:9-17) but as one unified config:
the reference's ``samd`` vs ``samd_sam_only`` package split becomes the
``draft_source`` field here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional


@dataclass
class SamdConfig:
    """Speculative-decoding policy knobs.

    draft_source:
      * "sam_hybrid" – SAM sequence drafts when the suffix match is long,
        otherwise a model-based tree drafter (reference ``samd`` package,
        policy at /root/reference/samd/draft.py:52-63).
      * "sam_only"  – SAM drafts always: dynamic-SAM sequence draft vs
        static-SAM frequency tree by match-length comparison (reference
        ``samd_sam_only``, policy at /root/reference/samd_sam_only/draft.py:49-59).
    """

    draft_source: Literal["sam_hybrid", "sam_only"] = "sam_only"

    # --- shared ---
    len_bias: int = 5            # distrust margin subtracted from static match
    max_predicts: int = 60       # verify-block size M (static shape under jit)

    # --- sam_hybrid knobs (reference samd_config.py:10-13) ---
    n_predicts: int = 40         # sequence-draft length for hybrid mode
    len_threshold: int = 5       # min match length to prefer SAM over tree model
    tree_method: Literal["token_recycle", "eagle", "eagle2"] = "token_recycle"
    tree_adjacency: Optional[list] = None   # static tree topology (BFS adjacency)
    tree_model_path: Optional[str] = None   # EAGLE draft-net weights

    # --- sam_only knobs (reference samd_sam_only/samd_config.py:10-13) ---
    alpha: float = 4.0           # adaptive draft length = 1 + match_len * alpha
    tree_topk: int = 8           # K: frequency-tree branching / per-depth cap

    # --- EAGLE-2 knobs (reference eagle2_model.py:583-629) ---
    eagle_depth: int = 5
    eagle_topk: int = 8
    eagle_total_tokens: int = 63  # tree size = total_tokens + 1 (root)

    # --- verify-shape knobs (TPU-only: static shapes for one compiled step) ---
    max_tree_paths: Optional[int] = None    # R; defaults to max_predicts
    max_tree_depth: Optional[int] = None    # D; defaults to max_predicts

    # --- host-engine knobs ---
    use_native_sam: bool = True  # C++ SAM engine when a toolchain is present

    def __post_init__(self):
        if self.max_tree_paths is None:
            self.max_tree_paths = self.max_predicts
        if self.max_tree_depth is None:
            self.max_tree_depth = self.max_predicts


@dataclass
class GenerationConfig:
    """Per-request generation knobs (reference ``SamdGenerationConfig``,
    /root/reference/samd/utils.py:30-63)."""

    max_new_tokens: int = 512
    max_steps: int = 512
    max_cache_len: int = 2048
    greedy: bool = True
    temperature: float = 0.0
    top_p: float = 0.0
    top_k: int = 0
    seed: int = 0
    # Acceptance rule for sampling mode:
    #   "rejection" – speculative rejection sampling (distribution-
    #                 preserving; reference samd/utils.py:142-184)
    #   "typical"   – entropy-adaptive posterior mask (reference
    #                 evaluation/model/token_recycle/utils.py:356-384)
    #   "nucleus"   – top-p posterior mask (reference
    #                 evaluation/model/token_recycle/utils.py:235-290)
    accept_mode: Literal["rejection", "typical", "nucleus"] = "rejection"
    posterior_threshold: float = 0.3   # typical-acceptance cap
    posterior_alpha: float = 0.09      # typical-acceptance entropy scale

    def __post_init__(self):
        if not self.greedy and self.temperature < 1e-5:
            raise ValueError("sampling requires temperature >= 1e-5")
        if self.accept_mode == "nucleus" and not self.greedy \
                and not (0.0 < self.top_p <= 1.0):
            raise ValueError("nucleus acceptance requires 0 < top_p <= 1")

    @property
    def sampling_signature(self) -> tuple:
        """Static knobs that select one compiled sampling step."""
        return (self.temperature, self.top_p, self.top_k, self.accept_mode,
                self.posterior_threshold, self.posterior_alpha)
