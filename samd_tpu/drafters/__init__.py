from .base import Draft, Drafter
from .sam_drafter import AdaptiveSelector
from .token_recycle import TokenRecycleDrafter
from .tree_topology import (
    child_ranks,
    load_topology,
    rank_probability_tree,
    save_topology,
)

__all__ = [
    "Draft", "Drafter", "AdaptiveSelector", "TokenRecycleDrafter",
    "rank_probability_tree", "child_ranks", "save_topology", "load_topology",
]


def make_drafter(samd_cfg, vocab_size, *, static_sam=None):
    """Assemble the drafter stack for a SamdConfig (reference equivalent:
    DraftModel construction in /root/reference/evaluation/inference_samd.py:175-198)."""
    tree_drafter = None
    if samd_cfg.draft_source == "sam_hybrid":
        if samd_cfg.tree_method == "token_recycle":
            import numpy as np

            parents = None
            if samd_cfg.tree_adjacency is not None:
                from ..sam.trees import adjacency_to_parents
                parents = adjacency_to_parents(samd_cfg.tree_adjacency)
            tree_drafter = TokenRecycleDrafter(
                vocab_size, parents=parents,
                max_nodes=samd_cfg.max_predicts,
                max_paths=samd_cfg.max_tree_paths,
                max_depth=samd_cfg.max_tree_depth,
                topk=samd_cfg.tree_topk)
        else:
            raise NotImplementedError(
                f"tree_method {samd_cfg.tree_method!r} not yet wired")
    return AdaptiveSelector(samd_cfg, static_sam=static_sam,
                            tree_drafter=tree_drafter)
