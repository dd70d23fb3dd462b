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


def make_drafter(samd_cfg, vocab_size, *, static_sam=None, model_cfg=None,
                 params=None, eagle_net_params=None):
    """Assemble the drafter stack for a SamdConfig (reference equivalent:
    DraftModel construction in /root/reference/evaluation/inference_samd.py:175-198).

    ``tree_method="eagle2"`` additionally needs the target's ``model_cfg`` and
    ``params`` (the draft net shares its embedding and lm_head); pass
    ``eagle_net_params`` converted from an official EAGLE checkpoint
    (samd_tpu.drafters.eagle.net.convert_eagle_state_dict), or omit it for a
    random-initialized draft net."""
    tree_drafter = None
    if samd_cfg.draft_source == "sam_hybrid":
        if samd_cfg.tree_method == "token_recycle":
            parents = None
            if samd_cfg.tree_adjacency is not None:
                from ..sam.trees import adjacency_to_parents
                parents = adjacency_to_parents(samd_cfg.tree_adjacency)
            tree_drafter = TokenRecycleDrafter(
                vocab_size, parents=parents,
                max_nodes=samd_cfg.max_predicts,
                topk=samd_cfg.tree_topk)
        elif samd_cfg.tree_method == "eagle2":
            if model_cfg is None or params is None:
                raise ValueError("eagle2 needs model_cfg and params")
            from .eagle.drafter import make_eagle2

            tree_drafter = make_eagle2(model_cfg, params, samd_cfg,
                                       net_params=eagle_net_params)
        elif samd_cfg.tree_method == "eagle":
            if model_cfg is None or params is None:
                raise ValueError("eagle needs model_cfg and params")
            from .eagle.eagle1 import make_eagle1

            tree_drafter = make_eagle1(model_cfg, params, samd_cfg,
                                       net_params=eagle_net_params)
        else:
            raise NotImplementedError(
                f"tree_method {samd_cfg.tree_method!r} not yet wired")
    return AdaptiveSelector(samd_cfg, static_sam=static_sam,
                            tree_drafter=tree_drafter)
