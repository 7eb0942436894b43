from .mesh import make_mesh
from .sp import (SPContext, joint_pad_masks, pad_rope_tables, pad_stream,
                 pad_tokens_for_sp)
from .ulysses import make_ulysses_attention
from .ring import make_ring_attention
from .sharding import fsdp_param_sharding, replicate
from .tp import make_tp_attention, tp_param_shardings, validate_tp
from .pp import pp_param_shardings, pp_scan_blocks
from .ep import ep_param_shardings, select_expert, stack_experts

__all__ = ["make_mesh", "make_ulysses_attention", "make_ring_attention",
           "pad_tokens_for_sp", "pad_stream", "pad_rope_tables",
           "joint_pad_masks", "SPContext", "fsdp_param_sharding",
           "replicate", "make_tp_attention", "tp_param_shardings",
           "validate_tp", "pp_param_shardings", "pp_scan_blocks",
           "ep_param_shardings", "select_expert", "stack_experts"]
