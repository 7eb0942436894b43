from .mesh import make_mesh
from .sp import SPContext, pad_tokens_for_sp
from .ulysses import make_ulysses_attention
from .ring import make_ring_attention
from .sharding import fsdp_param_sharding, replicate

__all__ = ["make_mesh", "make_ulysses_attention", "make_ring_attention",
           "pad_tokens_for_sp", "SPContext", "fsdp_param_sharding",
           "replicate"]
