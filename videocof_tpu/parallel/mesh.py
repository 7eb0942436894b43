"""Device mesh construction.

One mesh, two axes (SURVEY.md §2.4 mapping): ``data`` carries per-item data
parallelism (the reference's `pending_items[rank::world_size]` sharding and
FSDP weight sharding), ``seq`` carries Ulysses/ring sequence parallelism
(the reference's xfuser `initialize_model_parallel(ulysses, ring)` NCCL
groups). On multi-host TPU slices, ``seq`` should map to ICI-adjacent devices
(jax's default device order does this) and ``data`` may span DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, seq: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'seq', 'model') mesh. ``model`` carries Megatron-style tensor
    parallelism (heads/ffn sharding, `parallel/tp.py`) — a capability beyond
    the reference, whose xfuser setup only exposes ulysses/ring degrees. The
    model axis is innermost so TP's per-layer all-reduces ride the
    fastest ICI hops; singleton axes are free."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * seq * model
    if need > len(devices):
        raise ValueError(f"mesh {data}x{seq}x{model} needs {need} devices, "
                         f"have {len(devices)}")
    dev = np.array(devices[:need]).reshape(data, seq, model)
    return Mesh(dev, axis_names=("data", "seq", "model"))
