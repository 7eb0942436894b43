"""Parameter/activation sharding rules.

FSDP in the reference is a torch runtime wrapper (`videox_fun/dist/fsdp.py`);
on TPU it is just a sharding annotation: shard each large parameter's biggest
axis across the ``data`` mesh axis and let pjit insert all-gathers/reduce-
scatters (the "How to Scale Your Model" recipe).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, params: Any, axis: str = "data",
                        min_size: int = 2 ** 16) -> Any:
    """A NamedSharding pytree for ``params``: leaves >= min_size elements get
    their largest divisible axis sharded over ``axis``; everything else is
    replicated."""
    n = mesh.shape[axis]

    def rule(leaf):
        if leaf.size < min_size or n == 1:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        order = np.argsort(dims)[::-1]
        for d in order:
            if dims[d] % n == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
