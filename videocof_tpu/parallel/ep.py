"""Expert-parallel weight residency for the Wan2.2-style temporal MoE.

Wan2.2 routes by *denoising phase*, not by token: every token uses the
high-noise expert for t >= boundary and the low-noise expert after
(`wan22_pipeline.py`). Token-routing expert parallelism therefore does not
apply — at any step exactly one expert is live. What multi-chip placement
CAN buy is *residency*: with both 14B experts fp8-quantized, one 16 GB chip
cannot hold the pair, but an expert-sharded placement keeps each expert's
weights on half the mesh and XLA all-gathers the selected expert's layers
on demand inside the step (amortized across the scan; phase switches happen
once per trajectory, so the gather traffic is one weight-set per phase —
the TPU equivalent of the reference's sequential CPU offload, riding ICI
instead of PCIe).

Mechanics: `stack_experts` stacks the expert param trees on a leading
expert axis, `ep_param_shardings` shards that axis over a mesh axis, and
`select_expert(stacked, k)` (k may be a traced int — phase is
data-independent but can ride the fused trajectory's step index) is a
`dynamic_index_in_dim` whose gather XLA turns into the expert-group
broadcast. Composes with tensor parallelism: pass `inner=tp_param_shardings
specs` to shard the non-expert dims too.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_experts(*expert_params: Any) -> Any:
    """[E, ...]-stack structurally identical expert param trees."""
    import jax.numpy as jnp
    return jax.tree.map(lambda *xs: jnp.stack(xs), *expert_params)


def ep_param_shardings(mesh: Mesh, stacked: Any, axis: str = "data",
                       inner: Optional[Any] = None) -> Any:
    """Shard the leading expert axis over ``axis``. ``inner`` optionally
    supplies a matching pytree of PartitionSpecs for the dims BELOW the
    expert axis (e.g. built from `parallel.tp._spec_for`) to compose
    EP x TP placements."""
    if inner is None:
        return jax.tree.map(
            lambda leaf: NamedSharding(
                mesh, P(axis, *([None] * (leaf.ndim - 1)))), stacked)

    def rule(leaf, spec):
        rest = list(spec) + [None] * (leaf.ndim - 1 - len(list(spec)))
        return NamedSharding(mesh, P(axis, *rest))

    return jax.tree.map(rule, stacked, inner)


def select_expert(stacked: Any, index) -> Any:
    """Materialize expert ``index`` (python int or traced scalar) from the
    expert-sharded stack; under jit this lowers to the expert-group gather."""
    return jax.tree.map(
        lambda leaf: jax.lax.dynamic_index_in_dim(leaf, index, 0,
                                                  keepdims=False), stacked)
