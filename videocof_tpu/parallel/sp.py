"""Whole-forward sequence-parallel context.

The reference chunks the entire token stream across ranks right after patch
embed and all_gathers after the head (`wan_transformer3d.py:949-953,
1085-1086`), so FFN/projections/AdaLN/head — about half the FLOPs — scale
with the sequence-parallel degree, not just attention. The TPU-native
equivalent is GSPMD sharding annotations: `SPContext` carries the mesh and
provides `with_sharding_constraint` helpers the DiT forward applies to the
residual stream, RoPE tables, and the head output. XLA then partitions every
per-token op over the ``seq`` axis; the only explicit collectives live in the
Ulysses/ring attention backends (shard_map), whose in_specs match these
constraints so no resharding is inserted at the boundary.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_tokens_for_sp(L: int, sp: int) -> int:
    """Sequence length rounded up to a multiple of the seq axis (the
    reference rounds seq_len the same way — `wan_transformer3d.py:904-905`)."""
    return ((L + sp - 1) // sp) * sp


@dataclasses.dataclass(frozen=True)
class SPContext:
    mesh: Mesh
    axis: str = "seq"
    data_axis: str = "data"
    # CFG parallelism (reference `dist/fuser.py:35-49`): the doubled
    # cond/uncond batch shards over the data axis, so each device group runs
    # ONE guidance branch instead of both. Enabled per-step by the pipeline
    # only when the batch actually carries both branches.
    cfg_parallel: bool = False

    @property
    def size(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def data_size(self) -> int:
        return self.mesh.shape[self.data_axis]

    def with_cfg_parallel(self) -> "SPContext":
        return dataclasses.replace(self, cfg_parallel=True)

    def padded_len(self, L: int) -> int:
        return pad_tokens_for_sp(L, self.size)

    # -- constraints (used inside jit) ------------------------------------
    def shard_batch(self, x: jax.Array) -> jax.Array:
        """[2B, ...]: shard the (CFG-doubled) batch over the data axis."""
        spec = [None] * x.ndim
        spec[0] = self.data_axis
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))

    def shard_tokens(self, x: jax.Array) -> jax.Array:
        """[B, L, ...]: shard the token axis (and, under CFG parallelism,
        the batch axis — P(None, ...) would otherwise force the batch
        replicated again)."""
        spec = [None] * x.ndim
        spec[1] = self.axis
        if self.cfg_parallel:
            spec[0] = self.data_axis
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))

    def shard_rope(self, x: jax.Array) -> jax.Array:
        """[L, D/2]: rope tables shard with the tokens."""
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(self.axis, None)))

    def gather(self, x: jax.Array) -> jax.Array:
        """Force a full (replicated-on-seq) layout — the head-exit all_gather
        (`wan_transformer3d.py:1085-1086`)."""
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P()))
