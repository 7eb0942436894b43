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
import jax.numpy as jnp
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


# ---------------------------------------------------------- joint-stream SP
# The image/video families (CogVideoX / Flux / QwenImage) run a JOINT
# text+image sequence through every block (the reference's per-family xfuser
# adapters: `dist/cogvideox_xfuser.py:13-105`, `flux_xfuser.py`,
# `qwen_xfuser.py`). TPU-native recipe: pad EACH stream to a multiple of the
# seq axis (so both the per-stream residuals and their concatenation divide),
# shard both streams, and key-mask the pad slots out of every softmax.

def pad_stream(x: jax.Array, mult: int) -> jax.Array:
    """Zero-pad the token axis (axis 1) up to a multiple of ``mult``."""
    L = x.shape[1]
    Lp = pad_tokens_for_sp(L, mult)
    if Lp == L:
        return x
    return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))


def pad_rope_tables(cos: jax.Array, sin: jax.Array, new_len: int):
    """Pad [L, c] cos/sin tables with identity rotations (cos 1, sin 0)."""
    pad = new_len - cos.shape[0]
    if pad <= 0:
        return cos, sin
    return (jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0),
            jnp.pad(sin, ((0, pad), (0, 0))))


def joint_pad_masks(B: int, lt_real, lt_pad: int, li_real: int, li_pad: int):
    """Joint [B, lt_pad + li_pad] key mask (True = real token). ``lt_real``
    may be an int or a [B] / [B, lt] array (ragged text lengths — QwenImage's
    encoder_hidden_states_mask)."""
    if hasattr(lt_real, "ndim") and getattr(lt_real, "ndim", 0) >= 2:
        tmask = jnp.pad(lt_real.astype(bool),
                        ((0, 0), (0, lt_pad - lt_real.shape[1])))
    else:
        tmask = jnp.broadcast_to(jnp.arange(lt_pad) < lt_real, (B, lt_pad))
    imask = jnp.broadcast_to(jnp.arange(li_pad) < li_real, (B, li_pad))
    return jnp.concatenate([tmask, imask], axis=1)
