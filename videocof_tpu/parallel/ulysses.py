"""Ulysses sequence-parallel attention over the ICI mesh.

TPU-native replacement for the reference's xfuser
``xFuserLongContextAttention`` (NCCL all-to-all over heads —
`videox_fun/dist/wan_xfuser.py:68-111`): tokens arrive sharded [B, L/sp, N, D]
on the ``seq`` axis, an all-to-all re-shards to [B, L, N/sp, D] (full sequence,
heads split), full attention runs locally, and a second all-to-all restores
token sharding.

Because RoPE (including the CoF segment restarts) is applied to q/k *before*
this function on per-token position data, sequence parallelism composes with
chain-of-frames editing — fixing the incompatibility in the reference, whose
USP forward drops `frame_split_indices` (`dist/wan_xfuser.py:68-74`,
SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import attention as _attention


def pad_tokens_for_sp(L: int, sp: int) -> int:
    """Sequence padding to a multiple of the seq axis (the reference rounds
    seq_len up the same way — `wan_transformer3d.py:904-905`)."""
    return ((L + sp - 1) // sp) * sp


def make_ulysses_attention(mesh: Mesh, seq_axis: str = "seq",
                           inner_backend: Optional[str] = None) -> Callable:
    """Returns attn(q, k, v) on logically-global [B, L, N, D] arrays; L and N
    must divide by the seq-axis size."""
    sp = mesh.shape[seq_axis]

    def inner(q, k, v):
        # [B, L/sp, N, D] -> [B, L, N/sp, D]
        def a2a_in(x):
            return jax.lax.all_to_all(x, seq_axis, split_axis=2,
                                      concat_axis=1, tiled=True)

        if sp > 1:
            q_, k_, v_ = a2a_in(q), a2a_in(k), a2a_in(v)
        else:
            q_, k_, v_ = q, k, v
        o = _attention(q_, k_, v_, backend=inner_backend)
        if sp > 1:
            o = jax.lax.all_to_all(o, seq_axis, split_axis=1, concat_axis=2,
                                   tiled=True)
        return o

    def attn(q, k, v):
        B, L, N, D = q.shape
        assert L % sp == 0, f"seq len {L} not divisible by sp={sp} (pad first)"
        assert N % sp == 0, f"heads {N} not divisible by sp={sp}"
        return shard_map(
            inner, mesh=mesh,
            in_specs=(P(None, seq_axis, None, None),) * 3,
            out_specs=P(None, seq_axis, None, None),
        )(q, k, v)

    return attn
