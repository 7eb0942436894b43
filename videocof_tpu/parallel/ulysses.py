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
from .sp import pad_tokens_for_sp  # noqa: F401  (re-export; historical home)


def make_ulysses_attention(mesh: Mesh, seq_axis: str = "seq",
                           inner_backend: Optional[str] = None,
                           batch_axis: Optional[str] = None) -> Callable:
    """Returns attn(q, k, v, mask=None) on logically-global [B, L, N, D]
    arrays; L and N must divide by the seq-axis size. ``mask`` is a global
    boolean key mask [B, L] (True = attend) — used for non-dividing token
    counts that were zero-padded to a multiple of the axis.

    ``batch_axis``: additionally shard the batch dim (CFG parallelism — the
    cond/uncond doubled batch split over the data axis)."""
    sp = mesh.shape[seq_axis]

    def _inner(q, k, v, mask):
        # [B, L/sp, N, D] -> [B, L, N/sp, D]
        def a2a_in(x):
            return jax.lax.all_to_all(x, seq_axis, split_axis=2,
                                      concat_axis=1, tiled=True)

        if sp > 1:
            q_, k_, v_ = a2a_in(q), a2a_in(k), a2a_in(v)
        else:
            q_, k_, v_ = q, k, v
        # keys are full-length after the all-to-all, so the global key mask
        # applies directly
        o = _attention(q_, k_, v_, mask=mask, backend=inner_backend)
        if sp > 1:
            o = jax.lax.all_to_all(o, seq_axis, split_axis=1, concat_axis=2,
                                   tiled=True)
        return o

    def attn(q, k, v, mask=None):
        B, L, N, D = q.shape
        assert L % sp == 0, f"seq len {L} not divisible by sp={sp} (pad first)"
        assert N % sp == 0, f"heads {N} not divisible by sp={sp}"
        if batch_axis is not None:
            assert B % mesh.shape[batch_axis] == 0, (B, batch_axis)
        tok = P(batch_axis, seq_axis, None, None)
        if mask is None:
            return shard_map(
                lambda q, k, v: _inner(q, k, v, None), mesh=mesh,
                in_specs=(tok,) * 3, out_specs=tok)(q, k, v)
        return shard_map(
            _inner, mesh=mesh,
            in_specs=(tok, tok, tok, P(batch_axis, None)),
            out_specs=tok)(q, k, v, mask)

    return attn
