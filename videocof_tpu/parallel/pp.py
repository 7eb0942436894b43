"""Pipeline parallelism (GPipe) over the scan-stacked DiT block stack.

A capability beyond the reference (which has no pipeline dimension at all):
the ``[num_layers, ...]``-stacked block params are sharded on their layer
axis across a mesh axis — each device holds a contiguous stage of
``num_layers / S`` blocks — and microbatches stream through the stages with
neighbor-only ``ppermute`` hops, the classic GPipe schedule expressed as a
single differentiable ``lax.scan`` inside ``shard_map``.

Where it fits on TPU: TP+SP is the latency choice (no bubbles); PP is the
*throughput/memory* choice for training and batch serving — weights scale
1/S per chip with only O(S/M) bubble overhead at M microbatches, and the
only communication is point-to-point activation hops on ICI (no per-layer
all-reduces). The schedule is differentiable (scan + ppermute), so
``jax.grad`` through `pp_scan_blocks` yields the standard backward pipeline
for training.

Typical meshes repurpose the ``seq`` axis for stages (tokens are not
sharded under PP — each stage sees the full sequence, so the block body
needs no collectives and the Pallas flash kernel runs on purely local
tiles).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pp_param_shardings(mesh: Mesh, stacked_params: Any,
                       axis: str = "seq") -> Any:
    """Shard every stacked block leaf on its leading (layer) axis."""
    from jax.sharding import NamedSharding

    def rule(leaf):
        spec = [None] * leaf.ndim
        spec[0] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, stacked_params)


def pp_scan_blocks(mesh: Mesh, block_fn: Callable[..., jax.Array],
                   stacked_params: Any, x: jax.Array, cond: Any = None,
                   microbatches: int = 1, axis: str = "seq") -> jax.Array:
    """Equivalent of ``lax.scan(block_fn)`` over the stacked block params,
    executed as an S-stage GPipe pipeline.

    block_fn(layer_params, x, cond) -> x applies ONE block. ``cond`` is a
    pytree of per-sample conditioning with leading batch dim (e0, context,
    ...) that is microbatched alongside ``x`` — each stage indexes the
    microbatch it is currently holding (stage s works on microbatch t-s at
    tick t). Batch-independent conditioning (rope tables, cfg) can simply be
    closed over. ``x`` is [B, ...] with B % microbatches == 0; the layer
    count must divide the stage count. Returns exactly what the sequential
    scan would.
    """
    S = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_layers % S == 0, f"{n_layers} layers % {S} stages != 0"
    M = microbatches
    B = x.shape[0]
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"

    def mb(leaf):
        return leaf.reshape(M, B // M, *leaf.shape[1:])

    xm = mb(x)
    cond_m = jax.tree.map(mb, cond) if cond is not None else None

    def stage(local_params, xm, cond_m):
        # local_params: [n_layers/S, ...] this stage's blocks, in order
        idx = jax.lax.axis_index(axis)

        def local_stack(h, c):
            h, _ = jax.lax.scan(lambda s, bp: (block_fn(bp, s, c), None), h,
                                local_params)
            return h

        perm = [(i, (i + 1) % S) for i in range(S)]
        zero = jnp.zeros_like(xm[0])

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t; stage s holds microbatch t-s
            # (clamped; garbage ticks never land in a valid output slot)
            inp = jnp.where(idx == 0, xm[jnp.clip(t, 0, M - 1)], buf)
            m_here = jnp.clip(t - idx, 0, M - 1)
            c_here = (jax.tree.map(lambda c: c[m_here], cond_m)
                      if cond_m is not None else None)
            y = local_stack(inp, c_here)
            # the last stage completed microbatch t-(S-1) this tick
            slot = t - (S - 1)
            write = jnp.logical_and(idx == S - 1,
                                    jnp.logical_and(slot >= 0, slot < M))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, outs[jnp.clip(slot, 0, M - 1)]),
                jnp.clip(slot, 0, M - 1), 0)
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        outs0 = jnp.zeros_like(xm)
        (_, outs), _ = jax.lax.scan(tick, (zero, outs0),
                                    jnp.arange(M + S - 1))
        # outputs live on the last stage; replicate via masked psum
        outs = jnp.where(idx == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    spec_p = jax.tree.map(lambda leaf: P(axis, *([None] * (leaf.ndim - 1))),
                          stacked_params)
    spec_c = jax.tree.map(lambda _: P(), cond_m)
    out = shard_map(stage, mesh=mesh, in_specs=(spec_p, P(), spec_c),
                    out_specs=P(), check_vma=False)(stacked_params, xm,
                                                    cond_m)
    return out.reshape(B, *x.shape[1:])
