"""Cross-executable layout targeting for HBM-critical weight trees.

On this class of runtime, an array produced by one executable and consumed
by another gets RE-LAID-OUT at dispatch when the consumer prefers a
different tiled layout — a full copy. For a 13.8 GiB fp8 14B tree on a
16 GB chip that copy is fatal. The working recipe (proven by
`scripts/probe_14b_fp8.py`):

  1. AOT-compile the consumer from abstract shapes
     (`jax.jit(f).lower(*abstract).compile()`);
  2. read `compiled.input_formats`;
  3. create/ship the weights DIRECTLY into those formats — either as
     `out_shardings` of the producing jit, or leaf-wise `jax.device_put`
     from host numpy (`ship_tree_into`).

Use these helpers when wiring real 14B checkpoints through
`factory.load_pipeline(quantize='fp8')` on a single chip.
"""

from __future__ import annotations

from typing import Any

import jax


def consumer_input_formats(fn, *abstract_args, argnum: int = 0):
    """AOT-compile ``fn`` on abstract args and return (compiled,
    formats_of_argnum). ``abstract_args`` are ShapeDtypeStructs or concrete
    arrays; build param abstracts with `jax.eval_shape`."""
    compiled = jax.jit(fn).lower(*abstract_args).compile()
    return compiled, compiled.input_formats[0][argnum]


def device_put_into(host_leaf: Any, fmt: Any) -> Any:
    """`jax.device_put(host, fmt)` that actually lands in ``fmt``.

    On this runtime, device_put from host numpy silently commits the
    DEFAULT layout when the Format requests a non-default one (observed:
    AUTO-layout executables picking major_to_minor=(0,2,1) for fp8
    [40,5120,5120] attention kernels — the put succeeds, then the AOT call
    raises a layout-mismatch ValueError). Verify the landed format and
    fall back to a device-side relayout (jitted identity with
    out_shardings=fmt); the transient cost is one extra copy of that leaf.
    """
    arr = jax.device_put(host_leaf, fmt)
    try:
        matches = (fmt is None or getattr(fmt, "layout", None) is None
                   or arr.format == fmt)
    except Exception:
        matches = True  # backends without Format introspection
    if not matches:
        fixed = jax.jit(lambda a: a, out_shardings=fmt)(arr)
        arr.delete()
        return fixed
    return arr


def ship_tree_into(host_tree: Any, formats: Any,
                   release_host: bool = True) -> Any:
    """Leaf-wise `jax.device_put` of a host (numpy) pytree into target
    Formats.

    ``release_host=True`` (default) DETACHES each leaf from the source tree
    (the containers are mutated to None) before its device put, so the host
    copy is freed as soon as the transfer holds the last reference — peak
    host RAM stays ~one-leaf above the un-shipped remainder even though the
    caller still holds the (now-hollow) source tree, e.g.
    ``pipe.dit_params = ship_tree_into(pipe.dit_params, fmts)``. Without
    detaching, None-ing a flattened copy of the references frees nothing.
    Device-side, peak = accumulated tree + one leaf (plus one transient
    relayout copy where device_put misses the target layout — see
    :func:`device_put_into`)."""
    paths_leaves, tdef = jax.tree_util.tree_flatten_with_path(host_tree)
    fmts = jax.tree.flatten(formats)[0]
    out = []
    for i, (path, leaf) in enumerate(paths_leaves):
        if release_host and path:
            # drop the source tree's reference so `leaf` is the last one
            try:
                parent = host_tree
                for p in path[:-1]:
                    parent = parent[getattr(p, "key",
                                            getattr(p, "idx", None))]
                last = path[-1]
                parent[getattr(last, "key",
                               getattr(last, "idx", None))] = None
            except TypeError:
                pass  # immutable container (tuple) — keep the reference
        out.append(device_put_into(leaf, fmts[i]))
        paths_leaves[i] = None
        del leaf
    jax.block_until_ready(out)
    return jax.tree.unflatten(tdef, out)
