"""Per-chip parameter-residency table for the 20B QwenImage under TP.

The 20B does not fit one 16 GB v5e even at fp8 (BASELINE.md); the TP path
(parallel/tp.py column/row + AdaLN column shards, proven exact on the
virtual mesh in tests/test_image_tp.py) is how it deploys. This script
computes, WITHOUT materializing weights (jax.eval_shape + the actual
tp_param_shardings specs), the per-chip parameter bytes at tp = 1/2/4/8 for
bf16 and fp8 storage — the numbers quoted in docs/SCALING.md.

Run on CPU: JAX_PLATFORMS=cpu python scripts/fit_table_qwen20b.py
"""

import math
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def local_bytes(params_shapes, specs_fn, tp: int, fp8_exclude=None) -> int:
    """Sum per-chip bytes: each leaf's sharded dims divide by the mesh axis
    size its spec names (ceil, like GSPMD padding)."""
    from jax.sharding import PartitionSpec as P  # noqa: F401

    total = 0

    def leaf_bytes(path, leaf, spec):
        nonlocal total
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = list(leaf.shape)
        for d, ax in enumerate(spec):
            if ax is not None:
                shape[d] = math.ceil(shape[d] / tp)
        n = math.prod(shape) if shape else 1
        if fp8_exclude is not None:
            quant = leaf.ndim >= 2 and not any(p in names
                                               for p in fp8_exclude)
            if quant and names.endswith("kernel"):
                # {fp8: 1 byte, scale: fp32 per stacked layer}
                total += n + 4 * (shape[0] if leaf.ndim >= 3 else 1)
                return
        total += n * 2  # bf16
        return

    flat_specs = specs_fn(params_shapes)
    jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf_bytes(path, leaf,
                                      flat_specs_at(flat_specs, path)),
        params_shapes)
    return total


def flat_specs_at(spec_tree, path):
    node = spec_tree
    for k in path:
        node = node[getattr(k, "key", k)]
    return node


def main():
    from videocof_tpu.models import qwenimage as qwen_lib
    from videocof_tpu.parallel.tp import _spec_for

    cfg = qwen_lib.QWENIMAGE
    shapes = jax.eval_shape(
        lambda k: qwen_lib.init_qwenimage(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    n_params = sum(math.prod(x.shape) for x in jax.tree.leaves(shapes))
    print(f"QwenImage cfg: layers={cfg.num_layers}, d={cfg.inner_dim}, "
          f"params={n_params/1e9:.2f}B", file=sys.stderr)

    def specs_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: _spec_for(path, leaf, "model"), tree)

    rows = []
    for tp in (1, 2, 4, 8):
        b16 = local_bytes(shapes, specs_fn, tp)
        b8 = local_bytes(shapes, specs_fn, tp,
                         fp8_exclude=qwen_lib.QWEN_FP8_EXCLUDE)
        rows.append((tp, b16 / 2**30, b8 / 2**30))
        print(f"tp={tp}: bf16 {b16/2**30:6.2f} GiB/chip   "
              f"fp8 {b8/2**30:6.2f} GiB/chip   "
              f"fits-16GB(fp8): {'yes' if b8/2**30 < 14.5 else 'NO'}")
    return rows


if __name__ == "__main__":
    main()
