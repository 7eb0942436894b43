"""fp8 weight storage with bf16 compute.

Equivalent of the reference's fp8 path (`utils/fp8_optimization.py`:
float8_e4m3fn storage, per-forward upcast, 'modulation' params excluded).
On TPU we add per-tensor scales: e4m3 has a narrow dynamic range, so each
quantized leaf stores (q: float8_e4m3fn, scale: fp32) and dequantizes to the
compute dtype at use. Halves HBM for the 14B DiT (28 GB bf16 -> 14 GB).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

E4M3_MAX = 448.0

# param-path substrings kept in high precision (reference excludes
# 'modulation'; norms/biases are tiny and precision-sensitive)
DEFAULT_EXCLUDE = ("modulation", "norm", "bias", "time_mlp", "time_proj")


def _match(path: Tuple, patterns: Sequence[str]) -> bool:
    s = "/".join(str(getattr(k, "key", k)) for k in path)
    return any(p in s for p in patterns)


def quantize_params_fp8(params: Any,
                        exclude: Sequence[str] = DEFAULT_EXCLUDE) -> Any:
    """Returns a pytree where large matmul weights become
    {"fp8": q, "scale": s} dicts; use `dequantize_leaf`/`dequantize_params`
    to recover compute weights."""

    def quant(path, leaf):
        if leaf.ndim < 2 or _match(path, exclude):
            return leaf
        a = jnp.asarray(leaf, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / E4M3_MAX
        q = (a / scale).astype(jnp.float8_e4m3fn)
        return {"fp8": q, "scale": scale}

    return jax.tree_util.tree_map_with_path(quant, params)


def is_fp8_leaf(x: Any) -> bool:
    return isinstance(x, dict) and "fp8" in x and "scale" in x


def dequantize_leaf(x: Any, dtype=jnp.bfloat16):
    if is_fp8_leaf(x):
        return (x["fp8"].astype(jnp.float32) * x["scale"]).astype(dtype)
    return x


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    """Full upcast (for feeding the standard forward; XLA fuses the upcast
    into the consuming matmul, so under jit the fp8 copy stays the only
    HBM-resident one when donated)."""
    return jax.tree.map(lambda x: dequantize_leaf(x, dtype), params,
                        is_leaf=is_fp8_leaf)


def fp8_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
