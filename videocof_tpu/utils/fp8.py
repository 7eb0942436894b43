"""fp8 weight storage with bf16 compute.

Equivalent of the reference's fp8 path (`utils/fp8_optimization.py`:
float8_e4m3fn storage, per-forward upcast, 'modulation' params excluded).
On TPU we add per-tensor scales: e4m3 has a narrow dynamic range, so each
quantized leaf stores (q: float8_e4m3fn, scale: fp32) and dequantizes to the
compute dtype at use (`wan_dit._kernel` does this inside the scanned block
body, so only one block's bf16 weights are ever live). Halves HBM for the
14B DiT (28 GB bf16 -> 14 GB) — the TPU answer to the reference's
sequential CPU offload (`inference.py:306-321`).

Scan-stacked block weights ([num_layers, ...] leaves under "blocks") get a
PER-LAYER scale (shape [num_layers]); `lax.scan` slices it to a scalar
alongside the fp8 slab.

Quantization runs host-side in numpy when given numpy leaves (ml_dtypes
float8), so a 14B checkpoint never has to materialize in fp32 on a 16 GB
device just to be quantized.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

E4M3_MAX = 448.0

# param-path substrings kept in high precision (reference excludes
# 'modulation'; norms/biases are tiny and precision-sensitive). The list
# covers every model family's AdaLN/timestep names: Wan (modulation,
# time_mlp/time_proj), Flux (time_embed/text_embed/guidance_embed; its
# norm*/lin modulations match 'norm'), QwenImage (img_mod/txt_mod,
# time_embed), CogVideoX (time_embed; its norm1/lin matches 'norm').
DEFAULT_EXCLUDE = ("modulation", "norm", "bias", "time_mlp", "time_proj",
                   "time_embed", "text_embed", "guidance_embed",
                   "img_mod", "txt_mod")

# path prefixes whose leaves are scan-stacked on axis 0 (per-layer scales);
# 'single_blocks' is Flux's second stack
DEFAULT_STACKED = ("blocks", "single_blocks")


def _path_str(path: Tuple) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def quantize_params_fp8(params: Any,
                        exclude: Sequence[str] = DEFAULT_EXCLUDE,
                        stacked: Sequence[str] = DEFAULT_STACKED) -> Any:
    """Returns a pytree where large matmul weights become
    {"fp8": q, "scale": s} dicts; `wan_dit._kernel` (or `dequantize_params`)
    recovers compute weights. numpy leaves quantize on host, jax leaves on
    device."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    def quant(path, leaf):
        s = _path_str(path)
        if leaf.ndim < 2 or any(p in s for p in exclude):
            return leaf
        per_layer = leaf.ndim >= 3 and any(s.startswith(p) or f"/{p}/" in s
                                           for p in stacked)
        if isinstance(leaf, np.ndarray):
            a = leaf.astype(np.float32)
            if per_layer:
                red = tuple(range(1, a.ndim))
                scale = np.maximum(np.abs(a).max(axis=red), 1e-12) / E4M3_MAX
                q = (a / scale.reshape((-1,) + (1,) * (a.ndim - 1))
                     ).astype(ml_dtypes.float8_e4m3fn)
                return {"fp8": q, "scale": scale.astype(np.float32)}
            scale = np.float32(max(float(np.abs(a).max()), 1e-12) / E4M3_MAX)
            return {"fp8": (a / scale).astype(ml_dtypes.float8_e4m3fn),
                    "scale": scale}
        a = jnp.asarray(leaf, jnp.float32)
        if per_layer:
            red = tuple(range(1, a.ndim))
            scale = jnp.maximum(jnp.max(jnp.abs(a), axis=red),
                                1e-12) / E4M3_MAX
            q = (a / scale.reshape((-1,) + (1,) * (a.ndim - 1))
                 ).astype(jnp.float8_e4m3fn)
            return {"fp8": q, "scale": scale}
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / E4M3_MAX
        return {"fp8": (a / scale).astype(jnp.float8_e4m3fn), "scale": scale}

    return jax.tree_util.tree_map_with_path(quant, params)


def is_fp8_leaf(x: Any) -> bool:
    return isinstance(x, dict) and "fp8" in x and "scale" in x


def dequantize_leaf(x: Any, dtype=None):
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    if is_fp8_leaf(x):
        q = jnp.asarray(x["fp8"]).astype(jnp.float32)
        scale = jnp.asarray(x["scale"])
        if scale.ndim == 1:  # per-layer: [L] against [L, ...]
            scale = scale.reshape((-1,) + (1,) * (q.ndim - 1))
        return (q * scale).astype(dtype)
    return x


def dequantize_params(params: Any, dtype=None) -> Any:
    """Full upcast (for feeding the standard forward; XLA fuses the upcast
    into the consuming matmul, so under jit the fp8 copy stays the only
    HBM-resident one when donated)."""
    import jax
    return jax.tree.map(lambda x: dequantize_leaf(x, dtype), params,
                        is_leaf=is_fp8_leaf)


def fp8_bytes(params: Any) -> int:
    import jax
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
