"""Camera-pose (Plücker-ray) control adapter.

Rebuild of the reference `SimpleAdapter` (`wan_camera_adapter.py`): per-frame
pixel-unshuffle (8x) -> strided conv to the DiT patch grid -> residual conv
blocks; output is added onto the patch embeddings
(`wan_transformer3d.py:871-874`).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _conv2d(x, p, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def _init_conv(key, cin, cout, k, dtype):
    fan = cin * k * k
    b = 1.0 / math.sqrt(fan)
    return {"kernel": jax.random.uniform(key, (cout, cin, k, k), jnp.float32,
                                         -b, b).astype(dtype),
            "bias": jnp.zeros((cout,), dtype)}


def init_camera_adapter(key, in_dim: int = 24, out_dim: int = 2048,
                        kernel_size: Tuple[int, int] = (2, 2),
                        stride: Tuple[int, int] = (2, 2),
                        downscale_factor: int = 8,
                        num_residual_blocks: int = 1,
                        dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 1 + 2 * num_residual_blocks)
    cin = in_dim * downscale_factor * downscale_factor
    p: Params = {
        "conv": _init_conv(ks[0], cin, out_dim, kernel_size[0], dtype),
        "res": [
            {"conv1": _init_conv(ks[1 + 2 * i], out_dim, out_dim, 3, dtype),
             "conv2": _init_conv(ks[2 + 2 * i], out_dim, out_dim, 3, dtype)}
            for i in range(num_residual_blocks)
        ],
    }
    return p


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """[N, C, H, W] -> [N, C*r*r, H/r, W/r] (torch PixelUnshuffle layout)."""
    N, C, H, W = x.shape
    x = x.reshape(N, C, H // r, r, W // r, r)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(N, C * r * r, H // r, W // r)


def camera_adapter_forward(params: Params, x: jax.Array,
                           downscale_factor: int = 8,
                           stride: Tuple[int, int] = (2, 2)) -> jax.Array:
    """x [B, C, F, H, W] camera-ray maps -> [B, out_dim, F, H', W'] features
    aligned with the DiT patch grid."""
    B, C, F, H, W = x.shape
    y = x.transpose(0, 2, 1, 3, 4).reshape(B * F, C, H, W)
    y = pixel_unshuffle(y, downscale_factor)
    y = _conv2d(y, params["conv"], stride=stride)
    for rb in params["res"]:
        h = jax.nn.relu(_conv2d(y, rb["conv1"], padding=((1, 1), (1, 1))))
        h = _conv2d(h, rb["conv2"], padding=((1, 1), (1, 1)))
        y = y + h
    O, Ho, Wo = y.shape[1:]
    return y.reshape(B, F, O, Ho, Wo).transpose(0, 2, 1, 3, 4)
