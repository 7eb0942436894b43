"""Pallas TPU flash attention (placeholder until the kernel lands).

Will implement an MXU-tiled online-softmax kernel replacing the reference's
FlashAttention-2/3 CUDA dependency (`attention_utils.py:113-146`).
"""

from __future__ import annotations

from typing import Optional

import jax


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    bias: Optional[jax.Array] = None,
                    scale: Optional[float] = None) -> jax.Array:
    raise NotImplementedError("pallas flash attention kernel not yet built")
