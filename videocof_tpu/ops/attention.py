"""Attention backend dispatch.

TPU-native counterpart of the reference's kernel dispatcher
(`videox_fun/models/attention_utils.py:152-211`, env ``VIDEOX_ATTENTION_TYPE``
choosing FlashAttention-2/3 / SageAttention / SDPA). Here the backends are:

  * ``"pallas"`` — our Pallas TPU flash-attention kernel (MXU-tiled, online
    softmax); the production path on TPU.
  * ``"int8"``   — Sage-style int8-QK^T flash kernel (fused in-kernel
    quantization). NOT RECOMMENDED for speed: even with quantization fused
    into the kernel prologue it measures 1.08x SLOWER than the bf16 pallas
    kernel at the production geometry (BASELINE.md negative results,
    `scripts/probe_int8_attention.py`) — the s32->f32 logit conversion and
    quant VPU work outweigh the int8 MXU rate at head_dim 128. Kept as a
    correctness-tested option for accuracy experiments.
  * ``"xla"``    — `jax.nn.dot_product_attention`; XLA already emits a fused
    flash-style kernel on TPU, and it is the safe fallback everywhere.
  * ``"naive"``  — explicit einsum softmax; reference semantics for tests.

Selection: explicit ``backend=`` argument > ``VIDEOCOF_ATTENTION_TYPE`` env
var > automatic (pallas on TPU when the shape qualifies, else xla).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


_ENV_VAR = "VIDEOCOF_ATTENTION_TYPE"


def available_backends() -> tuple:
    return ("pallas", "int8", "xla", "naive")


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def default_backend() -> str:
    env = os.environ.get(_ENV_VAR, "").lower()
    if env:
        if env not in available_backends():
            raise ValueError(
                f"{_ENV_VAR}={env!r} not in {available_backends()}")
        return env
    return "pallas" if _on_tpu() else "xla"


def _naive_attention(q, k, v, bias=None, scale=None):
    *_, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("...qnd,...knd->...nqk",
                        q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...nqk,...knd->...qnd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention over [B, L, N, D] tensors (heads on axis -2).

    ``bias`` broadcasts against [B, N, Lq, Lk] logits; ``mask`` is a boolean
    key mask [B, Lk] (True = attend) mirroring the reference's ``k_lens``
    varlen handling (`attention_utils.py:152-211`).
    """
    if callable(backend):
        # custom impl (Ulysses/ring sequence-parallel self-attention); the
        # boolean key mask passes through (SP padding), bias does not
        assert bias is None
        return backend(q, k, v, mask=mask)

    if backend is None:
        backend = default_backend()

    if backend == "pallas":
        # the kernel handles the boolean key mask natively (no bias tensor)
        from .flash_attention import flash_attention as _pallas_flash
        try:
            return _pallas_flash(q, k, v, bias=bias, kv_mask=mask,
                                 scale=scale)
        except NotImplementedError:
            backend = "xla"  # shape/feature not supported by the kernel yet

    if backend == "int8":
        # also mask-native; bias is the unsupported case
        from .int8_attention import int8_flash_attention
        try:
            assert bias is None
            return int8_flash_attention(q, k, v, kv_mask=mask, scale=scale)
        except (NotImplementedError, AssertionError):
            backend = "xla"

    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        mbias = jnp.where(mask[:, None, None, :], 0.0, neg).astype(jnp.float32)
        bias = mbias if bias is None else bias + mbias
    if bias is not None:
        bias = bias.astype(q.dtype)

    if backend == "naive":
        return _naive_attention(q, k, v, bias=bias, scale=scale)

    # xla fused path
    return jax.nn.dot_product_attention(
        q, k, v, bias=bias, scale=scale, implementation="xla")
