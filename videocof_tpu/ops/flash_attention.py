"""Pallas TPU flash attention (forward), replacing the reference's
FlashAttention-2/3 CUDA dependency (`attention_utils.py:113-146`).

Online-softmax attention tiled for the MXU: the grid walks (batch*heads,
q-blocks, kv-blocks) — TPU grids execute sequentially, so the kv dimension
accumulates running max / sum / weighted values in VMEM scratch and the
output block is written once at the final kv step. Logits are computed in
fp32 (preferred_element_type) off bf16 inputs; sequence lengths are padded to
the block size with -inf key masking.

Full bidirectional attention (video DiT self-attention has no causal mask);
key-padding masks are handled by the wrapper. Backward pass: inference path
doesn't need one; training falls back to the XLA composite backend until the
custom-VJP kernel lands.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, kv_len: int, block_k: int):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [BQ, D]
    k = k_ref[0]                      # [BK, D]
    v = v_ref[0]                      # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [BQ, BK]

    # mask padded keys (global kv index >= kv_len)
    k_idx = kv_i * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(k_idx < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                                    # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # [BQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                               # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)                      # [BQ, 1]

    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_bnld(q, k, v, scale, block_q, block_k, interpret=False):
    """q [BN, Lq, D], k/v [BN, Lk, D] -> [BN, Lq, D]."""
    BN, Lq, D = q.shape
    Lk = k.shape[1]
    q_pad = (-Lq) % block_q
    k_pad = (-Lk) % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0)))
    Lqp, Lkp = Lq + q_pad, Lk + k_pad

    grid = (BN, Lqp // block_q, Lkp // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=Lk,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BN, Lqp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :Lq]


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    bias: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: Optional[bool] = None) -> jax.Array:
    """[B, L, N, D] attention (heads on axis -2), bidirectional.

    Raises NotImplementedError for shapes/features the kernel doesn't cover
    (the dispatcher falls back to XLA).
    """
    if bias is not None:
        raise NotImplementedError("bias not supported by the pallas kernel")
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    if D % 128 != 0:
        raise NotImplementedError(f"head_dim {D} not a multiple of 128")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = (D ** -0.5) if scale is None else scale

    qt = q.transpose(0, 2, 1, 3).reshape(B * N, Lq, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)
    out = _flash_bnld(qt, kt, vt, scale, min(block_q, _rup(Lq, 128)),
                      min(block_k, _rup(Lk, 128)), interpret=interpret)
    return out.reshape(B, N, Lq, D).transpose(0, 2, 1, 3)


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
