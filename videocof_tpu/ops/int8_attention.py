"""Int8-quantized flash attention (SageAttention-style).

TPU counterpart of the reference's optional SageAttention backend
(`attention_utils.py:18-41,173-180`): Q and K are quantized to int8 with
per-row scales so the QK^T matmul runs on the MXU's int8 path (2x bf16
throughput); the softmax runs in fp32 off the rescaled s32 logits; PV stays
bf16. K is mean-centered before quantization (Sage's smoothing) — the dropped
``q . k_mean`` term is constant per query row and softmax-invariant, so no
compensation is needed.

v2 (VERDICT r2 #10): quantization is FUSED into the kernel prologue. v1
quantized Q/K with XLA ops before the pallas_call — five extra HBM passes
over Q and K (center, abs-max, scale, round, int8 write) that swamped the
2x MXU rate (2.98 vs 1.80 s/step bf16, BASELINE.md). Here the kernel loads
bf16 tiles and quantizes in VMEM: the Q tile once per query block (cached
in scratch across the KV iteration), the K tile per (i, j) step — [BK, D]
elementwise work, 1/BQ of the tile's dot FLOPs. Only the (softmax-invariant)
K mean is precomputed outside, one XLA reduce pass over K. The int8 MXU dot
keeps precision=DEFAULT pinned: a global jax_default_matmul_precision=
'highest' would stamp an fp32 contract precision onto the integer matmul,
which Mosaic rejects on real TPU ("Bad lhs type") while interpret mode
hides it.

Shares the online-softmax/grid structure of `flash_attention.py`. Inference
only (no VJP): quantized attention is an acceleration knob, not a training
path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e)


def _quant_tile(x, eps=1e-6):
    """fp32 [R, D] -> (int8 [R, D], per-row scale [R, 1]). VMEM-resident."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_kernel(q_ref, k_ref, v_ref, km_ref, mask_ref, o_ref,
                 m_scr, l_scr, acc_scr, qi_scr, sq_scr,
                 *, scale, kv_len, block_k):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # quantize the Q tile ONCE per query block; the KV iteration
        # (innermost grid axis) reuses it from scratch
        qi, sq = _quant_tile(q_ref[0].astype(jnp.float32))
        qi_scr[:] = qi
        sq_scr[:] = sq

    # K tile: center with the (precomputed, whole-sequence) mean, then
    # per-row int8 — all in VMEM, no HBM round-trip
    kf = k_ref[0].astype(jnp.float32) - km_ref[0]
    ki, sk = _quant_tile(kf)
    v = v_ref[0]            # [BK, D] bf16/f32

    s32 = jax.lax.dot_general(qi_scr[:], ki, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32,
                              precision=jax.lax.Precision.DEFAULT)
    # exp2-domain softmax (see flash_attention.py): scale & log2(e) fold
    # into the [BQ,1]/[BK,1] dequant scales, so the [BQ,BK] tile sees ONE
    # broadcast multiply and exp2 instead of exp
    s = s32.astype(jnp.float32) * ((sq_scr[:] * (scale * LOG2E)) *
                                   sk[:, 0][None, :])

    if kv_len is not None:  # statically skipped when Lk divides the block
        k_idx = kv_i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_idx < kv_len, s, NEG_INF)
    if mask_ref is not None:          # boolean key mask block [1, 1, BK]
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def int8_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         kv_mask: Optional[jax.Array] = None,
                         scale: Optional[float] = None,
                         block_q: int = 256, block_k: int = 512,
                         interpret: Optional[bool] = None) -> jax.Array:
    """[B, L, N, D] attention with int8 QK^T. head_dim multiple of 128.
    ``kv_mask`` [B, Lk] bool: keys excluded in-kernel (SP padding)."""
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    if D % 128 != 0:
        raise NotImplementedError(f"head_dim {D} not a multiple of 128")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = (D ** -0.5) if scale is None else scale
    block_q = min(block_q, _rup(Lq, 128))
    block_k = min(block_k, _rup(Lk, 128))

    qt = q.transpose(0, 2, 1, 3).reshape(B * N, Lq, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)

    # Sage smoothing: the whole-sequence K mean (softmax-invariant, see
    # module docstring). One XLA reduce pass; masked-out keys still count
    # toward the mean — centering is exact for ANY constant, so that only
    # shifts the (irrelevant) constant, never correctness.
    k_mean = jnp.mean(kt.astype(jnp.float32), axis=1, keepdims=True)

    q_pad = (-Lq) % block_q
    k_pad = (-Lk) % block_k
    if q_pad:
        qt = jnp.pad(qt, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        kt = jnp.pad(kt, ((0, 0), (0, k_pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, k_pad), (0, 0)))
    Lqp, Lkp = Lq + q_pad, Lk + k_pad

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, 1, D), lambda b, i, j: (b, 0, 0)),
    ]
    operands = [qt, kt, vt, k_mean]
    has_mask = kv_mask is not None
    if has_mask:
        m = jnp.repeat(kv_mask.astype(jnp.int32), N, axis=0)
        m = jnp.pad(m, ((0, 0), (0, k_pad)))[:, None, :]  # [BN, 1, Lkp]
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, i, j: (b, 0, j)))
        operands.append(m)

    def kern(*refs):
        if has_mask:
            q_r, k_r, v_r, km_r, m_r, o_r = refs[:6]
            scr = refs[6:]
        else:
            q_r, k_r, v_r, km_r, o_r = refs[:5]
            m_r = None
            scr = refs[5:]
        _int8_kernel(q_r, k_r, v_r, km_r, m_r, o_r, *scr,
                     scale=scale, kv_len=Lk if k_pad else None,
                     block_k=block_k)

    out = pl.pallas_call(
        kern,
        grid=(B * N, Lqp // block_q, Lkp // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * N, Lqp, D), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.int8),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out[:, :Lq].reshape(B, N, Lq, D).transpose(0, 2, 1, 3)


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
