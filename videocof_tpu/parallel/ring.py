"""Ring attention over the ICI mesh.

TPU-native replacement for the reference's xfuser ring path
(`dist/fuser.py:46-49` delegates ring KV rotation to xfuser's NCCL P2P).
Tokens stay sharded [B, L/sp, N, D]; K/V shards rotate around the ring with
`lax.ppermute` while each device folds the rotated shard into its queries'
partial result — O(L/sp) memory per device and point-to-point (neighbor)
traffic only, the right shape for long-context 4x extrapolation where
Ulysses' all-to-all head re-sharding would still materialize full-length
K/V per device.

v2 (SURVEY §7 step 8): each rotated shard runs through the Pallas flash
kernel (`ops.flash_attention_with_lse`) — logits only ever exist as
MXU-tile-sized VMEM blocks — and the per-shard (out, lse) pairs merge with
the standard blockwise log-sum-exp combine. Head dims the kernel doesn't
cover (not a multiple of 128) fall back to an fp32 einsum online-softmax
inner with the same semantics.

Composes with CoF exactly like Ulysses: RoPE (segment restarts included) is
applied to q/k *before* this function on per-token position data.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flash_attention import flash_attention_with_lse

NEG = jnp.finfo(jnp.float32).min


def _combine(o1, lse1, o2, lse2):
    """Merge two normalized partial attentions [B, Lq, N, D] with their
    log-sum-exps [B, Lq, N, 1]."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    o = (o1 * w1 + o2.astype(jnp.float32) * w2) / denom
    return o, m + jnp.log(denom)


def make_ring_attention(mesh: Mesh, seq_axis: str = "seq",
                        scale: Optional[float] = None,
                        batch_axis: Optional[str] = None,
                        model_axis: Optional[str] = None) -> Callable:
    """Returns attn(q, k, v, mask=None). ``mask`` is a global boolean key
    mask [B, L]; its shard rotates around the ring with the K/V blocks.
    ``batch_axis``: additionally shard the batch dim (CFG parallelism).
    ``model_axis``: additionally shard heads (tensor parallelism) — the
    ring rotates tokens within each head group, so ring SP composes with
    TP the same way Ulysses does."""
    sp = mesh.shape[seq_axis]

    def _inner_kernel(q, k, v, mask):
        """Pallas flash per rotated shard + blockwise LSE combine."""
        B, Lq, N, D = q.shape
        sc = (D ** -0.5) if scale is None else scale
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def body(carry, _):
            k_blk, v_blk, m_blk, o, lse = carry
            o_b, lse_b = flash_attention_with_lse(q, k_blk, v_blk,
                                                  kv_mask=m_blk, scale=sc)
            o, lse = _combine(o, lse, o_b, lse_b)
            k_blk = jax.lax.ppermute(k_blk, seq_axis, perm)
            v_blk = jax.lax.ppermute(v_blk, seq_axis, perm)
            if m_blk is not None:
                m_blk = jax.lax.ppermute(m_blk, seq_axis, perm)
            return (k_blk, v_blk, m_blk, o, lse), None

        _vary = lambda x: jax.lax.pcast(x, seq_axis, to="varying")
        o0 = _vary(jnp.zeros((B, Lq, N, D), jnp.float32))
        lse0 = _vary(jnp.full((B, Lq, N, 1), NEG, jnp.float32))
        (_, _, _, o, lse), _ = jax.lax.scan(
            body, (k, v, mask, o0, lse0), None, length=sp)
        return o.astype(q.dtype)

    def _inner_einsum(q, k, v, mask):
        """fp32 einsum online-softmax fallback (head_dim % 128 != 0)."""
        B, Lq, N, D = q.shape
        sc = (D ** -0.5) if scale is None else scale
        qf = q.astype(jnp.float32)
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def body(carry, _):
            k_blk, v_blk, m_blk, acc, m, l = carry
            s = jnp.einsum("bqnd,bknd->bqnk", qf,
                           k_blk.astype(jnp.float32)) * sc
            if m_blk is not None:
                s = jnp.where(m_blk[:, None, None, :], s, NEG)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            acc = acc * alpha + jnp.einsum(
                "bqnk,bknd->bqnd", p, v_blk.astype(jnp.float32))
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            k_blk = jax.lax.ppermute(k_blk, seq_axis, perm)
            v_blk = jax.lax.ppermute(v_blk, seq_axis, perm)
            if m_blk is not None:
                m_blk = jax.lax.ppermute(m_blk, seq_axis, perm)
            return (k_blk, v_blk, m_blk, acc, m_new, l), None

        _vary = lambda x: jax.lax.pcast(x, seq_axis, to="varying")
        acc0 = _vary(jnp.zeros((B, Lq, N, D), jnp.float32))
        m0 = _vary(jnp.full((B, Lq, N, 1), NEG, jnp.float32))
        l0 = _vary(jnp.zeros((B, Lq, N, 1), jnp.float32))
        (_, _, _, acc, m, l), _ = jax.lax.scan(
            body, (k, v, mask, acc0, m0, l0), None, length=sp)
        return (acc / l).astype(q.dtype)

    def attn(q, k, v, mask=None):
        L, D = q.shape[1], q.shape[3]
        assert L % sp == 0, f"seq len {L} not divisible by sp={sp} (pad first)"
        if batch_axis is not None:
            assert q.shape[0] % mesh.shape[batch_axis] == 0
        inner = _inner_kernel if D % 128 == 0 else _inner_einsum
        if model_axis is not None:
            assert q.shape[2] % mesh.shape[model_axis] == 0, \
                (q.shape[2], model_axis)
        tok = P(batch_axis, seq_axis, model_axis, None)
        # check_vma=False: the pallas interpreter mishandles vma on
        # scan-carried blocks (jax#interpret limitation; upstream-suggested
        # workaround)
        if mask is None:
            return shard_map(
                lambda q, k, v: inner(q, k, v, None), mesh=mesh,
                in_specs=(tok,) * 3, out_specs=tok,
                check_vma=False)(q, k, v)
        return shard_map(
            inner, mesh=mesh,
            in_specs=(tok, tok, tok, P(batch_axis, seq_axis)),
            out_specs=tok, check_vma=False)(q, k, v, mask)

    return attn
