"""umT5 encoder (text conditioning), TPU-native.

Functional rebuild of the reference's from-scratch T5 encoder
(`videox_fun/models/wan_text_encoder.py`): RMS layer norm, unscaled attention
with additive relative-position bias, gated-GELU FFN, and — umT5-specific —
a *per-layer* relative attention bias (``shared_pos=False`` in
`config/wan2.1/wan_civitai.yaml:24`).

Blocks are stacked and scanned like the DiT. The relative-position *bucket*
matrix depends only on sequence length, so it is computed once per forward and
each scanned block gathers its own bias embedding from it.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import T5Config

Params = Dict[str, Any]


def relative_position_buckets(lq: int, lk: int, num_buckets: int,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket indices [lq, lk]
    (reference `wan_text_encoder.py:235-254`)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    half = num_buckets // 2
    out = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact)
        * (half - max_exact)).astype(np.int64)
    large = np.minimum(large, half - 1)
    out += np.where(rel < max_exact, rel, large)
    return out


def _t5_rms_norm(x, weight, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1,
                                      keepdims=True) + eps)
    return (out.astype(weight.dtype) * weight).astype(x.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.float32) -> Params:
    it = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    d, da, df = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def lin(k, din, dout, std):
        return {"kernel": (jax.random.normal(k, (din, dout)) * std
                           ).astype(dtype)}

    def block(bk):
        ks = jax.random.split(bk, 8)
        return {
            "norm1": {"weight": jnp.ones((d,), dtype)},
            "attn": {
                "q": lin(ks[0], d, da, (d * da) ** -0.5),
                "k": lin(ks[1], d, da, d ** -0.5),
                "v": lin(ks[2], d, da, d ** -0.5),
                "o": lin(ks[3], da, d, (cfg.num_heads * da) ** -0.5),
            },
            "pos_emb": (jax.random.normal(ks[4], (cfg.num_buckets,
                                                  cfg.num_heads))
                        * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
                        ).astype(jnp.float32),
            "norm2": {"weight": jnp.ones((d,), dtype)},
            "ffn": {
                "gate": lin(ks[5], d, df, d ** -0.5),
                "fc1": lin(ks[6], d, df, d ** -0.5),
                "fc2": lin(ks[7], df, d, df ** -0.5),
            },
        }

    blocks = [block(next(it)) for _ in range(cfg.num_layers)]
    return {
        "token_embedding": (jax.random.normal(next(it), (cfg.vocab, cfg.dim))
                            ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"weight": jnp.ones((d,), dtype)},
    }


def t5_block_apply(p: Params, cfg: T5Config, x, bucket_ids, mask_bias):
    """x [B, L, D] in param dtype; bucket_ids [L, L] int; mask_bias
    [B, 1, 1, L] fp32 additive."""
    B, L, D = x.shape
    N, hd = cfg.num_heads, cfg.head_dim

    # self-attention (no scaling — `wan_text_encoder.py:100-103`)
    h = _t5_rms_norm(x, p["norm1"]["weight"])
    q = jnp.dot(h, p["attn"]["q"]["kernel"]).reshape(B, L, N, hd)
    k = jnp.dot(h, p["attn"]["k"]["kernel"]).reshape(B, L, N, hd)
    v = jnp.dot(h, p["attn"]["v"]["kernel"]).reshape(B, L, N, hd)
    pos_bias = p["pos_emb"][bucket_ids].astype(jnp.float32)  # [L, L, N]
    bias = pos_bias.transpose(2, 0, 1)[None] + mask_bias     # [B, N, L, L]
    logits = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, L, -1)
    x = x + jnp.dot(att, p["attn"]["o"]["kernel"])

    # gated FFN
    h = _t5_rms_norm(x, p["norm2"]["weight"])
    gate = _gelu_tanh(jnp.dot(h, p["ffn"]["gate"]["kernel"]))
    h = jnp.dot(h, p["ffn"]["fc1"]["kernel"]) * gate
    x = x + jnp.dot(h, p["ffn"]["fc2"]["kernel"])
    return x


def t5_encode(params: Params, cfg: T5Config, input_ids: jax.Array,
              attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """input_ids [B, L] -> hidden states [B, L, dim]."""
    B, L = input_ids.shape
    x = params["token_embedding"][input_ids]
    bucket_ids = jnp.asarray(relative_position_buckets(
        L, L, cfg.num_buckets, cfg.rel_max_dist))
    if attention_mask is None:
        mask_bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    else:
        neg = jnp.finfo(jnp.float32).min
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg
                              ).astype(jnp.float32)

    def body(carry, bp):
        return t5_block_apply(bp, cfg, carry, bucket_ids, mask_bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _t5_rms_norm(x, params["norm"]["weight"])
