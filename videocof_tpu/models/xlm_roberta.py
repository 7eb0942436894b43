"""XLM-Roberta text encoder (+ CLIP projection head), TPU-native.

Completes the CLIP pair: `clip_vision.py` carries the ViT-H/14 image tower
the i2v pipeline consumes; this module carries the text tower of the
reference's `XLMRobertaCLIP` (`videox_fun/models/wan_xlm_roberta.py` and
`wan_image_encoder.py:305-327` XLMRobertaWithHead: post-norm roberta, masked
mean pooling, bias-free 2-layer GELU head to the shared embed dim).

Functional (init, forward) over a pytree, matching the repo's model style.
Position ids follow roberta's convention: pad_id + cumsum(mask) * mask.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    out_dim: Optional[int] = 1024     # CLIP head; None = raw hidden states

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# xlm-roberta-large text tower of clip_xlm_roberta_vit_h_14
# (`wan_image_encoder.py:473-500`)
XLMR_LARGE = XLMRobertaConfig()
XLMR_TINY = XLMRobertaConfig(vocab_size=96, max_seq_len=32, dim=32,
                             num_heads=4, num_layers=2, out_dim=16)


def _init_linear(key, din, dout, dtype, bias=True):
    k, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(din)
    p = {"kernel": jax.random.uniform(k, (din, dout), jnp.float32,
                                      -scale, scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def _ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_xlm_roberta(key, cfg: XLMRobertaConfig, dtype=jnp.float32) -> Params:
    it = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    d = cfg.dim
    p: Params = {
        "token_embedding": 0.02 * jax.random.normal(
            next(it), (cfg.vocab_size, d)).astype(dtype),
        "type_embedding": 0.02 * jax.random.normal(
            next(it), (cfg.type_size, d)).astype(dtype),
        "pos_embedding": 0.02 * jax.random.normal(
            next(it), (cfg.max_seq_len, d)).astype(dtype),
        "norm": _ln(d, dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        p["blocks"].append({
            "attn": {n: _init_linear(next(it), d, d, dtype)
                     for n in ("q", "k", "v", "o")},
            "norm1": _ln(d, dtype),
            "fc1": _init_linear(next(it), d, 4 * d, dtype),
            "fc2": _init_linear(next(it), 4 * d, d, dtype),
            "norm2": _ln(d, dtype),
        })
    if cfg.out_dim is not None:
        mid = (d + cfg.out_dim) // 2
        p["head"] = {"fc1": _init_linear(next(it), d, mid, dtype, bias=False),
                     "fc2": _init_linear(next(it), mid, cfg.out_dim, dtype,
                                         bias=False)}
    return p


def _linear(x, p):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _block(bp, cfg, x, mask):
    B, L, D = x.shape
    N, hd = cfg.num_heads, cfg.dim // cfg.num_heads

    def attn_body(h):
        q = _linear(h, bp["attn"]["q"]).reshape(B, L, N, hd)
        k = _linear(h, bp["attn"]["k"]).reshape(B, L, N, hd)
        v = _linear(h, bp["attn"]["v"]).reshape(B, L, N, hd)
        o = attention(q, k, v, mask=mask, backend="xla")
        return _linear(o.reshape(B, L, D), bp["attn"]["o"])

    def ffn_body(h):
        return _linear(jax.nn.gelu(_linear(h, bp["fc1"]),
                                   approximate=False), bp["fc2"])

    if cfg.post_norm:  # roberta: residual then norm
        x = _layer_norm(x + attn_body(x), bp["norm1"], cfg.eps)
        x = _layer_norm(x + ffn_body(x), bp["norm2"], cfg.eps)
    else:
        x = x + attn_body(_layer_norm(x, bp["norm1"], cfg.eps))
        x = x + ffn_body(_layer_norm(x, bp["norm2"], cfg.eps))
    return x


def xlm_roberta_encode(params: Params, cfg: XLMRobertaConfig,
                       ids: jax.Array) -> jax.Array:
    """ids [B, L] int32 -> hidden states [B, L, dim]
    (reference `XLMRoberta.forward`, `wan_xlm_roberta.py:121-145`)."""
    mask = (ids != cfg.pad_id)
    pos = cfg.pad_id + jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask
    x = (params["token_embedding"][ids]
         + params["type_embedding"][jnp.zeros_like(ids)]
         + params["pos_embedding"][pos])
    if cfg.post_norm:
        x = _layer_norm(x, params["norm"], cfg.eps)
    for bp in params["blocks"]:
        x = _block(bp, cfg, x, mask)
    if not cfg.post_norm:
        x = _layer_norm(x, params["norm"], cfg.eps)
    return x


def xlm_roberta_clip_text(params: Params, cfg: XLMRobertaConfig,
                          ids: jax.Array) -> jax.Array:
    """ids [B, L] -> pooled CLIP text embedding [B, out_dim]
    (reference `XLMRobertaWithHead.forward`,
    `wan_image_encoder.py:317-327`: masked mean pool, bias-free GELU head)."""
    x = xlm_roberta_encode(params, cfg, ids)
    m = (ids != cfg.pad_id).astype(x.dtype)[..., None]
    pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)
    h = _linear(pooled, params["head"]["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    return _linear(h, params["head"]["fc2"])


# ------------------------------------------------------------- conversion

def convert_xlm_roberta_state_dict(sd: Dict[str, np.ndarray],
                                   cfg: XLMRobertaConfig,
                                   prefix: str = "",
                                   dtype=np.float32) -> Params:
    """torch keys (`wan_xlm_roberta.py` module tree, optionally under
    ``textual.`` inside the CLIP checkpoint) -> our pytree."""
    g = lambda k: np.asarray(sd[prefix + k]).astype(dtype)
    lin = lambda k: {"kernel": np.ascontiguousarray(g(k + ".weight").T),
                     "bias": g(k + ".bias")}
    ln = lambda k: {"scale": g(k + ".weight"), "bias": g(k + ".bias")}
    p: Params = {
        "token_embedding": g("token_embedding.weight"),
        "type_embedding": g("type_embedding.weight"),
        "pos_embedding": g("pos_embedding.weight"),
        "norm": ln("norm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"blocks.{i}."
        p["blocks"].append({
            "attn": {n: lin(b + "attn." + n) for n in ("q", "k", "v", "o")},
            "norm1": ln(b + "norm1"),
            "fc1": lin(b + "ffn.0"),
            "fc2": lin(b + "ffn.2"),
            "norm2": ln(b + "norm2"),
        })
    if cfg.out_dim is not None and prefix + "head.0.weight" in sd:
        p["head"] = {
            "fc1": {"kernel": np.ascontiguousarray(g("head.0.weight").T)},
            "fc2": {"kernel": np.ascontiguousarray(g("head.2.weight").T)},
        }
    return p
