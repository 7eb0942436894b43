"""CLIP ViT-H/14 vision tower for image-to-video conditioning.

Rebuild of the reference's XLM-Roberta-CLIP visual branch used by i2v models
(`videox_fun/models/wan_image_encoder.py:211-299,470-552`): patch-14 conv
(bias-free, pre-norm variant), CLS token + learned positional embeddings,
pre-norm LN, then the FIRST 31 of 32 pre-norm transformer blocks
(``use_31_block=True`` — `wan_image_encoder.py:527`), yielding [B, 257, 1280]
features with no final norm/head. The text tower isn't needed on the i2v path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .wan_dit import _layer_norm, _linear

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    use_blocks: int = 31       # i2v taps the 31-block features
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_VIT_H_14 = ClipVisionConfig()
CLIP_TINY = ClipVisionConfig(image_size=28, patch_size=14, dim=32,
                             num_heads=4, num_layers=3, use_blocks=2)


def init_clip_vision(key, cfg: ClipVisionConfig, dtype=jnp.float32
                     ) -> Dict[str, Any]:
    gain = 1.0 / math.sqrt(cfg.dim)
    it = iter(jax.random.split(key, 4 * cfg.num_layers + 4))
    psz = cfg.patch_size

    def lin(k, din, dout):
        b = 1.0 / math.sqrt(din)
        return {"kernel": jax.random.uniform(k, (din, dout), jnp.float32,
                                             -b, b).astype(dtype),
                "bias": jnp.zeros((dout,), dtype)}

    def block(bk):
        ks = jax.random.split(bk, 2)
        return {
            "norm1": {"scale": jnp.ones((cfg.dim,), dtype),
                      "bias": jnp.zeros((cfg.dim,), dtype)},
            "qkv": lin(ks[0], cfg.dim, 3 * cfg.dim),
            "proj": lin(ks[1], cfg.dim, cfg.dim),
            "norm2": {"scale": jnp.ones((cfg.dim,), dtype),
                      "bias": jnp.zeros((cfg.dim,), dtype)},
            "fc1": lin(next(it), cfg.dim, cfg.dim * cfg.mlp_ratio),
            "fc2": lin(next(it), cfg.dim * cfg.mlp_ratio, cfg.dim),
        }

    params = {
        # conv kernel in torch layout [O, 3, p, p]; bias-free (pre_norm)
        "patch_embed": {"kernel": (gain * jax.random.normal(
            next(it), (cfg.dim, 3, psz, psz))).astype(dtype)},
        "cls": (gain * jax.random.normal(next(it), (1, 1, cfg.dim))
                ).astype(dtype),
        "pos": (gain * jax.random.normal(
            next(it), (1, cfg.num_patches + 1, cfg.dim))).astype(dtype),
        "pre_norm": {"scale": jnp.ones((cfg.dim,), dtype),
                     "bias": jnp.zeros((cfg.dim,), dtype)},
        "blocks": [block(next(it)) for _ in range(cfg.num_layers)],
    }
    return params


def _vit_block(p, cfg: ClipVisionConfig, x):
    B, L, D = x.shape
    N = cfg.num_heads
    h = _layer_norm(x, cfg.norm_eps, p["norm1"]["scale"], p["norm1"]["bias"])
    qkv = _linear(h.astype(x.dtype), p["qkv"]).reshape(B, L, 3, N, D // N)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = jax.nn.dot_product_attention(q, k, v)
    x = x + _linear(att.reshape(B, L, D), p["proj"]).astype(jnp.float32)
    h = _layer_norm(x, cfg.norm_eps, p["norm2"]["scale"], p["norm2"]["bias"])
    h = _linear(h.astype(x.dtype), p["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p["fc2"])
    return x + h.astype(jnp.float32)


def clip_vision_forward(params, cfg: ClipVisionConfig, images: jax.Array
                        ) -> jax.Array:
    """images [B, 3, H, W], already CLIP-normalized -> [B, 1+P, dim]."""
    B = images.shape[0]
    kern = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        images.astype(kern.dtype), kern,
        (cfg.patch_size, cfg.patch_size), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x.reshape(B, cfg.dim, -1).transpose(0, 2, 1)        # [B, P, D]
    x = jnp.concatenate([jnp.broadcast_to(params["cls"].astype(x.dtype),
                                          (B, 1, cfg.dim)), x], axis=1)
    x = x + params["pos"].astype(x.dtype)
    x = _layer_norm(x, cfg.norm_eps, params["pre_norm"]["scale"],
                    params["pre_norm"]["bias"])
    for p in params["blocks"][: cfg.use_blocks]:
        x = _vit_block(p, cfg, x)
    return x.astype(images.dtype)


def preprocess_frames(frames: jax.Array, cfg: ClipVisionConfig) -> jax.Array:
    """[B, 3, H, W] in [-1, 1] -> CLIP-normalized at image_size (the
    reference resizes bicubic then normalizes — `wan_image_encoder.py:512-522`;
    XLA's resize 'cubic' matches bicubic)."""
    B, C, H, W = frames.shape
    size = cfg.image_size
    x = jax.image.resize(frames.astype(jnp.float32), (B, C, size, size),
                         method="cubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    return (x - mean) / std


def convert_clip_state_dict(sd: Dict[str, np.ndarray], cfg: ClipVisionConfig,
                            dtype=np.float32) -> Dict[str, Any]:
    """torch checkpoint (keys 'visual.*' of XLMRobertaCLIP, possibly without
    the 'model.' prefix the reference wrapper adds) -> our pytree."""
    if not any(k.startswith("visual.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(
            sd[prefix + ".weight"].T).astype(dtype),
            "bias": sd[prefix + ".bias"].astype(dtype)}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"].astype(dtype),
                "bias": sd[prefix + ".bias"].astype(dtype)}

    params = {
        "patch_embed": {"kernel":
                        sd["visual.patch_embedding.weight"].astype(dtype)},
        "cls": sd["visual.cls_embedding"].astype(dtype),
        "pos": sd["visual.pos_embedding"].astype(dtype),
        "pre_norm": ln("visual.pre_norm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"visual.transformer.{i}."
        params["blocks"].append({
            "norm1": ln(b + "norm1"),
            "qkv": lin(b + "attn.to_qkv"),
            "proj": lin(b + "attn.proj"),
            "norm2": ln(b + "norm2"),
            "fc1": lin(b + "mlp.0"),
            "fc2": lin(b + "mlp.2"),
        })
    return params
