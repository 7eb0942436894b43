"""2D KL-VAE decoder (diffusers ``AutoencoderKL`` layout) — Flux/SD pixels.

The reference leans on the external diffusers ``AutoencoderKL`` for the
Flux family (`videox_fun/models/__init__.py:3`; its Flux pipeline decodes
packed latents through ``vae.decode``). This module makes the measured
Flux-dev fp8 path produce pixels with no outside code: the standard
SD-architecture decoder — conv_in, mid (resnet / single-head attention /
resnet), UpDecoderBlocks of ``layers_per_block + 1`` resnets with nearest-2x
upsamplers, GroupNorm(32) + silu + conv_out — rebuilt functionally over
pytrees like every other model here.

Only the decoder is implemented (the serving path never encodes images);
``convert_kl_vae_state_dict`` ingests the diffusers checkpoint layout
(``decoder.*`` / ``post_quant_conv``), and the numerics are oracle-tested
against an independent torch-functional forward built from the same state
dict (tests/test_kl_vae.py).

Flux specifics (black-forest-labs FLUX.1 ``vae/config.json``): 16 latent
channels, no quant convs, ``z / scaling_factor + shift_factor`` before
decode.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class KLVAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.3611
    shift_factor: Optional[float] = 0.1159
    use_post_quant_conv: bool = False
    mid_block_add_attention: bool = True

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


FLUX_KL_VAE = KLVAEConfig()
SD_KL_VAE = KLVAEConfig(latent_channels=4, scaling_factor=0.18215,
                        shift_factor=None, use_post_quant_conv=True)
KL_VAE_TINY = KLVAEConfig(latent_channels=4, block_out_channels=(8, 12),
                          layers_per_block=1, norm_num_groups=4,
                          scaling_factor=0.5, shift_factor=0.1)


# ------------------------------------------------------------------ primitives

def conv2d(x, p, stride=(1, 1), padding=((1, 1), (1, 1))):
    """NCHW conv with torch-layout kernel [O, I, kh, kw]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=padding, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def group_norm2d(x, p, groups: int, eps: float):
    B, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, C, H, W)
    out = out * p["scale"].astype(jnp.float32)[None, :, None, None]
    return (out + p["bias"].astype(jnp.float32)[None, :, None, None]
            ).astype(x.dtype)


def _resnet(p, x, cfg: KLVAEConfig):
    h = group_norm2d(x, p["norm1"], cfg.norm_num_groups, cfg.norm_eps)
    h = conv2d(jax.nn.silu(h), p["conv1"])
    h = group_norm2d(h, p["norm2"], cfg.norm_num_groups, cfg.norm_eps)
    h = conv2d(jax.nn.silu(h), p["conv2"])
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"], padding=((0, 0), (0, 0)))
    return x + h


def _attention(p, x, cfg: KLVAEConfig):
    """diffusers VAE mid attention: GroupNorm then ONE head over the full
    channel dim, tokens = spatial positions."""
    B, C, H, W = x.shape
    h = group_norm2d(x, p["norm"], cfg.norm_num_groups, cfg.norm_eps)
    t = h.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, HW, C]

    def lin(name, v):
        return v @ p[name]["kernel"].astype(v.dtype) + \
            p[name]["bias"].astype(v.dtype)

    q, k, v = lin("q", t), lin("k", t), lin("v", t)
    logits = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(
        0, 2, 1)) / np.sqrt(C)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = lin("proj", attn @ v)
    return x + o.transpose(0, 2, 1).reshape(B, C, H, W)


# ----------------------------------------------------------------------- init

def _init_conv(key, cin, cout, ksize, dtype):
    fan = cin * ksize * ksize
    k = jax.random.normal(key, (cout, cin, ksize, ksize), dtype) / np.sqrt(fan)
    return {"kernel": k, "bias": jnp.zeros((cout,), dtype)}


def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, cfg, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _init_gn(cin, dtype),
         "conv1": _init_conv(k1, cin, cout, 3, dtype),
         "norm2": _init_gn(cout, dtype),
         "conv2": _init_conv(k2, cout, cout, 3, dtype)}
    if cin != cout:
        p["shortcut"] = _init_conv(k3, cin, cout, 1, dtype)
    return p


def _init_attention(key, c, dtype):
    ks = jax.random.split(key, 4)

    def lin(k):
        return {"kernel": jax.random.normal(k, (c, c), dtype) / np.sqrt(c),
                "bias": jnp.zeros((c,), dtype)}

    return {"norm": _init_gn(c, dtype), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "proj": lin(ks[3])}


def init_kl_vae_decoder(key, cfg: KLVAEConfig, dtype=jnp.float32) -> Params:
    rev = list(reversed(cfg.block_out_channels))
    it = iter(jax.random.split(key, 8 + 8 * len(rev)))
    p: Params = {
        "conv_in": _init_conv(next(it), cfg.latent_channels, rev[0], 3,
                              dtype),
        "mid_resnet1": _init_resnet(next(it), rev[0], rev[0], cfg, dtype),
        "mid_resnet2": _init_resnet(next(it), rev[0], rev[0], cfg, dtype),
        "norm_out": _init_gn(rev[-1], dtype),
        "conv_out": _init_conv(next(it), rev[-1], cfg.out_channels, 3,
                               dtype),
    }
    if cfg.mid_block_add_attention:
        p["mid_attn"] = _init_attention(next(it), rev[0], dtype)
    if cfg.use_post_quant_conv:
        p["post_quant_conv"] = _init_conv(
            next(it), cfg.latent_channels, cfg.latent_channels, 1, dtype)
    ups = []
    prev = rev[0]
    for i, ch in enumerate(rev):
        blk = {"resnets": [
            _init_resnet(next(it), prev if j == 0 else ch, ch, cfg, dtype)
            for j in range(cfg.layers_per_block + 1)]}
        if i != len(rev) - 1:
            blk["upsample"] = _init_conv(next(it), ch, ch, 3, dtype)
        ups.append(blk)
        prev = ch
    p["up_blocks"] = ups
    return p


# -------------------------------------------------------------------- forward

def decode(params: Params, cfg: KLVAEConfig, z: jax.Array) -> jax.Array:
    """[B, C_z, h, w] (already un-scaled/shifted) -> [B, 3, 8h, 8w]...
    (upsampling factor = 2^(len(block_out_channels) - 1)). Unclamped, like
    diffusers; callers clip to [-1, 1]."""
    if cfg.use_post_quant_conv:
        z = conv2d(z, params["post_quant_conv"], padding=((0, 0), (0, 0)))
    h = conv2d(z, params["conv_in"])
    h = _resnet(params["mid_resnet1"], h, cfg)
    if cfg.mid_block_add_attention:
        h = _attention(params["mid_attn"], h, cfg)
    h = _resnet(params["mid_resnet2"], h, cfg)
    for blk in params["up_blocks"]:
        for rp in blk["resnets"]:
            h = _resnet(rp, h, cfg)
        if "upsample" in blk:
            B, C, H, W = h.shape
            h = jax.image.resize(h, (B, C, 2 * H, 2 * W), "nearest")
            h = conv2d(h, blk["upsample"])
    h = group_norm2d(h, params["norm_out"], cfg.norm_num_groups,
                     cfg.norm_eps)
    return conv2d(jax.nn.silu(h), params["conv_out"])


def decode_latents(params: Params, cfg: KLVAEConfig, z: jax.Array,
                   compute_dtype=None) -> jax.Array:
    """Model-space latents -> [-1, 1]-clipped float32 pixels: applies the
    diffusers convention ``z / scaling_factor + shift_factor`` first."""
    z = z.astype(compute_dtype or z.dtype)
    z = z / cfg.scaling_factor
    if cfg.shift_factor is not None:
        z = z + cfg.shift_factor
    return jnp.clip(decode(params, cfg, z).astype(jnp.float32), -1.0, 1.0)


def make_decode_fn(params: Params, cfg: KLVAEConfig, compute_dtype=None):
    """A jitted ``decode_fn`` for ``FluxPipeline`` (pipeline/
    image_pipelines.py): unpacked latents [B, C_z, h, w] -> pixels."""
    fn = jax.jit(lambda z: decode_latents(params, cfg, z,
                                          compute_dtype=compute_dtype))
    return fn


# ---------------------------------------------------- checkpoint ingestion

def config_from_checkpoint(vae_dir: str) -> KLVAEConfig:
    with open(os.path.join(vae_dir, "config.json")) as f:
        raw = json.load(f)
    return KLVAEConfig(
        latent_channels=raw.get("latent_channels", 4),
        out_channels=raw.get("out_channels", 3),
        block_out_channels=tuple(raw.get("block_out_channels",
                                         (128, 256, 512, 512))),
        layers_per_block=raw.get("layers_per_block", 2),
        norm_num_groups=raw.get("norm_num_groups", 32),
        scaling_factor=raw.get("scaling_factor", 0.18215),
        shift_factor=raw.get("shift_factor"),
        use_post_quant_conv=raw.get("use_post_quant_conv", True),
        mid_block_add_attention=raw.get("mid_block_add_attention", True))


def convert_kl_vae_state_dict(sd: Dict[str, np.ndarray], cfg: KLVAEConfig,
                              dtype=np.float32) -> Params:
    """diffusers ``AutoencoderKL`` state dict (numpy values) -> decoder
    pytree. Attention projections arrive as torch Linear [out, in] and are
    transposed to our [in, out] matmul layout; convs keep [O, I, kh, kw]."""

    def conv(prefix):
        return {"kernel": np.asarray(sd[f"{prefix}.weight"], dtype),
                "bias": np.asarray(sd[f"{prefix}.bias"], dtype)}

    def gn(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"], dtype),
                "bias": np.asarray(sd[f"{prefix}.bias"], dtype)}

    def lin(prefix):
        return {"kernel": np.asarray(sd[f"{prefix}.weight"], dtype).T,
                "bias": np.asarray(sd[f"{prefix}.bias"], dtype)}

    def resnet(prefix):
        p = {"norm1": gn(f"{prefix}.norm1"), "conv1": conv(f"{prefix}.conv1"),
             "norm2": gn(f"{prefix}.norm2"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    d = "decoder"
    p: Params = {
        "conv_in": conv(f"{d}.conv_in"),
        "mid_resnet1": resnet(f"{d}.mid_block.resnets.0"),
        "mid_resnet2": resnet(f"{d}.mid_block.resnets.1"),
        "norm_out": gn(f"{d}.conv_norm_out"),
        "conv_out": conv(f"{d}.conv_out"),
    }
    if cfg.mid_block_add_attention:
        a = f"{d}.mid_block.attentions.0"
        p["mid_attn"] = {"norm": gn(f"{a}.group_norm"),
                         "q": lin(f"{a}.to_q"), "k": lin(f"{a}.to_k"),
                         "v": lin(f"{a}.to_v"), "proj": lin(f"{a}.to_out.0")}
    if cfg.use_post_quant_conv:
        p["post_quant_conv"] = conv("post_quant_conv")
    ups = []
    for i in range(len(cfg.block_out_channels)):
        blk = {"resnets": [resnet(f"{d}.up_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"{d}.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = conv(f"{d}.up_blocks.{i}.upsamplers.0.conv")
        ups.append(blk)
    p["up_blocks"] = ups
    return p


def load_kl_vae(vae_dir: str, dtype=jnp.bfloat16):
    """vae/ checkpoint dir (config.json + safetensors) -> (cfg, params on
    device)."""
    from . import weights
    cfg = config_from_checkpoint(vae_dir)
    sd = weights.load_state_dict(vae_dir)
    import ml_dtypes
    npdt = (np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16
            else np.dtype("float32"))
    params = convert_kl_vae_state_dict(sd, cfg, dtype=npdt)
    return cfg, jax.tree.map(jnp.asarray, params)
