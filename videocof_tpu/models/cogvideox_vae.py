"""CogVideoX causal 3D VAE.

Rebuild of `videox_fun/models/cogvideox_vae.py` (`AutoencoderKLCogVideoX`):
8x spatial / 4x temporal compression, 16 latent channels. Distinct from the
Wan VAE family in four ways, all reproduced here:

  * causal convs pad time by REPLICATING the first frame (pad_mode "first",
    `cogvideox_vae.py:120-133`), not zeros;
  * GroupNorm(32) statistics span (C/G, T, H, W) — whole-clip, which is why
    the reference's tiled decode changes numerics slightly; we run whole
    sequences so the math is the untiled reference's;
  * the decoder conditions every norm on the latent zq via SpatialNorm3D
    (`:150-199`): f * conv_y(resize(zq)) + conv_b(resize(zq));
  * temporal resampling: downsample = first-frame-keep + avg-pool1d pairs
    (diffusers CogVideoXDownsample3D), upsample = first-frame spatial-only +
    nearest 2x on (t,h,w) for the rest (`:201-273`).

Whole-sequence implementation; TPU memory is handled by the same streaming
strategy as the Wan VAE when needed (roadmap) — the reference's spatial
tiling is a GPU workaround we don't inherit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import wan_vae as W

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    scaling_factor: float = 1.15258426

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


COGVIDEOX_VAE = CogVideoXVAEConfig()
COGVIDEOX_VAE_TINY = CogVideoXVAEConfig(latent_channels=4,
                                        block_out_channels=(8, 8, 16, 16),
                                        layers_per_block=1,
                                        norm_num_groups=4)


# ------------------------------------------------------------------ primitives

def causal_conv3d_first(x, p, stride=(1, 1, 1)):
    """Causal conv with first-frame REPLICATE padding in time."""
    kt, kh, kw = p["kernel"].shape[2:]
    if kt > 1:
        first = jnp.repeat(x[:, :, :1], kt - 1, axis=2)
        x = jnp.concatenate([first, x], axis=2)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    return W.conv3d(x, p, stride=stride,
                    padding=((0, 0), (ph, ph), (pw, pw)))


def group_norm(x, p, groups: int, eps: float):
    """GroupNorm over (C/G, T, H, W) of [B, C, T, H, W]."""
    B, C, T, H, W_ = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T, H, W_)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4, 5), keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, C, T, H, W_)
    out = out * p["scale"].astype(jnp.float32)[None, :, None, None, None]
    out = out + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return out.astype(x.dtype)


def _resize_zq(zq, tgt_shape):
    """nearest resize of zq to f's (T, H, W); odd-T first frame separate
    (`cogvideox_vae.py:180-199`)."""
    B, C = zq.shape[:2]
    T, H, W_ = tgt_shape
    if zq.shape[2] > 1 and T % 2 == 1:
        zf = jax.image.resize(zq[:, :, :1], (B, C, 1, H, W_), "nearest")
        zr = jax.image.resize(zq[:, :, 1:], (B, C, T - 1, H, W_), "nearest")
        return jnp.concatenate([zf, zr], axis=2)
    return jax.image.resize(zq, (B, C, T, H, W_), "nearest")


def spatial_norm3d(x, p, zq, groups, eps=1e-6):
    zq = _resize_zq(zq, x.shape[2:])
    normed = group_norm(x, p["norm"], groups, eps)
    y = causal_conv3d_first(zq, p["conv_y"])
    b = causal_conv3d_first(zq, p["conv_b"])
    return normed * y + b


# ----------------------------------------------------------------------- init

def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, cfg, spatial_norm: bool, dtype):
    ks = jax.random.split(key, 3)
    zc = cfg.latent_channels

    def norm(c):
        if spatial_norm:
            k1, k2 = jax.random.split(jax.random.fold_in(ks[2], c), 2)
            return {"norm": _init_gn(c, dtype),
                    "conv_y": W._init_conv(k1, zc, c, 1, dtype),
                    "conv_b": W._init_conv(k2, zc, c, 1, dtype)}
        return _init_gn(c, dtype)

    p = {
        "norm1": norm(cin),
        "conv1": W._init_conv(ks[0], cin, cout, 3, dtype),
        "norm2": norm(cout),
        "conv2": W._init_conv(ks[1], cout, cout, 3, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = W._init_conv(ks[2], cin, cout, 1, dtype)
    return p


def init_cogvideox_vae(key, cfg: CogVideoXVAEConfig, dtype=jnp.float32
                       ) -> Params:
    it = iter(jax.random.split(key, 512))
    ch = cfg.block_out_channels
    n = len(ch)
    zc = cfg.latent_channels

    enc: Params = {"conv_in": W._init_conv(next(it), cfg.in_channels, ch[0],
                                           3, dtype), "down": []}
    cur = ch[0]
    for i in range(n):
        stage = {"res": []}
        for _ in range(cfg.layers_per_block):
            stage["res"].append(_init_resnet(next(it), cur, ch[i], cfg,
                                             False, dtype))
            cur = ch[i]
        if i != n - 1:
            stage["down_conv"] = W._init_conv(next(it), cur, cur, 3, dtype,
                                              conv2d=True)
        enc["down"].append(stage)
    enc["mid"] = [_init_resnet(next(it), cur, cur, cfg, False, dtype)
                  for _ in range(2)]
    enc["norm_out"] = _init_gn(cur, dtype)
    enc["conv_out"] = W._init_conv(next(it), cur, 2 * zc, 3, dtype)

    rch = list(reversed(ch))
    dec: Params = {"conv_in": W._init_conv(next(it), zc, rch[0], 3, dtype)}
    dec["mid"] = [_init_resnet(next(it), rch[0], rch[0], cfg, True, dtype)
                  for _ in range(2)]
    dec["up"] = []
    cur = rch[0]
    for i in range(n):
        stage = {"res": []}
        for _ in range(cfg.layers_per_block + 1):
            stage["res"].append(_init_resnet(next(it), cur, rch[i], cfg,
                                             True, dtype))
            cur = rch[i]
        if i != n - 1:
            stage["up_conv"] = W._init_conv(next(it), cur, cur, 3, dtype,
                                            conv2d=True)
        dec["up"].append(stage)
    dec["norm_out"] = {"norm": _init_gn(cur, dtype),
                       "conv_y": W._init_conv(next(it), zc, cur, 1, dtype),
                       "conv_b": W._init_conv(next(it), zc, cur, 1, dtype)}
    dec["conv_out"] = W._init_conv(next(it), cur, cfg.in_channels, 3, dtype)

    return {"encoder": enc, "decoder": dec}


# -------------------------------------------------------- checkpoint loading

def convert_cogvideox_vae_state_dict(sd: Dict[str, np.ndarray],
                                     cfg: CogVideoXVAEConfig,
                                     dtype=jnp.float32) -> Params:
    """diffusers-layout `AutoencoderKLCogVideoX` state dict (numpy values) ->
    our pytree. Causal convs live under `.conv` (CogVideoXCausalConv3d wraps
    a SafeConv3d), 1x1x1 resnet shortcuts are bare SafeConv3d, spatial norms
    expose `norm_layer`/`conv_y.conv`/`conv_b.conv`
    (`cogvideox_vae.py:71-199,276-425`). Kernels stay torch-layout
    [O, I, ...] — our conv helpers consume that directly."""
    def conv(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    def gn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], jnp.float32),
                "bias": jnp.asarray(sd[prefix + ".bias"], jnp.float32)}

    def spatial(prefix):
        return {"norm": gn(prefix + ".norm_layer"),
                "conv_y": conv(prefix + ".conv_y.conv"),
                "conv_b": conv(prefix + ".conv_b.conv")}

    def resnet(prefix, spatial_norm):
        p = {
            "norm1": spatial(f"{prefix}.norm1") if spatial_norm
            else gn(f"{prefix}.norm1"),
            "conv1": conv(f"{prefix}.conv1.conv"),
            "norm2": spatial(f"{prefix}.norm2") if spatial_norm
            else gn(f"{prefix}.norm2"),
            "conv2": conv(f"{prefix}.conv2.conv"),
        }
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    n = len(cfg.block_out_channels)
    enc: Params = {"conv_in": conv("encoder.conv_in.conv"), "down": []}
    for i in range(n):
        stage: Params = {"res": [
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", False)
            for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            stage["down_conv"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down"].append(stage)
    enc["mid"] = [resnet(f"encoder.mid_block.resnets.{j}", False)
                  for j in range(2)]
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out.conv")

    dec: Params = {"conv_in": conv("decoder.conv_in.conv")}
    dec["mid"] = [resnet(f"decoder.mid_block.resnets.{j}", True)
                  for j in range(2)]
    dec["up"] = []
    for i in range(n):
        stage = {"res": [
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", True)
            for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            stage["up_conv"] = conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up"].append(stage)
    dec["norm_out"] = spatial("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out.conv")
    return {"encoder": enc, "decoder": dec}


_CONFIG_KEYS = ("in_channels", "latent_channels", "block_out_channels",
                "layers_per_block", "norm_num_groups", "norm_eps",
                "temporal_compression_ratio", "scaling_factor")


def load_cogvideox_vae(model_dir: str, dtype=jnp.float32):
    """diffusers-layout checkpoint dir -> (config, params)
    (`cogvideox_vae.py:1655-1714` from_pretrained layout)."""
    import json
    import os

    from . import weights as W_
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    kw = {k: raw[k] for k in _CONFIG_KEYS if k in raw and raw[k] is not None}
    if "block_out_channels" in kw:
        kw["block_out_channels"] = tuple(kw["block_out_channels"])
    cfg = CogVideoXVAEConfig(**kw)
    sd = W_.load_state_dict(model_dir)
    return cfg, convert_cogvideox_vae_state_dict(sd, cfg, dtype=dtype)


# ---------------------------------------------------------------------- apply

def _resnet_apply(p, cfg, x, zq=None):
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    if zq is not None:
        h = spatial_norm3d(x, p["norm1"], zq, g, eps)
    else:
        h = group_norm(x, p["norm1"], g, eps)
    h = causal_conv3d_first(jax.nn.silu(h), p["conv1"])
    if zq is not None:
        h = spatial_norm3d(h, p["norm2"], zq, g, eps)
    else:
        h = group_norm(h, p["norm2"], g, eps)
    h = causal_conv3d_first(jax.nn.silu(h), p["conv2"])
    sc = x
    if "conv_shortcut" in p:
        sc = W.conv3d(x, p["conv_shortcut"])
    return h + sc


def _downsample(x, p, compress_time: bool):
    if compress_time:
        T = x.shape[2]
        if T % 2 == 1 and T > 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            rest = 0.5 * (rest[:, :, 0::2] + rest[:, :, 1::2])
            x = jnp.concatenate([first, rest], axis=2)
        elif T > 1:
            x = 0.5 * (x[:, :, 0::2] + x[:, :, 1::2])
    # spatial stride-2 conv with (0,1,0,1) pad
    return W.conv2d_frames(x, p, stride=(2, 2), padding=((0, 1), (0, 1)))


def _upsample(x, p, compress_time: bool):
    B, C, T, H, W_ = x.shape
    if compress_time:
        if T > 1 and T % 2 == 1:
            first = jax.image.resize(x[:, :, :1], (B, C, 1, 2 * H, 2 * W_),
                                     "nearest")
            rest = jax.image.resize(x[:, :, 1:],
                                    (B, C, 2 * (T - 1), 2 * H, 2 * W_),
                                    "nearest")
            x = jnp.concatenate([first, rest], axis=2)
        else:
            tt = 2 * T if T > 1 else 1
            x = jax.image.resize(x, (B, C, tt, 2 * H, 2 * W_), "nearest")
    else:
        x = jax.image.resize(x, (B, C, T, 2 * H, 2 * W_), "nearest")
    return W.conv2d_frames(x, p, stride=(1, 1), padding=((1, 1), (1, 1)))


def encode(params: Params, cfg: CogVideoXVAEConfig, video: jax.Array
           ) -> Tuple[jax.Array, jax.Array]:
    """video [B, 3, T, H, W] -> (mu, log_var) (no quant conv in CogVideoX:
    use_quant_conv=False)."""
    import math
    enc = params["encoder"]
    n = len(cfg.block_out_channels)
    tlevel = int(math.log2(cfg.temporal_compression_ratio))
    h = causal_conv3d_first(video, enc["conv_in"])
    for i, stage in enumerate(enc["down"]):
        for rb in stage["res"]:
            h = _resnet_apply(rb, cfg, h)
        if "down_conv" in stage:
            h = _downsample(h, stage["down_conv"], compress_time=i < tlevel)
    for rb in enc["mid"]:
        h = _resnet_apply(rb, cfg, h)
    h = group_norm(h, enc["norm_out"], cfg.norm_num_groups, 1e-6)
    h = causal_conv3d_first(jax.nn.silu(h), enc["conv_out"])
    mu, log_var = jnp.split(h, 2, axis=1)
    return mu, log_var


def decode(params: Params, cfg: CogVideoXVAEConfig, z: jax.Array
           ) -> jax.Array:
    import math
    dec = params["decoder"]
    n = len(cfg.block_out_channels)
    tlevel = int(math.log2(cfg.temporal_compression_ratio))
    h = causal_conv3d_first(z, dec["conv_in"])
    for rb in dec["mid"]:
        h = _resnet_apply(rb, cfg, h, zq=z)
    for i, stage in enumerate(dec["up"]):
        for rb in stage["res"]:
            h = _resnet_apply(rb, cfg, h, zq=z)
        if "up_conv" in stage:
            h = _upsample(h, stage["up_conv"], compress_time=i < tlevel)
    h = spatial_norm3d(h, dec["norm_out"], z, cfg.norm_num_groups, 1e-6)
    h = causal_conv3d_first(jax.nn.silu(h), dec["conv_out"])
    return jnp.clip(h, -1.0, 1.0)
