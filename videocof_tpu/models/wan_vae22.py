"""Wan2.2 (3.8-style) video VAE — 16x spatial / 4x temporal, 48 latent
channels (used by Wan2.2-TI2V-5B).

Rebuild of `videox_fun/models/wan_vae3_8.py`: pixel-space 2x2 patchify in
front of the encoder (3 -> 12 channels, so 2x of the 16x spatial compression
is free — `wan_vae3_8.py:285-318,792,847`), Down/Up residual stages with
parameter-free AvgDown3D / DupUp3D shortcut paths (`:321-418`), channel-
preserving resamples (`:76-116`), encoder dim 160 / decoder dim 256, and
per-channel latent stats over 48 channels.

Whole-sequence implementation (shares every primitive with `wan_vae.py`; the
first-chunk temporal-resample semantics are identical to Wan2.1's and the
derived full-seq equivalents carry over). The cache-carrying streaming
variant lives in `wan_vae22_streaming.py` (exact-equality tested).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import wan_vae as W

Params = Dict[str, Any]

# 48-channel latent normalization (reference `wan_vae3_8.py:906-1009`)
WAN22_LATENT_MEAN = (
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
)
WAN22_LATENT_STD = (
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
)


@dataclasses.dataclass(frozen=True)
class Wan22VAEConfig:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    patch_size: int = 2
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 16
    latent_mean: Tuple[float, ...] = WAN22_LATENT_MEAN
    latent_std: Tuple[float, ...] = WAN22_LATENT_STD

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


WAN22_VAE_TINY = Wan22VAEConfig(dim=8, dec_dim=8, z_dim=4,
                                dim_mult=(1, 2, 2, 2), num_res_blocks=1,
                                latent_mean=(0.0,) * 4, latent_std=(1.0,) * 4)


# --------------------------------------------------------------- primitives

def patchify2(x: jax.Array, p: int) -> jax.Array:
    """[B, C, T, H, W] -> [B, C*p*p, T, H/p, W/p], channel order (c, r, q)
    matching the reference einops pattern 'b c f (h q) (w r) -> b (c r q) f h w'."""
    if p == 1:
        return x
    B, C, T, H, W = x.shape
    x = x.reshape(B, C, T, H // p, p, W // p, p)
    # -> b c r q f h w: q indexes within-H, r within-W
    x = x.transpose(0, 1, 6, 4, 2, 3, 5)
    return x.reshape(B, C * p * p, T, H // p, W // p)


def unpatchify2(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    B, CP, T, H, W = x.shape
    C = CP // (p * p)
    x = x.reshape(B, C, p, p, T, H, W)
    x = x.transpose(0, 1, 4, 5, 3, 6, 2)  # b c f h q w r
    return x.reshape(B, C, T, H * p, W * p)


def avg_down3d(x: jax.Array, out_channels: int, factor_t: int,
               factor_s: int) -> jax.Array:
    """Parameter-free space-time average pool with channel regrouping
    (`wan_vae3_8.py:321-373`); front-pads time with zeros to a multiple."""
    B, C, T, H, W = x.shape
    pad_t = (factor_t - T % factor_t) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_t, 0), (0, 0), (0, 0)))
        T += pad_t
    f = factor_t * factor_s * factor_s
    x = x.reshape(B, C, T // factor_t, factor_t, H // factor_s, factor_s,
                  W // factor_s, factor_s)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(B, C * f, T // factor_t, H // factor_s, W // factor_s)
    group = C * f // out_channels
    x = x.reshape(B, out_channels, group, T // factor_t, H // factor_s,
                  W // factor_s)
    return x.mean(axis=2)


def dup_up3d(x: jax.Array, out_channels: int, factor_t: int, factor_s: int,
             trim_first: bool = True) -> jax.Array:
    """Channel-duplicating space-time unpool (`wan_vae3_8.py:375-418`);
    ``trim_first`` drops the duplicated leading frames (whole-seq equivalent
    of the reference's first_chunk trim)."""
    B, C, T, H, W = x.shape
    f = factor_t * factor_s * factor_s
    repeats = out_channels * f // C
    x = jnp.repeat(x, repeats, axis=1)
    x = x.reshape(B, out_channels, factor_t, factor_s, factor_s, T, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(B, out_channels, T * factor_t, H * factor_s, W * factor_s)
    if trim_first and factor_t > 1:
        x = x[:, :, factor_t - 1:]
    return x


# -------------------------------------------------------------------- init

def _init_stage_down(it, cin, cout, cfg, tdown, down_flag, dtype):
    stage: Params = {"res": []}
    c = cin
    for _ in range(cfg.num_res_blocks):
        stage["res"].append(W._init_res_block(next(it), c, cout, dtype))
        c = cout
    if down_flag:
        stage["resample"] = {"conv": W._init_conv(next(it), cout, cout, 3,
                                                  dtype, conv2d=True)}
        if tdown:
            stage["resample"]["time_conv"] = W._init_conv(
                next(it), cout, cout, (3, 1, 1), dtype)
    return stage


def _init_stage_up(it, cin, cout, cfg, tup, up_flag, dtype):
    stage: Params = {"res": []}
    c = cin
    for _ in range(cfg.num_res_blocks + 1):
        stage["res"].append(W._init_res_block(next(it), c, cout, dtype))
        c = cout
    if up_flag:
        stage["resample"] = {"conv": W._init_conv(next(it), cout, cout, 3,
                                                  dtype, conv2d=True)}
        if tup:
            stage["resample"]["time_conv"] = W._init_conv(
                next(it), cout, cout * 2, (3, 1, 1), dtype)
    return stage


def init_wan22_vae(key, cfg: Wan22VAEConfig, dtype=jnp.float32) -> Params:
    it = iter(jax.random.split(key, 512))
    p2 = cfg.patch_size * cfg.patch_size
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    n = len(cfg.dim_mult)

    enc: Params = {"conv1": W._init_conv(next(it), 3 * p2, dims[0], 3, dtype),
                   "down": []}
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        enc["down"].append(_init_stage_down(
            it, cin, cout, cfg, cfg.temporal_downsample[i]
            if i < len(cfg.temporal_downsample) else False,
            i != n - 1, dtype))
    enc["mid_rb1"] = W._init_res_block(next(it), dims[-1], dims[-1], dtype)
    enc["mid_attn"] = W._init_attn_block(next(it), dims[-1], dtype)
    enc["mid_rb2"] = W._init_res_block(next(it), dims[-1], dims[-1], dtype)
    enc["head_norm"] = {"gamma": jnp.ones((dims[-1], 1, 1, 1), dtype)}
    enc["head_conv"] = W._init_conv(next(it), dims[-1], cfg.z_dim * 2, 3,
                                    dtype)

    ddims = [cfg.dec_dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    t_up = tuple(reversed(cfg.temporal_downsample))
    dec: Params = {"conv1": W._init_conv(next(it), cfg.z_dim, ddims[0], 3,
                                         dtype)}
    dec["mid_rb1"] = W._init_res_block(next(it), ddims[0], ddims[0], dtype)
    dec["mid_attn"] = W._init_attn_block(next(it), ddims[0], dtype)
    dec["mid_rb2"] = W._init_res_block(next(it), ddims[0], ddims[0], dtype)
    dec["up"] = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        dec["up"].append(_init_stage_up(
            it, cin, cout, cfg, t_up[i] if i < len(t_up) else False,
            i != n - 1, dtype))
    dec["head_norm"] = {"gamma": jnp.ones((ddims[-1], 1, 1, 1), dtype)}
    dec["head_conv"] = W._init_conv(next(it), ddims[-1], 3 * p2, 3, dtype)

    return {
        "encoder": enc,
        "quant_conv": W._init_conv(next(it), cfg.z_dim * 2, cfg.z_dim * 2, 1,
                                   dtype),
        "post_quant_conv": W._init_conv(next(it), cfg.z_dim, cfg.z_dim, 1,
                                        dtype),
        "decoder": dec,
    }


# -------------------------------------------------------------- conversion

def convert_wan22_vae_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: Wan22VAEConfig,
                                 dtype=np.float32) -> Params:
    """Wan2.2 (3.8-style) checkpoint keys -> :func:`init_wan22_vae` pytree.

    Differs from the Wan2.1 layout (`weights.convert_vae_state_dict`) in the
    per-stage nesting: ``encoder.downsamples.{i}`` is a ``Down_ResidualBlock``
    holding its own ``.downsamples`` Sequential (`wan_vae3_8.py:420-457`),
    and ``decoder.upsamples.{i}.upsamples`` mirrors it with
    ``num_res_blocks+1`` residual blocks (`:460-502`). The AvgDown3D /
    DupUp3D shortcut paths are parameter-free. Wrapper convs ``conv1`` /
    ``conv2`` map to quant/post-quant (`:771-772`).
    """
    from .weights import _attn_block, _conv, _res_block

    if not any(k.startswith("encoder.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    n = len(cfg.dim_mult)

    enc: Params = {"conv1": _conv(sd, "encoder.conv1", dtype), "down": []}
    for i in range(n):
        pre = f"encoder.downsamples.{i}.downsamples"
        stage: Params = {"res": [
            _res_block(sd, f"{pre}.{j}", dtype)
            for j in range(cfg.num_res_blocks)]}
        if i != n - 1:
            rs = f"{pre}.{cfg.num_res_blocks}"
            stage["resample"] = {"conv": _conv(sd, rs + ".resample.1", dtype)}
            if rs + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, rs + ".time_conv",
                                                       dtype)
        enc["down"].append(stage)
    enc["mid_rb1"] = _res_block(sd, "encoder.middle.0", dtype)
    enc["mid_attn"] = _attn_block(sd, "encoder.middle.1", dtype)
    enc["mid_rb2"] = _res_block(sd, "encoder.middle.2", dtype)
    enc["head_norm"] = {"gamma": sd["encoder.head.0.gamma"].astype(dtype)}
    enc["head_conv"] = _conv(sd, "encoder.head.2", dtype)

    dec: Params = {"conv1": _conv(sd, "decoder.conv1", dtype)}
    dec["mid_rb1"] = _res_block(sd, "decoder.middle.0", dtype)
    dec["mid_attn"] = _attn_block(sd, "decoder.middle.1", dtype)
    dec["mid_rb2"] = _res_block(sd, "decoder.middle.2", dtype)
    dec["up"] = []
    for i in range(n):
        pre = f"decoder.upsamples.{i}.upsamples"
        stage = {"res": [
            _res_block(sd, f"{pre}.{j}", dtype)
            for j in range(cfg.num_res_blocks + 1)]}
        if i != n - 1:
            rs = f"{pre}.{cfg.num_res_blocks + 1}"
            stage["resample"] = {"conv": _conv(sd, rs + ".resample.1", dtype)}
            if rs + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, rs + ".time_conv",
                                                       dtype)
        dec["up"].append(stage)
    dec["head_norm"] = {"gamma": sd["decoder.head.0.gamma"].astype(dtype)}
    dec["head_conv"] = _conv(sd, "decoder.head.2", dtype)

    return {
        "encoder": enc,
        "quant_conv": _conv(sd, "conv1", dtype),
        "post_quant_conv": _conv(sd, "conv2", dtype),
        "decoder": dec,
    }


# ------------------------------------------------------------------- apply

def _spatial_up_keep(x, p):
    # channel-preserving upsample conv (`wan_vae3_8.py:91-101`)
    return W.conv2d_frames(W._nearest_up2(x), p, stride=(1, 1),
                           padding=((1, 1), (1, 1)))


def _down_stage(stage, cfg, x, tdown, down_flag, cout):
    shortcut_in = x
    h = x
    for rb in stage["res"]:
        h = W.res_block_apply(rb, h)
    if down_flag:
        if tdown:
            h = W.encoder_downsample3d(h, stage["resample"])
        else:
            h = W._spatial_down(h, stage["resample"]["conv"])
    sc = avg_down3d(shortcut_in, cout,
                    factor_t=2 if (tdown and down_flag) else 1,
                    factor_s=2 if down_flag else 1)
    return h + sc


def _up_stage(stage, cfg, x, tup, up_flag, cout):
    h = x
    for rb in stage["res"]:
        h = W.res_block_apply(rb, h)
    if up_flag:
        if tup:
            h = W.decoder_upsample3d(h, {"conv": stage["resample"]["conv"],
                                         "time_conv":
                                         stage["resample"]["time_conv"]})
        else:
            h = _spatial_up_keep(h, stage["resample"]["conv"])
        sc = dup_up3d(x, cout, factor_t=2 if tup else 1, factor_s=2)
        return h + sc
    return h


def encode(params: Params, cfg: Wan22VAEConfig, video: jax.Array
           ) -> Tuple[jax.Array, jax.Array]:
    x = patchify2(video, cfg.patch_size)
    p = params["encoder"]
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    n = len(cfg.dim_mult)
    h = W.causal_conv3d(x, p["conv1"])
    for i, stage in enumerate(p["down"]):
        tdown = cfg.temporal_downsample[i] if i < len(
            cfg.temporal_downsample) else False
        h = _down_stage(stage, cfg, h, tdown, i != n - 1, dims[i + 1])
    h = W.res_block_apply(p["mid_rb1"], h)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = W.res_block_apply(p["mid_rb2"], h)
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = W.causal_conv3d(jax.nn.silu(h), p["head_conv"])
    feats = W.causal_conv3d(h, params["quant_conv"])
    mu, log_var = jnp.split(feats, 2, axis=1)
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(
        mu.dtype)[None, :, None, None, None]
    return (mu - mean) * inv_std, log_var


def decode(params: Params, cfg: Wan22VAEConfig, z: jax.Array) -> jax.Array:
    mean = jnp.asarray(cfg.latent_mean, z.dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(
        z.dtype)[None, :, None, None, None]
    z = z / inv_std + mean
    x = W.causal_conv3d(z, params["post_quant_conv"])
    p = params["decoder"]
    ddims = [cfg.dec_dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    t_up = tuple(reversed(cfg.temporal_downsample))
    n = len(cfg.dim_mult)
    h = W.causal_conv3d(x, p["conv1"])
    h = W.res_block_apply(p["mid_rb1"], h)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = W.res_block_apply(p["mid_rb2"], h)
    for i, stage in enumerate(p["up"]):
        tup = t_up[i] if i < len(t_up) else False
        h = _up_stage(stage, cfg, h, tup, i != n - 1, ddims[i + 1])
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = W.causal_conv3d(jax.nn.silu(h), p["head_conv"])
    out = unpatchify2(h, cfg.patch_size)
    return jnp.clip(out, -1.0, 1.0)
