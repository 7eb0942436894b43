"""Causal 3D video VAE (Wan2.1 family), TPU-native.

Functional rebuild of the reference `videox_fun/models/wan_vae.py`: 8x8
spatial / 4x temporal compression, 16 latent channels, per-channel latent
normalization baked into encode/decode (`wan_vae.py:630-640`).

The reference streams chunks (1+4+4+... on encode, frame-by-frame on decode)
through per-conv feature caches (`wan_vae.py:520-575`) to bound memory. That
stateful cache machinery is mathematically equivalent to *whole-sequence*
causal convolution, with two first-chunk special cases we reproduce exactly:

  * encoder temporal downsample (`Resample` 'downsample3d', `wan_vae.py:147-163`):
    frame 0 bypasses the stride-2 time conv (the first 1-frame chunk only
    primes the cache), so the full-seq equivalent is
    ``concat([x[:, :, :1], valid_stride2_conv(x)])`` — giving 1+2n -> 1+n.
  * decoder temporal upsample ('upsample3d' with the 'Rep' sentinel,
    `wan_vae.py:107-141`): frame 0 is never temporally doubled and never
    enters the time conv; frames 1..T-1 go through a causal (left-pad 2)
    conv whose 2c output channels interleave into two output frames — giving
    1 + 2(T-1).

Whole-sequence conv keeps the MXU busy instead of running T tiny convs; a
chunked `lax.scan` variant for memory-bounded long videos reuses the same
params (see `encode_chunked`).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanVAEConfig

Params = Dict[str, Any]

CACHE_T = 2  # reference cache depth (`wan_vae.py:18`)


# ------------------------------------------------------------------ primitives

def conv3d(x, p, stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    """NCDHW conv with torch-layout kernel [O, I, kt, kh, kw]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None, None]
    return y


def causal_conv3d(x, p, stride=(1, 1, 1)):
    """CausalConv3d (`wan_vae.py:21-40`): time pads 2*pad_t on the left only,
    spatial pads symmetric, where pad = (k-1)//2 per axis."""
    kt, kh, kw = p["kernel"].shape[2:]
    pt, phh, pww = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    return conv3d(x, p, stride=stride,
                  padding=((2 * pt, 0), (phh, phh), (pww, pww)))


def conv2d_frames(x, p, stride=(1, 1), padding=((0, 0), (0, 0))):
    """Apply a 2D conv [O, I, kh, kw] to every frame of [B, C, T, H, W]."""
    B, C, T, H, W = x.shape
    xt = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    y = jax.lax.conv_general_dilated(
        xt, p["kernel"].astype(x.dtype), window_strides=stride,
        padding=padding, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    O, Ho, Wo = y.shape[1:]
    return y.reshape(B, T, O, Ho, Wo).transpose(0, 2, 1, 3, 4)


def channel_rms_norm(x, gamma, bias=None):
    """VAE RMS_norm (`wan_vae.py:43-58`): F.normalize over channel dim *
    sqrt(C) * gamma (+ bias)."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=1, keepdims=True))
    norm = jnp.maximum(norm, 1e-12)
    c = x.shape[1]
    out = xf / norm * math.sqrt(c) * gamma.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x)


# ----------------------------------------------------------------------- init

def _init_conv(key, cin, cout, ksize, dtype, conv2d=False):
    if isinstance(ksize, int):
        ksize = (ksize,) * (2 if conv2d else 3)
    fan_in = cin * int(np.prod(ksize))
    bound = 1.0 / math.sqrt(fan_in)
    shape = (cout, cin) + tuple(ksize)
    return {
        "kernel": jax.random.uniform(key, shape, jnp.float32, -bound,
                                     bound).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_res_block(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin, 1, 1, 1), dtype)},
        "conv1": _init_conv(k1, cin, cout, 3, dtype),
        "norm2": {"gamma": jnp.ones((cout, 1, 1, 1), dtype)},
        "conv2": _init_conv(k2, cout, cout, 3, dtype),
    }
    if cin != cout:
        p["shortcut"] = _init_conv(k3, cin, cout, 1, dtype)
    return p


def _init_attn_block(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    p = {
        "norm": {"gamma": jnp.ones((dim, 1, 1), dtype)},
        "qkv": _init_conv(k1, dim, dim * 3, 1, dtype, conv2d=True),
        "proj": _init_conv(k2, dim, dim, 1, dtype, conv2d=True),
    }
    # reference zero-inits proj weight (`wan_vae.py:242`)
    p["proj"]["kernel"] = jnp.zeros_like(p["proj"]["kernel"])
    return p


def init_wan_vae(key, cfg: WanVAEConfig, dtype=jnp.float32) -> Params:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    z2 = cfg.z_dim * 2
    it = iter(jax.random.split(key, 256))

    # ---- encoder
    enc: Params = {"conv1": _init_conv(next(it), 3, dims[0], 3, dtype),
                   "down": []}
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        stage: Params = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(_init_res_block(next(it), c, cout, dtype))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {"conv": _init_conv(next(it), cout, cout, 3,
                                                    dtype, conv2d=True)}
            if cfg.temporal_downsample[i]:
                stage["resample"]["time_conv"] = _init_conv(
                    next(it), cout, cout, (3, 1, 1), dtype)
        enc["down"].append(stage)
    enc["mid_rb1"] = _init_res_block(next(it), dims[-1], dims[-1], dtype)
    enc["mid_attn"] = _init_attn_block(next(it), dims[-1], dtype)
    enc["mid_rb2"] = _init_res_block(next(it), dims[-1], dims[-1], dtype)
    enc["head_norm"] = {"gamma": jnp.ones((dims[-1], 1, 1, 1), dtype)}
    enc["head_conv"] = _init_conv(next(it), dims[-1], z2, 3, dtype)

    # ---- decoder
    ddims = [cfg.dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    dec: Params = {"conv1": _init_conv(next(it), cfg.z_dim, ddims[0], 3, dtype)}
    dec["mid_rb1"] = _init_res_block(next(it), ddims[0], ddims[0], dtype)
    dec["mid_attn"] = _init_attn_block(next(it), ddims[0], dtype)
    dec["mid_rb2"] = _init_res_block(next(it), ddims[0], ddims[0], dtype)
    dec["up"] = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i > 0:
            cin = cin // 2  # previous upsample halved channels
        stage = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(_init_res_block(next(it), c, cout, dtype))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {"conv": _init_conv(next(it), cout, cout // 2,
                                                    3, dtype, conv2d=True)}
            if temporal_upsample[i]:
                stage["resample"]["time_conv"] = _init_conv(
                    next(it), cout, cout * 2, (3, 1, 1), dtype)
        dec["up"].append(stage)
    dec["head_norm"] = {"gamma": jnp.ones((ddims[-1], 1, 1, 1), dtype)}
    dec["head_conv"] = _init_conv(next(it), ddims[-1], 3, 3, dtype)

    return {
        "encoder": enc,
        "quant_conv": _init_conv(next(it), z2, z2, 1, dtype),
        "post_quant_conv": _init_conv(next(it), cfg.z_dim, cfg.z_dim, 1, dtype),
        "decoder": dec,
    }


# ---------------------------------------------------------------------- blocks

def res_block_apply(p, x):
    h = causal_conv3d(x, p["shortcut"]) if "shortcut" in p else x
    y = channel_rms_norm(x, p["norm1"]["gamma"])
    y = causal_conv3d(_silu(y), p["conv1"])
    y = channel_rms_norm(y, p["norm2"]["gamma"])
    y = causal_conv3d(_silu(y), p["conv2"])
    return y + h


def attn_block_apply(p, x):
    """Single-head per-frame spatial attention (`wan_vae.py:227-266`)."""
    B, C, T, H, W = x.shape
    ident = x
    y = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    y = channel_rms_norm(
        y.reshape(B * T, C, 1, H, W), p["norm"]["gamma"][:, None]
    ).reshape(B * T, C, H, W)
    qkv = jax.lax.conv_general_dilated(
        y, p["qkv"]["kernel"].astype(y.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    qkv = qkv + p["qkv"]["bias"].astype(y.dtype)[None, :, None, None]
    qkv = qkv.reshape(B * T, 3 * C, H * W).transpose(0, 2, 1)  # [BT, HW, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(C)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32)).astype(x.dtype)
    o = o.transpose(0, 2, 1).reshape(B * T, C, H, W)
    o = jax.lax.conv_general_dilated(
        o, p["proj"]["kernel"].astype(o.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    o = o + p["proj"]["bias"].astype(o.dtype)[None, :, None, None]
    o = o.reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)
    return o + ident


def _nearest_up2(x):
    """2x nearest-exact spatial upsample of [B, C, T, H, W]. (The reference
    upcasts to fp32 only because torch's nearest interp lacks a bf16 kernel —
    `wan_vae.py:61-67`; pure repetition has no arithmetic, so we keep dtype
    and halve the largest decoder buffer.)"""
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def _spatial_down(x, p):
    """ZeroPad2d((0,1,0,1)) + conv stride 2 (`wan_vae.py:91-98`)."""
    return conv2d_frames(x, p, stride=(2, 2), padding=((0, 1), (0, 1)))


def _spatial_up(x, p):
    return conv2d_frames(_nearest_up2(x), p, stride=(1, 1),
                         padding=((1, 1), (1, 1)))


def encoder_downsample3d(x, p):
    """Full-sequence equivalent of the streaming temporal downsample (see
    module docstring): spatial first, then frame0-identity + valid stride-2
    time conv."""
    x = _spatial_down(x, p["conv"])
    head = x[:, :, :1]
    tail = conv3d(x, p["time_conv"], stride=(2, 1, 1),
                  padding=((0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([head, tail], axis=2)


def decoder_upsample3d(x, p):
    """Full-sequence equivalent of the streaming temporal upsample: frame 0
    identity; frames 1: through causal 2c time conv, channels interleave to
    2x frames; then spatial upsample on everything."""
    B, C, T, H, W = x.shape
    if T > 1:
        z = x[:, :, 1:]
        y = conv3d(z, p["time_conv"], stride=(1, 1, 1),
                   padding=((2, 0), (0, 0), (0, 0)))      # [B, 2C, T-1, H, W]
        y = y.reshape(B, 2, C, T - 1, H, W)
        y = y.transpose(0, 2, 3, 1, 4, 5).reshape(B, C, 2 * (T - 1), H, W)
        x = jnp.concatenate([x[:, :, :1], y], axis=2)
    return _spatial_up(x, p["conv"])


# ------------------------------------------------------------------- enc / dec

def encoder_apply(p: Params, cfg: WanVAEConfig, x: jax.Array) -> jax.Array:
    """[B, 3, T, H, W] -> [B, 2*z, T', H/8, W/8] (pre-quant features)."""
    h = causal_conv3d(x, p["conv1"])
    for stage in p["down"]:
        for rb in stage["res"]:
            h = res_block_apply(rb, h)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                h = encoder_downsample3d(h, stage["resample"])
            else:
                h = _spatial_down(h, stage["resample"]["conv"])
    h = res_block_apply(p["mid_rb1"], h)
    h = attn_block_apply(p["mid_attn"], h)
    h = res_block_apply(p["mid_rb2"], h)
    h = channel_rms_norm(h, p["head_norm"]["gamma"])
    h = causal_conv3d(_silu(h), p["head_conv"])
    return h


def decoder_apply(p: Params, cfg: WanVAEConfig, z: jax.Array) -> jax.Array:
    h = causal_conv3d(z, p["conv1"])
    h = res_block_apply(p["mid_rb1"], h)
    h = attn_block_apply(p["mid_attn"], h)
    h = res_block_apply(p["mid_rb2"], h)
    for stage in p["up"]:
        for rb in stage["res"]:
            h = res_block_apply(rb, h)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                h = decoder_upsample3d(h, stage["resample"])
            else:
                h = _spatial_up(h, stage["resample"]["conv"])
    h = channel_rms_norm(h, p["head_norm"]["gamma"])
    h = causal_conv3d(_silu(h), p["head_conv"])
    return h


# ------------------------------------------------------------------ public API

def _scale_arrays(cfg: WanVAEConfig, dtype):
    mean = jnp.asarray(cfg.latent_mean, dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(dtype)[
        None, :, None, None, None]
    return mean, inv_std


def encode(params: Params, cfg: WanVAEConfig, video: jax.Array
           ) -> Tuple[jax.Array, jax.Array]:
    """video [B, 3, T, H, W] in [-1, 1] -> (mu, log_var), mu already
    normalized per channel (reference `wan_vae.py:520-548`). The pipeline's
    `.mode()` is just `mu`."""
    feats = encoder_apply(params["encoder"], cfg, video)
    feats = causal_conv3d(feats, params["quant_conv"])
    mu, log_var = jnp.split(feats, 2, axis=1)
    mean, inv_std = _scale_arrays(cfg, mu.dtype)
    mu = (mu - mean) * inv_std
    return mu, log_var


def decode(params: Params, cfg: WanVAEConfig, z: jax.Array) -> jax.Array:
    """latents [B, z, T', H', W'] -> video [B, 3, T, H, W] clamped to [-1, 1]
    (reference `wan_vae.py:550-575,667-674`)."""
    mean, inv_std = _scale_arrays(cfg, z.dtype)
    z = z / inv_std + mean
    x = causal_conv3d(z, params["post_quant_conv"])
    out = decoder_apply(params["decoder"], cfg, x)
    return jnp.clip(out, -1.0, 1.0)


# Roadmap: a cache-carrying `lax.scan` streaming encode/decode (the exact
# equivalent of the reference feat_cache stream, for memory-bounded 4x length
# extrapolation) lives in `wan_vae_streaming.py` once implemented.
