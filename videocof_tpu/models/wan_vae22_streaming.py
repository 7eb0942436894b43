"""Streaming (cache-carrying) Wan2.2 (3.8-style) VAE encode/decode.

Extends the Wan2.1 streaming machinery (`wan_vae_streaming.py`: explicit
conv-cache pytree, init/step compiled once each) to the 3.8 architecture
(`videox_fun/models/wan_vae3_8.py:788-845`):

  * pixel-space 2x2 patchify / unpatchify — frame-local, stateless;
  * AvgDown3D / DupUp3D shortcut paths (`:321-418`) — parameter-free and
    PER-CHUNK stateless: the reference applies them to each chunk
    independently (`Down_ResidualBlock.forward` sees only the chunk,
    `:452-456`). The front zero-pad pairing matches the whole-sequence
    result exactly because the first chunk is 1 frame (pairs with the pad
    zero) and later chunks stay even-sized through every temporal stage;
  * DupUp3D trims factor_t-1 leading duplicates on the first chunk only
    (`:415-416`), mirrored by ``first``;
  * channel-preserving spatial upsample (`:91-101`).

Equality with the whole-sequence `wan_vae22.encode/decode` is enforced by
tests (same contract as the 2.1 streaming twin).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import wan_vae as W
from . import wan_vae22 as V22
from .wan_vae22 import Wan22VAEConfig, avg_down3d, dup_up3d, patchify2, \
    unpatchify2
from .wan_vae_streaming import (_Tape, _causal_conv_stream,
                                _downsample3d_stream, _res_block_stream,
                                _upsample3d_stream)

Params = Dict[str, Any]


# ----------------------------------------------------------------- encoder

def _down_stage_stream(stage, x, tape: _Tape, first: bool, tdown: bool,
                       down_flag: bool, cout: int):
    shortcut_in = x
    h = x
    for rb in stage["res"]:
        h = _res_block_stream(rb, h, tape)
    if down_flag:
        if tdown:
            h = _downsample3d_stream(h, stage["resample"], tape, first)
        else:
            h = W._spatial_down(h, stage["resample"]["conv"])
    sc = avg_down3d(shortcut_in, cout,
                    factor_t=2 if (tdown and down_flag) else 1,
                    factor_s=2 if down_flag else 1)
    return h + sc


def _encoder_stream(p: Params, cfg: Wan22VAEConfig, x, tape: _Tape,
                    first: bool):
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    n = len(cfg.dim_mult)
    h = _causal_conv_stream(x, p["conv1"], tape)
    for i, stage in enumerate(p["down"]):
        tdown = (cfg.temporal_downsample[i]
                 if i < len(cfg.temporal_downsample) else False)
        h = _down_stage_stream(stage, h, tape, first, tdown, i != n - 1,
                               dims[i + 1])
    h = _res_block_stream(p["mid_rb1"], h, tape)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = _res_block_stream(p["mid_rb2"], h, tape)
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = _causal_conv_stream(jax.nn.silu(h), p["head_conv"], tape)
    return h


def encode_streaming(params: Params, cfg: Wan22VAEConfig, video: jax.Array,
                     jit_cache: Optional[dict] = None,
                     chunk_latent: int = 4) -> Tuple[jax.Array, jax.Array]:
    """video [B, 3, T, H, W] (T = 1 + tc*k) -> (mu, log_var) — streaming
    twin of `wan_vae22.encode` (reference chunked 1+4+4 encode,
    `wan_vae3_8.py:788-818`)."""
    tc = cfg.temporal_compression_ratio
    T = video.shape[2]
    assert (T - 1) % tc == 0, f"T={T} must be 1 mod {tc}"

    x_all = patchify2(video, cfg.patch_size)
    enc, qc = params["encoder"], params["quant_conv"]

    def init_fn(x0):
        tape = _Tape(None)
        return _encoder_stream(enc, cfg, x0, tape, first=True), tape.out

    def step_fn(xi, caches):
        tape = _Tape(caches)
        return _encoder_stream(enc, cfg, xi, tape, first=False), tape.out

    if jit_cache is not None:
        if "v22_enc_init" not in jit_cache:
            jit_cache["v22_enc_init"] = jax.jit(init_fn)
            jit_cache["v22_enc_step"] = jax.jit(step_fn, donate_argnums=(1,))
        init_fn = jit_cache["v22_enc_init"]
        step_fn = jit_cache["v22_enc_step"]

    out0, caches = init_fn(x_all[:, :, :1])
    outs = [out0]
    s = 1
    step_px = tc * chunk_latent
    while s < T:
        k = min(step_px, T - s)
        k -= k % tc
        o, caches = step_fn(x_all[:, :, s:s + k], caches)
        outs.append(o)
        s += k
    feats = W.causal_conv3d(jnp.concatenate(outs, axis=2), qc)
    mu, log_var = jnp.split(feats, 2, axis=1)
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(
        mu.dtype)[None, :, None, None, None]
    return (mu - mean) * inv_std, log_var


# ----------------------------------------------------------------- decoder

def _up_stage_stream(stage, x, tape: _Tape, first: bool, tup: bool,
                     up_flag: bool, cout: int):
    h = x
    for rb in stage["res"]:
        h = _res_block_stream(rb, h, tape)
    if up_flag:
        if tup:
            h = _upsample3d_stream(h, stage["resample"], tape, first)
        else:
            h = V22._spatial_up_keep(h, stage["resample"]["conv"])
        sc = dup_up3d(x, cout, factor_t=2 if tup else 1, factor_s=2,
                      trim_first=first and tup)
        return h + sc
    return h


def _decoder_stream(p: Params, cfg: Wan22VAEConfig, x, tape: _Tape,
                    first: bool):
    ddims = [cfg.dec_dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    t_up = tuple(reversed(cfg.temporal_downsample))
    n = len(cfg.dim_mult)
    h = _causal_conv_stream(x, p["conv1"], tape)
    h = _res_block_stream(p["mid_rb1"], h, tape)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = _res_block_stream(p["mid_rb2"], h, tape)
    for i, stage in enumerate(p["up"]):
        tup = t_up[i] if i < len(t_up) else False
        h = _up_stage_stream(stage, h, tape, first, tup, i != n - 1,
                             ddims[i + 1])
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = _causal_conv_stream(jax.nn.silu(h), p["head_conv"], tape)
    return h


def _dec_scale_arrays(cfg: Wan22VAEConfig, dtype):
    mean = jnp.asarray(cfg.latent_mean, dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(
        dtype)[None, :, None, None, None]
    return mean, inv_std


def decode_streaming_chunks(params: Params, cfg: Wan22VAEConfig,
                            z: jax.Array, jit_cache: Optional[dict] = None,
                            chunk_latent: int = 2):
    """Yield decoded pixel chunks (UNCLIPPED, unpatchified, in decode order)
    — the Wan2.2 twin of `wan_vae_streaming.decode_streaming_chunks`, used
    by the pipeline's segment-decode fallback path. `unpatchify2` is
    frame-local, so applying it per chunk equals applying it to the whole
    concatenated sequence."""
    mean, inv_std = _dec_scale_arrays(cfg, z.dtype)
    z = z / inv_std + mean

    dec, pq = params["decoder"], params["post_quant_conv"]

    def init_fn(z0):
        x = W.causal_conv3d(z0, pq)
        tape = _Tape(None)
        out = _decoder_stream(dec, cfg, x, tape, first=True)
        return unpatchify2(out, cfg.patch_size), tape.out

    def step_fn(zi, caches):
        x = W.causal_conv3d(zi, pq)
        tape = _Tape(caches)
        out = _decoder_stream(dec, cfg, x, tape, first=False)
        return unpatchify2(out, cfg.patch_size), tape.out

    if jit_cache is not None:
        if "v22_dec_chunk_init" not in jit_cache:
            jit_cache["v22_dec_chunk_init"] = jax.jit(init_fn)
            jit_cache["v22_dec_chunk_step"] = jax.jit(
                step_fn, donate_argnums=(1,))
        init_fn = jit_cache["v22_dec_chunk_init"]
        step_fn = jit_cache["v22_dec_chunk_step"]

    T = z.shape[2]
    out0, caches = init_fn(z[:, :, :1])
    yield out0
    t = 1
    while t < T:
        k = min(chunk_latent, T - t)
        o, caches = step_fn(z[:, :, t:t + k], caches)
        yield o
        t += k


def decode_streaming_u8(params: Params, cfg: Wan22VAEConfig, z: jax.Array,
                        jit_cache: dict, chunk_latent: int = 2,
                        compute_dtype=None) -> jax.Array:
    """Device-resident uint8 streaming decode, ONE dispatch per chunk —
    the Wan2.2 twin of `wan_vae_streaming.decode_streaming_u8` (see there
    for the dispatch-cost rationale). Each program takes the FULL latent
    plus a traced start index and emits the clipped uint8 unpatchified
    chunk. Same math as `decode_streaming` + clip/round/uint8 (tests pin
    equality)."""
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else z.dtype
    T = z.shape[2]
    n_full = (T - 1) // chunk_latent
    rem = (T - 1) - n_full * chunk_latent

    def scale(x):
        mean, inv_std = _dec_scale_arrays(cfg, cd)
        return x.astype(cd) / inv_std + mean

    def post(y):
        y = unpatchify2(y, cfg.patch_size)
        return jnp.clip(jnp.round(
            jnp.clip(y, -1.0, 1.0).astype(jnp.float32) * 127.5 + 127.5),
            0, 255).astype(jnp.uint8)

    def init_fn(p, zf):
        x = W.causal_conv3d(scale(zf[:, :, :1]), p["post_quant_conv"])
        tape = _Tape(None)
        out = _decoder_stream(p["decoder"], cfg, x, tape, first=True)
        return post(out), tape.out

    def step_body(p, zi, caches):
        x = W.causal_conv3d(scale(zi), p["post_quant_conv"])
        tape = _Tape(caches)
        out = _decoder_stream(p["decoder"], cfg, x, tape, first=False)
        return post(out), tape.out

    def step_fn(p, zf, start, caches):
        zi = jax.lax.dynamic_slice_in_dim(zf, start, chunk_latent, axis=2)
        return step_body(p, zi, caches)

    def rem_fn(p, zf, caches):  # static tail chunk (rem < chunk_latent)
        return step_body(p, zf[:, :, 1 + n_full * chunk_latent:], caches)

    ki = ("v22_dec_u8_init", z.shape, str(cd))
    ks = ("v22_dec_u8_step", z.shape, chunk_latent, str(cd))
    kr = ("v22_dec_u8_rem", z.shape, chunk_latent, str(cd))
    # guard on the chunk-bearing key: init is chunk-independent and may
    # already be cached from a call with a different chunk_latent
    if ks not in jit_cache:
        jit_cache.setdefault(ki, jax.jit(init_fn))
        jit_cache[ks] = jax.jit(step_fn, donate_argnums=(3,))
        jit_cache[kr] = jax.jit(rem_fn, donate_argnums=(2,))

    out0, caches = jit_cache[ki](params, z)
    parts = [out0]
    for i in range(n_full):
        o, caches = jit_cache[ks](params, z, 1 + i * chunk_latent, caches)
        parts.append(o)
    if rem:
        o, _ = jit_cache[kr](params, z, caches)
        parts.append(o)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


def decode_streaming(params: Params, cfg: Wan22VAEConfig, z: jax.Array,
                     jit_cache: Optional[dict] = None,
                     chunk_latent: int = 2) -> jax.Array:
    """Latent [B, z, T', H', W'] -> video — streaming twin of
    `wan_vae22.decode` (reference frame-by-frame decode,
    `wan_vae3_8.py:820-845`)."""
    mean = jnp.asarray(cfg.latent_mean, z.dtype)[None, :, None, None, None]
    inv_std = (1.0 / jnp.asarray(cfg.latent_std, jnp.float32)).astype(
        z.dtype)[None, :, None, None, None]
    z = z / inv_std + mean

    dec, pq = params["decoder"], params["post_quant_conv"]

    def init_fn(z0):
        x = W.causal_conv3d(z0, pq)
        tape = _Tape(None)
        return _decoder_stream(dec, cfg, x, tape, first=True), tape.out

    def step_fn(zi, caches):
        x = W.causal_conv3d(zi, pq)
        tape = _Tape(caches)
        return _decoder_stream(dec, cfg, x, tape, first=False), tape.out

    if jit_cache is not None:
        if "v22_dec_init" not in jit_cache:
            jit_cache["v22_dec_init"] = jax.jit(init_fn)
            jit_cache["v22_dec_step"] = jax.jit(step_fn, donate_argnums=(1,))
        init_fn = jit_cache["v22_dec_init"]
        step_fn = jit_cache["v22_dec_step"]

    T = z.shape[2]
    out0, caches = init_fn(z[:, :, :1])
    outs = [out0]
    t = 1
    while t < T:
        k = min(chunk_latent, T - t)
        o, caches = step_fn(z[:, :, t:t + k], caches)
        outs.append(o)
        t += k
    out = unpatchify2(jnp.concatenate(outs, axis=2), cfg.patch_size)
    return jnp.clip(out, -1.0, 1.0)
