"""Streaming (cache-carrying) causal VAE encode/decode.

The whole-sequence VAE (`wan_vae.py`) is the fastest path when activations
fit; at 480p x 33 frames the decoder's full-resolution stages alone need >16GB,
which is why the reference streams chunks through per-conv feature caches
(`wan_vae.py:520-575`). This module is the functional equivalent: the conv
caches are an explicit pytree threaded through jitted init/step functions —
``init`` handles the first chunk (where the temporal resamples have their
special frame-0 behaviour, see `wan_vae.py` module docstring), ``step``
handles every later chunk with identical shapes, so exactly TWO executables
cover any video length. Memory per step is one chunk's activations
(~300 MB at 480p) instead of the whole clip's.

Cache rule (simpler than the reference's per-case logic, same math): for a
causal time-k conv, keep the last (k-1) frames of the *concatenated input
stream*; chunk input = concat(cache, chunk); valid conv; new cache = last
(k-1) frames of that concatenation. Zero-initialised caches reproduce the
left zero-padding of the first chunk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import WanVAEConfig
from . import wan_vae as W

Params = Dict[str, Any]


class _Tape:
    """Walks the static conv order, pulling previous caches and collecting
    new ones (the functional analogue of the reference's feat_cache/feat_idx)."""

    def __init__(self, caches: Optional[List[jax.Array]] = None):
        self.caches = caches
        self.idx = 0
        self.out: List[jax.Array] = []

    def pull(self) -> Optional[jax.Array]:
        if self.caches is None:
            return None
        c = self.caches[self.idx]
        self.idx += 1
        return c

    def push(self, c: jax.Array) -> None:
        self.out.append(c)


def _causal_conv_stream(x, p, tape: _Tape, stride_t: int = 1):
    """Causal conv over a chunk with cache threading. kernel time size k:
    cache (k-1) frames; first chunk uses zeros (== left zero pad)."""
    kt, kh, kw = p["kernel"].shape[2:]
    hist = kt - 1
    if hist == 0 and stride_t == 1:
        return W.causal_conv3d(x, p)
    cache = tape.pull()
    if cache is None:
        B, C = x.shape[:2]
        cache = jnp.zeros((B, C, hist) + x.shape[3:], x.dtype)
    inp = jnp.concatenate([cache, x], axis=2)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    out = W.conv3d(inp, p, stride=(stride_t, 1, 1),
                   padding=((0, 0), (ph, ph), (pw, pw)))
    tape.push(inp[:, :, -hist:])
    return out


def _res_block_stream(p, x, tape: _Tape):
    h = W.causal_conv3d(x, p["shortcut"]) if "shortcut" in p else x
    y = W.channel_rms_norm(x, p["norm1"]["gamma"])
    y = _causal_conv_stream(jax.nn.silu(y), p["conv1"], tape)
    y = W.channel_rms_norm(y, p["norm2"]["gamma"])
    y = _causal_conv_stream(jax.nn.silu(y), p["conv2"], tape)
    return y + h


# ---------------------------------------------------------------- decoder

def _decoder_stream(p: Params, cfg: WanVAEConfig, x, tape: _Tape,
                    first: bool):
    h = _causal_conv_stream(x, p["conv1"], tape)
    h = _res_block_stream(p["mid_rb1"], h, tape)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = _res_block_stream(p["mid_rb2"], h, tape)
    for stage in p["up"]:
        for rb in stage["res"]:
            h = _res_block_stream(rb, h, tape)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                h = _upsample3d_stream(h, stage["resample"], tape, first)
            else:
                h = W._spatial_up(h, stage["resample"]["conv"])
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = _causal_conv_stream(jax.nn.silu(h), p["head_conv"], tape)
    return h


def _upsample3d_stream(x, p, tape: _Tape, first: bool):
    """Temporal upsample stream. Frame 0 (first chunk) bypasses the time conv
    entirely and primes a ZERO cache (the reference's 'Rep' sentinel —
    `wan_vae.py:107-141`); later chunks run the causal 2c conv and interleave
    channels into doubled frames."""
    B, C, T, H, W_ = x.shape
    if first:
        tape.pull()
        tape.push(jnp.zeros((B, C, 2, H, W_), x.dtype))
        return W._spatial_up(x, p["conv"])
    y = _causal_conv_stream(x, p["time_conv"], tape)   # [B, 2C, T, H, W]
    y = y.reshape(B, 2, C, T, H, W_)
    y = y.transpose(0, 2, 3, 1, 4, 5).reshape(B, C, 2 * T, H, W_)
    return W._spatial_up(y, p["conv"])


def decode_streaming_chunks(params: Params, cfg: WanVAEConfig, z: jax.Array,
                            jit_cache: Optional[dict] = None,
                            chunk_latent: int = 4):
    """Yield decoded pixel chunks (UNCLIPPED, in decode order) for latent
    [B, z, T', H', W'], ``chunk_latent`` latent frames per step.

    Generator form of :func:`decode_streaming` so the consumer can overlap
    per-chunk post-processing / device->host readback with the next chunk's
    decode (the device queue keeps computing while a finished chunk streams
    back over the transport)."""
    mean, inv_std = W._scale_arrays(cfg, z.dtype)
    z = z / inv_std + mean

    dec, pq = params["decoder"], params["post_quant_conv"]

    def init_fn(z0):
        x = W.causal_conv3d(z0, pq)
        tape = _Tape(None)
        out = _decoder_stream(dec, cfg, x, tape, first=True)
        return out, tape.out

    def step_fn(zi, caches):
        x = W.causal_conv3d(zi, pq)
        tape = _Tape(caches)
        out = _decoder_stream(dec, cfg, x, tape, first=False)
        return out, tape.out

    if jit_cache is not None:
        if "dec_init" not in jit_cache:
            jit_cache["dec_init"] = jax.jit(init_fn)
            jit_cache["dec_step"] = jax.jit(step_fn, donate_argnums=(1,))
        init_fn = jit_cache["dec_init"]
        step_fn = jit_cache["dec_step"]

    T = z.shape[2]
    out0, caches = init_fn(z[:, :, :1])
    yield out0
    t = 1
    while t < T:
        k = min(chunk_latent, T - t)
        o, caches = step_fn(z[:, :, t:t + k], caches)
        yield o
        t += k


def decode_streaming_u8(params: Params, cfg: WanVAEConfig, z: jax.Array,
                        jit_cache: dict, chunk_latent: int = 4,
                        compute_dtype=None) -> jax.Array:
    """Device-resident uint8 streaming decode with NOTHING eager per chunk.

    The generator path (`decode_streaming_chunks` + a separate uint8 post
    program per chunk) pays ~4 tunnel dispatches per chunk: an eager latent
    scale, an eager chunk slice, the decode step, and the uint8 convert —
    each with a 50-400 ms floor on the remote transport. Here every chunk is
    ONE dispatch: the executable takes the FULL latent plus a traced start
    index, slices/scales inside, decodes, and emits the clipped uint8 chunk
    (4x smaller than the bf16 chunk it replaces on device). Program sizes
    stay chunk-sized — this does NOT re-open the fused-scan-decode
    interleaving regression (see BASELINE.md negative results).

    Keeps the streaming==whole-sequence exactness contract: same math as
    `decode_streaming` followed by clip/round/uint8 (tests pin equality)."""
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else z.dtype
    T = z.shape[2]
    n_full = (T - 1) // chunk_latent
    rem = (T - 1) - n_full * chunk_latent

    def scale(x):
        mean, inv_std = W._scale_arrays(cfg, cd)
        return x.astype(cd) / inv_std + mean

    def post(y):
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

    ki = ("dec_u8_init", z.shape, str(cd))
    ks = ("dec_u8_step", z.shape, chunk_latent, str(cd))
    kr = ("dec_u8_rem", z.shape, chunk_latent, str(cd))
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


def make_fused_decode_fn(cfg: WanVAEConfig, T: int, chunk_latent: int = 2,
                         to_uint8: bool = True):
    """Build a pure jittable ``fn(params, z)`` that decodes ``T`` latent
    frames in ONE XLA program: the init chunk, a ``lax.scan`` over the full
    ``chunk_latent``-sized chunks, a static remainder chunk, and the
    clip(+uint8) post-processing fused per chunk.

    Same math as :func:`decode_streaming_chunks` followed by the pipeline's
    clip/uint8 conversion (tests assert exact equality) — but where the
    generator pays one tunnel dispatch per chunk plus a separate
    whole-video post program, this is a single dispatch whose output is
    already the final uint8 video (4x smaller fetch than fp32, and on the
    axon tunnel every dispatch/fetch has a ~0.05-0.5 s floor). Memory per
    scan step is one chunk's activations, exactly like the generator; the
    accumulated output is uint8, smaller than the generator's retained
    bf16 chunk list.
    """
    n_full = (T - 1) // chunk_latent
    rem = (T - 1) - n_full * chunk_latent

    def post(y):
        y = jnp.clip(y, -1.0, 1.0)
        if to_uint8:
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * 127.5 + 127.5),
                         0, 255).astype(jnp.uint8)
        return y

    def fn(params: Params, z: jax.Array) -> jax.Array:
        assert z.shape[2] == T, (z.shape, T)
        mean, inv_std = W._scale_arrays(cfg, z.dtype)
        z = z / inv_std + mean
        dec, pq = params["decoder"], params["post_quant_conv"]

        def init_fn(z0):
            x = W.causal_conv3d(z0, pq)
            tape = _Tape(None)
            out = _decoder_stream(dec, cfg, x, tape, first=True)
            return out, tape.out

        def step_fn(zi, caches):
            x = W.causal_conv3d(zi, pq)
            tape = _Tape(caches)
            out = _decoder_stream(dec, cfg, x, tape, first=False)
            return out, tape.out

        out0, caches = init_fn(z[:, :, :1])
        parts = [post(out0)]
        if n_full:
            zc = z[:, :, 1:1 + n_full * chunk_latent]
            B, C, _, Hl, Wl = zc.shape
            zc = zc.reshape(B, C, n_full, chunk_latent, Hl, Wl
                            ).transpose(2, 0, 1, 3, 4, 5)

            def body(caches, zi):
                out, caches = step_fn(zi, caches)
                return caches, post(out)

            caches, ys = jax.lax.scan(body, caches, zc)
            n, B2, C2, F, H, W_ = ys.shape
            ys = ys.transpose(1, 2, 0, 3, 4, 5).reshape(B2, C2, n * F, H, W_)
            parts.append(ys)
        if rem:
            out_r, _ = step_fn(z[:, :, 1 + n_full * chunk_latent:], caches)
            parts.append(post(out_r))
        return jnp.concatenate(parts, axis=2)

    return fn


def decode_streaming(params: Params, cfg: WanVAEConfig, z: jax.Array,
                     jit_cache: Optional[dict] = None,
                     chunk_latent: int = 4) -> jax.Array:
    """Latent [B, z, T', H', W'] -> video, ``chunk_latent`` latent frames per
    step (bigger chunks amortize dispatch and keep the MXU fed; memory per
    step grows linearly). Remainder frames run through a smaller final chunk.

    Pass a dict as ``jit_cache`` to reuse the compiled step functions across
    calls of the same geometry."""
    outs = list(decode_streaming_chunks(params, cfg, z, jit_cache=jit_cache,
                                        chunk_latent=chunk_latent))
    return jnp.clip(jnp.concatenate(outs, axis=2), -1.0, 1.0)


# ---------------------------------------------------------------- encoder

def _downsample3d_stream(x, p, tape: _Tape, first: bool):
    """Temporal downsample stream: first chunk passes through (priming a
    1-frame cache); later chunks conv over [cache, chunk] stride 2
    (`wan_vae.py:147-163`)."""
    x = W._spatial_down(x, p["conv"])
    if first:
        tape.pull()
        tape.push(x[:, :, -1:])
        return x
    cache = tape.pull()
    inp = jnp.concatenate([cache, x], axis=2)
    out = W.conv3d(inp, p["time_conv"], stride=(2, 1, 1),
                   padding=((0, 0), (0, 0), (0, 0)))
    tape.push(inp[:, :, -1:])
    return out


def _encoder_stream(p: Params, cfg: WanVAEConfig, x, tape: _Tape,
                    first: bool):
    h = _causal_conv_stream(x, p["conv1"], tape)
    for stage in p["down"]:
        for rb in stage["res"]:
            h = _res_block_stream(rb, h, tape)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                h = _downsample3d_stream(h, stage["resample"], tape, first)
            else:
                h = W._spatial_down(h, stage["resample"]["conv"])
    h = _res_block_stream(p["mid_rb1"], h, tape)
    h = W.attn_block_apply(p["mid_attn"], h)
    h = _res_block_stream(p["mid_rb2"], h, tape)
    h = W.channel_rms_norm(h, p["head_norm"]["gamma"])
    h = _causal_conv_stream(jax.nn.silu(h), p["head_conv"], tape)
    return h


def encode_streaming(params: Params, cfg: WanVAEConfig, video: jax.Array,
                     jit_cache: Optional[dict] = None,
                     chunk_latent: int = 4) -> Tuple[jax.Array, jax.Array]:
    """video [B, 3, T, H, W] (T = 1 + tc*k) -> (mu, log_var), processing
    ``chunk_latent`` latent frames' worth of pixels per step (the reference
    streams 1+tc+tc+... — `wan_vae.py:524-539`; larger chunks amortize)."""
    tc = cfg.temporal_compression_ratio
    T = video.shape[2]
    assert (T - 1) % tc == 0, f"T={T} must be 1 mod {tc}"

    enc, qc = params["encoder"], params["quant_conv"]

    def finish(feats):
        feats = W.causal_conv3d(feats, qc)
        return jnp.split(feats, 2, axis=1)

    def init_fn(x0):
        tape = _Tape(None)
        return _encoder_stream(enc, cfg, x0, tape, first=True), tape.out

    def step_fn(xi, caches):
        tape = _Tape(caches)
        return _encoder_stream(enc, cfg, xi, tape, first=False), tape.out

    if jit_cache is not None:
        if "enc_init" not in jit_cache:
            jit_cache["enc_init"] = jax.jit(init_fn)
            jit_cache["enc_step"] = jax.jit(step_fn, donate_argnums=(1,))
        init_fn = jit_cache["enc_init"]
        step_fn = jit_cache["enc_step"]

    out0, caches = init_fn(video[:, :, :1])
    outs = [out0]
    s = 1
    step_px = tc * chunk_latent
    while s < T:
        k = min(step_px, T - s)
        k -= k % tc  # stay latent-frame aligned
        o, caches = step_fn(video[:, :, s:s + k], caches)
        outs.append(o)
        s += k
    feats = jnp.concatenate(outs, axis=2)
    mu, log_var = finish(feats)
    mean, inv_std = W._scale_arrays(cfg, mu.dtype)
    return (mu - mean) * inv_std, log_var


def encode_streaming_fused(params: Params, cfg: WanVAEConfig,
                           video: jax.Array,
                           jit_cache: dict,
                           chunk_latent: int = 4) -> Tuple[jax.Array,
                                                           jax.Array]:
    """`encode_streaming` as ONE compiled program per input geometry.

    The chunked path above costs one tunnel dispatch per chunk plus eager
    concat/quant/normalize tails (~6-8 dispatches for 33 frames at 50-100 ms
    each on the remote transport). Here the same chunk loop is traced INLINE
    — identical math, one executable, one dispatch. Memory behaviour is
    unchanged: XLA sees the same chunk-sized activation live ranges, so the
    whole-sequence blowup this module exists to avoid stays avoided.
    Executables are cached per (T, H, W, dtype)."""
    key = ("enc_fused", video.shape, str(video.dtype), chunk_latent)
    if key not in jit_cache:
        def whole(p, vid):
            return encode_streaming(p, cfg, vid, jit_cache=None,
                                    chunk_latent=chunk_latent)
        jit_cache[key] = jax.jit(whole)
    return jit_cache[key](params, video)
