"""S2V (speech-to-video) Wan variant — segment-modulated blocks, per-sample
RoPE tables, and audio cross-attention injection.

Parity target: `videox_fun/models/wan_transformer3d_s2v.py`. NOTE: that file
is broken in the reference snapshot — it imports `wan_audio_injector`
(CausalAudioEncoder / AudioInjector_WAN / rope_precompute), which does not
exist in the tree. We rebuild what the snapshot defines:

  * segment-wise AdaLN (`WanS2VAttentionBlock.forward:131-178`): the sequence
    is [video tokens | ref/motion tokens] split at ``seg_idx`` and each
    segment gets its own 6-way modulation. Here the split arrives as a
    per-token segment-id array — data, not slicing — so it jits and shards.
  * per-sample precomputed RoPE (`s2v_rope_apply:56-76`): the rotation tables
    are [B, L, c] instead of [L, c]; `apply_rope_per_sample` handles that.
  * the audio path (encoder + per-layer injector), reconstructed to the
    interface the S2V model calls (dim/num_token/inject_layers), since the
    reference implementation is absent from the snapshot: audio features ->
    ``num_token`` tokens per latent frame; at each inject layer the video
    tokens of frame f cross-attend to that frame's audio tokens.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..configs import WanDiTConfig
from . import wan_dit as W
from ..ops import attention

Params = Dict[str, Any]


# ------------------------------------------------------------------ rope

def apply_rope_per_sample(x: jax.Array, cos: jax.Array, sin: jax.Array
                          ) -> jax.Array:
    """x [B, L, N, D]; cos/sin [B, L, D//2] per-sample tables
    (`s2v_rope_apply`)."""
    orig = x.dtype
    B, L, N, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, L, N, D // 2, 2)
    a, b = xf[..., 0], xf[..., 1]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return jnp.stack([a * c - b * s, a * s + b * c],
                     axis=-1).reshape(B, L, N, D).astype(orig)


# --------------------------------------------------------------- s2v block

def s2v_block_apply(p: Params, cfg: WanDiTConfig, x, e0, seg_ids, context,
                    rope_cs, attn_backend=None):
    """One S2V block. e0: [B, 6, 2, D] (per-segment AdaLN params);
    seg_ids: [L] int32 in {0, 1} selecting the segment of each token."""
    eps = cfg.eps
    # modulation param [6, D] broadcasts over both segments
    e = p["modulation"][None, :, None, :].astype(jnp.float32) + e0
    # per-token gather of each component: [B, 6, L, D]
    e_tok = jnp.take(e, seg_ids, axis=2)
    e_ = [e_tok[:, i] for i in range(6)]          # each [B, L, D]

    tx = W._layer_norm(x, eps) * (1.0 + e_[1]) + e_[0]
    cos, sin = rope_cs
    B, L, D = x.shape
    N, hd = cfg.num_heads, D // cfg.num_heads
    sa = p["self_attn"]
    q = W._rms_norm(W._linear(tx.astype(context.dtype), sa["q"]),
                    sa["norm_q"]["weight"], eps).reshape(B, L, N, hd)
    k = W._rms_norm(W._linear(tx.astype(context.dtype), sa["k"]),
                    sa["norm_k"]["weight"], eps).reshape(B, L, N, hd)
    v = W._linear(tx.astype(context.dtype), sa["v"]).reshape(B, L, N, hd)
    q = apply_rope_per_sample(q, cos, sin)
    k = apply_rope_per_sample(k, cos, sin)
    y = attention(q, k, v, backend=attn_backend).reshape(B, L, D)
    y = W._linear(y, sa["o"])
    x = x + y.astype(jnp.float32) * e_[2]

    nx = W._layer_norm(x, eps, p["norm3"]["scale"], p["norm3"]["bias"]) \
        if "norm3" in p else x
    y = W._attn_qkv(nx.astype(context.dtype), p["cross_attn"], cfg.num_heads,
                    eps, kv_in=context, backend=attn_backend)
    x = x + y.astype(jnp.float32)

    tx = W._layer_norm(x, eps) * (1.0 + e_[4]) + e_[3]
    h = W._linear(tx.astype(context.dtype), p["ffn"]["fc1"])
    h = W._gelu_tanh(h)
    h = W._linear(h, p["ffn"]["fc2"])
    return x + h.astype(jnp.float32) * e_[5]


# --------------------------------------------------------------- audio path

def init_audio_encoder(key, audio_dim: int, out_dim: int, num_token: int = 4,
                       dtype=jnp.float32) -> Params:
    k1, _ = jax.random.split(key)
    return {
        "proj": W._init_linear(k1, audio_dim, out_dim * num_token, dtype),
        "norm": {"weight": jnp.ones((audio_dim,), dtype)},
    }


def audio_encode(p: Params, feats: jax.Array, num_token: int = 4
                 ) -> jax.Array:
    """audio features [B, F, audio_dim] -> [B, F, num_token, dim]."""
    B, F, _ = feats.shape
    h = W._rms_norm(feats, p["norm"]["weight"], 1e-6)
    h = W._linear(h, p["proj"])
    return h.reshape(B, F, num_token, -1)


def init_audio_injector(key, cfg: WanDiTConfig,
                        inject_layers: Sequence[int],
                        dtype=jnp.float32) -> Params:
    d = cfg.dim
    ks = jax.random.split(key, len(inject_layers))

    def one(k):
        kk = jax.random.split(k, 4)
        return {
            "norm": {"scale": jnp.ones((d,), dtype),
                     "bias": jnp.zeros((d,), dtype)},
            "q": W._init_linear(kk[0], d, d, dtype),
            "k": W._init_linear(kk[1], d, d, dtype),
            "v": W._init_linear(kk[2], d, d, dtype),
            # zero-init output proj: injection is a no-op at init
            "o": {"kernel": jnp.zeros((d, d), dtype),
                  "bias": jnp.zeros((d,), dtype)},
        }

    return {"layers": {int(l): one(ks[i])
                       for i, l in enumerate(inject_layers)}}


def audio_inject(p: Params, cfg: WanDiTConfig, x: jax.Array,
                 audio_tokens: jax.Array, grid: Tuple[int, int, int]
                 ) -> jax.Array:
    """Per-frame cross attention: video tokens of latent frame f attend to
    audio_tokens[:, f]. x [B, L(video), D] with L = f*h*w."""
    B, L, D = x.shape
    f, hh, ww = grid
    N, hd = cfg.num_heads, D // cfg.num_heads
    tok = hh * ww
    nx = W._layer_norm(x, cfg.eps, p["norm"]["scale"], p["norm"]["bias"])
    nx = nx.astype(audio_tokens.dtype)
    q = W._linear(nx, p["q"]).reshape(B * f, tok, N, hd)
    ka = W._linear(audio_tokens, p["k"])
    va = W._linear(audio_tokens, p["v"])
    na = audio_tokens.shape[2]
    ka = ka.reshape(B * f, na, N, hd)
    va = va.reshape(B * f, na, N, hd)
    out = attention(q, ka, va, backend="naive" if hd % 128 else None)
    out = out.reshape(B, L, D)
    return x + W._linear(out.astype(nx.dtype), p["o"]).astype(jnp.float32)


# ------------------------------------------------------------------- model

def init_s2v_params(key, cfg: WanDiTConfig, audio_dim: int = 1024,
                    num_audio_token: int = 4,
                    inject_layers: Sequence[int] = (0,),
                    dtype=jnp.float32) -> Params:
    """Extra S2V parameters; the base DiT params come from
    `wan_dit.init_wan_dit` (with plain cross attention)."""
    k1, k2 = jax.random.split(key)
    return {
        "audio_encoder": init_audio_encoder(k1, audio_dim, cfg.dim,
                                            num_audio_token, dtype),
        "audio_injector": init_audio_injector(k2, cfg, inject_layers, dtype),
    }


def wan_s2v_forward(
    base_params: Params,
    s2v_params: Params,
    cfg: WanDiTConfig,
    x: jax.Array,                 # [B, C, F, H, W]
    t: jax.Array,                 # [B]
    context: jax.Array,           # [B, Lt, text_dim]
    rope_cos: jax.Array,          # [B, L, head_dim//2] per-sample tables
    rope_sin: jax.Array,
    seg_ids: jax.Array,           # [L] int32 segment of each token (0/1)
    audio_feats: Optional[jax.Array] = None,   # [B, F_latent, audio_dim]
    inject_layers: Sequence[int] = (0,),
    num_audio_token: int = 4,
    attn_backend=None,
) -> jax.Array:
    compute_dtype = base_params["patch_embed"]["kernel"].dtype
    tokens, grid = W.patchify(x.astype(compute_dtype), cfg.patch_size)
    stream = W._linear(tokens, base_params["patch_embed"]).astype(jnp.float32)

    e = W.sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    e = W._linear(e, base_params["time_mlp"]["fc1"], jnp.float32)
    e = jax.nn.silu(e)
    e = W._linear(e, base_params["time_mlp"]["fc2"], jnp.float32)
    e0 = W._linear(jax.nn.silu(e), base_params["time_proj"]["fc"],
                   jnp.float32).reshape(e.shape[0], 6, cfg.dim)
    # both segments share the timestep modulation unless a zero-timestep
    # variant supplies separate ones (reference zero_timestep flag)
    e0 = jnp.stack([e0, e0], axis=2)          # [B, 6, 2, D]

    ctx = W._linear(context.astype(compute_dtype),
                    base_params["text_mlp"]["fc1"])
    ctx = W._gelu_tanh(ctx)
    ctx = W._linear(ctx, base_params["text_mlp"]["fc2"])

    audio_tokens = None
    if audio_feats is not None:
        assert audio_feats.shape[1] == grid[0], \
            "audio features must be aligned to latent frames"
        audio_tokens = audio_encode(s2v_params["audio_encoder"],
                                    audio_feats.astype(compute_dtype),
                                    num_audio_token)

    inject = tuple(int(i) for i in inject_layers)
    injector = s2v_params["audio_injector"]["layers"]
    for i in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[i], base_params["blocks"])
        stream = s2v_block_apply(bp, cfg, stream, e0, seg_ids, ctx,
                                 (rope_cos, rope_sin),
                                 attn_backend=attn_backend)
        if audio_tokens is not None and i in inject:
            stream = audio_inject(injector[i], cfg, stream, audio_tokens,
                                  grid)

    hm = base_params["head"]["modulation"][None].astype(jnp.float32) \
        + e[:, None, :]
    out = W._layer_norm(stream, cfg.eps) * (1.0 + hm[:, 1][:, None]) \
        + hm[:, 0][:, None]
    out = W._linear(out.astype(compute_dtype), base_params["head"]["fc"])
    return W.unpatchify(out.astype(jnp.float32), grid, cfg.patch_size,
                        cfg.out_dim)
