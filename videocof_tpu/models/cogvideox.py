"""CogVideoX 3D transformer (VideoX-Fun sibling family).

Rebuild of `videox_fun/models/cogvideox_transformer3d.py`: joint text+video
sequence through every block, dual-stream AdaLN-zero ("LayerNormZero": one
silu+linear over the time embedding produces shift/scale/gate for the video
stream AND the text stream — `:176-293`), per-head LayerNorm on q/k, rotary
embeddings applied to the video tokens only (1.5 checkpoints) or 3D sincos
positional embeddings added at patch time (1.0), AdaLayerNorm output head.

Functional JAX with the block stack under `lax.scan` like the Wan DiT.
i2v/control variants channel-concat `inpaint_latents`/`control_latents`
before patching (`:640-643`), which the caller does.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import attention
from . import wan_dit as W

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    num_attention_heads: int = 30
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 30
    patch_size: int = 2
    patch_size_t: Optional[int] = None       # None = 1.0 family; 2 = 1.5
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = False
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


COGVIDEOX_2B = CogVideoXConfig()
COGVIDEOX_5B = CogVideoXConfig(num_attention_heads=48, num_layers=42,
                               use_rotary_positional_embeddings=True)
COGVIDEOX_TINY = CogVideoXConfig(num_attention_heads=4, attention_head_dim=16,
                                 in_channels=4, out_channels=4, num_layers=2,
                                 time_embed_dim=32, text_embed_dim=32,
                                 max_text_seq_length=8)


# ----------------------------------------------------------- position embeds

def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = 1.0 / 10000.0 ** (np.arange(dim // 2, dtype=np.float64)
                              / (dim // 2))
    out = np.einsum("p,d->pd", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, spatial_hw: Tuple[int, int],
                            temporal: int, sis: float, tis: float
                            ) -> np.ndarray:
    """[T, H*W, D]: 1/4 of the channels carry temporal sincos, 3/4 spatial.

    Spatial channel order matches diffusers' `get_3d_sincos_pos_embed`
    literally: the grid is built `np.meshgrid(grid_w, grid_h)` ("here w goes
    first"), so the FIRST spatial half embeds the *w* coordinate and the
    second half the *h* coordinate (the `emb_h` name in diffusers/MAE is a
    misnomer that checkpoints inherited)."""
    h, w = spatial_hw
    dim_t = embed_dim // 4
    dim_s = embed_dim - dim_t
    gh = np.arange(h, dtype=np.float64) / sis
    gw = np.arange(w, dtype=np.float64) / sis
    emb_h = _sincos_1d(dim_s // 2, gh)                 # [H, ds/2]
    emb_w = _sincos_1d(dim_s // 2, gw)                 # [W, ds/2]
    spatial = np.concatenate([
        np.repeat(emb_w[None, :, :], h, axis=0),
        np.repeat(emb_h[:, None, :], w, axis=1),
    ], axis=-1).reshape(h * w, dim_s)
    temporal_e = _sincos_1d(dim_t, np.arange(temporal, dtype=np.float64) / tis)
    out = np.concatenate([
        np.repeat(temporal_e[:, None, :], h * w, axis=1),
        np.repeat(spatial[None, :, :], temporal, axis=0),
    ], axis=-1)
    return out.astype(np.float32)                      # [T, H*W, D]


def get_3d_rope_cos_sin(cfg: CogVideoXConfig, grid: Tuple[int, int, int]
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Pairwise cos/sin tables [L, head_dim//2] for the 1.5 rope path:
    head_dim splits (t, h, w) = (d/4, 3d/8, 3d/8) complex slots."""
    f, h, w = grid
    d = cfg.attention_head_dim
    ct = d // 8 * 2 // 2 * 2   # keep even halves: t gets d/4 dims -> d/8 pairs
    ct = d // 4 // 2
    cs = (d // 2 - ct) // 2

    def inv(c):
        dim = 2 * c
        return 1.0 / cfg.rope_theta ** (np.arange(0, dim, 2) / dim)

    ang = np.zeros((f, h, w, ct + 2 * cs))
    ang[..., :ct] = np.arange(f)[:, None, None, None] * inv(ct)
    ang[..., ct:ct + cs] = np.arange(h)[None, :, None, None] * inv(cs)
    ang[..., ct + cs:] = np.arange(w)[None, None, :, None] * inv(cs)
    ang = ang.reshape(f * h * w, -1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


# -------------------------------------------------------------------- init

def init_cogvideox(key, cfg: CogVideoXConfig, dtype=jnp.float32) -> Params:
    d = cfg.inner_dim
    te = cfg.time_embed_dim
    p = cfg.patch_size
    pt = cfg.patch_size_t or 1
    it = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))

    def ln(dim=d):
        # the reference's CogVideoXLayerNormZero / AdaLayerNorm wrap an
        # elementwise-affine LayerNorm (diffusers normalization.py,
        # `norm_elementwise_affine=True` default) — real checkpoints carry
        # `norm1.norm.weight/bias` etc., so the params must exist here.
        return {"scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32)}

    def block(bk):
        ks = jax.random.split(bk, 8)
        return {
            "norm1": {"lin": W._init_linear(ks[0], te, 6 * d, jnp.float32),
                      "norm": ln()},
            "attn": {
                "q": W._init_linear(ks[1], d, d, dtype),
                "k": W._init_linear(ks[2], d, d, dtype),
                "v": W._init_linear(ks[3], d, d, dtype),
                "o": W._init_linear(ks[4], d, d, dtype),
                "norm_q": {"scale": jnp.ones((cfg.attention_head_dim,), dtype),
                           "bias": jnp.zeros((cfg.attention_head_dim,), dtype)},
                "norm_k": {"scale": jnp.ones((cfg.attention_head_dim,), dtype),
                           "bias": jnp.zeros((cfg.attention_head_dim,), dtype)},
            },
            "norm2": {"lin": W._init_linear(ks[5], te, 6 * d, jnp.float32),
                      "norm": ln()},
            "ff": {"fc1": W._init_linear(ks[6], d, 4 * d, dtype),
                   "fc2": W._init_linear(ks[7], 4 * d, d, dtype)},
        }

    blocks = [block(next(it)) for _ in range(cfg.num_layers)]
    params: Params = {
        "patch_proj": W._init_linear(next(it), cfg.in_channels * p * p * pt,
                                     d, dtype),
        "text_proj": W._init_linear(next(it), cfg.text_embed_dim, d, dtype),
        "time_mlp": {"fc1": W._init_linear(next(it), d, te, jnp.float32),
                     "fc2": W._init_linear(next(it), te, te, jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_final": {"scale": jnp.ones((d,), dtype),
                       "bias": jnp.zeros((d,), dtype)},
        "norm_out": {"lin": W._init_linear(next(it), te, 2 * d, jnp.float32),
                     "norm": ln()},
        "proj_out": W._init_linear(
            next(it), d, cfg.out_channels * p * p * pt, dtype),
    }
    return params


# -------------------------------------------------------- checkpoint loading

def convert_cogvideox_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: CogVideoXConfig,
                                 dtype=jnp.float32, device=True) -> Params:
    """diffusers-layout `CogVideoXTransformer3DModel` state dict (numpy
    values) -> our pytree. Key layout per the reference
    `cogvideox_transformer3d.py:394-443` (diffusers module names:
    `ff.net.0.proj` / `ff.net.2`, `to_out.0`, `norm1.norm`, ...)."""
    conv = jnp.asarray if device else (lambda a, d: np.asarray(a, d))
    stack = jnp.stack if device else np.stack

    def lin(prefix):
        p = {"kernel": conv(
            np.ascontiguousarray(sd[prefix + ".weight"].T), dtype)}
        if prefix + ".bias" in sd:
            p["bias"] = conv(sd[prefix + ".bias"], dtype)
        return p

    def ln(prefix):
        return {"scale": conv(sd[prefix + ".weight"], jnp.float32),
                "bias": conv(sd[prefix + ".bias"], jnp.float32)}

    def f32(p):
        return {k: v.astype(jnp.float32) for k, v in p.items()}

    # 1.0 checkpoints patch-embed with a per-frame Conv2d [D, C, p, p]; its
    # flattened input-feature order (C, p, p) equals our pt=1 linear
    pw = sd["patch_embed.proj.weight"]
    if pw.ndim == 4:
        pw = pw.reshape(pw.shape[0], -1)
    patch = {"kernel": conv(np.ascontiguousarray(pw.T), dtype),
             "bias": conv(sd["patch_embed.proj.bias"], dtype)}

    def block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "norm1": {"lin": f32(lin(f"{pre}.norm1.linear")),
                      "norm": ln(f"{pre}.norm1.norm")},
            "attn": {
                "q": lin(f"{pre}.attn1.to_q"),
                "k": lin(f"{pre}.attn1.to_k"),
                "v": lin(f"{pre}.attn1.to_v"),
                "o": lin(f"{pre}.attn1.to_out.0"),
                "norm_q": {
                    "scale": conv(sd[f"{pre}.attn1.norm_q.weight"], dtype),
                    "bias": conv(sd[f"{pre}.attn1.norm_q.bias"], dtype)},
                "norm_k": {
                    "scale": conv(sd[f"{pre}.attn1.norm_k.weight"], dtype),
                    "bias": conv(sd[f"{pre}.attn1.norm_k.bias"], dtype)},
            },
            "norm2": {"lin": f32(lin(f"{pre}.norm2.linear")),
                      "norm": ln(f"{pre}.norm2.norm")},
            "ff": {"fc1": lin(f"{pre}.ff.net.0.proj"),
                   "fc2": lin(f"{pre}.ff.net.2")},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "patch_proj": patch,
        "text_proj": lin("patch_embed.text_proj"),
        "time_mlp": {"fc1": f32(lin("time_embedding.linear_1")),
                     "fc2": f32(lin("time_embedding.linear_2"))},
        "blocks": jax.tree.map(lambda *xs: stack(xs), *blocks),
        "norm_final": ln("norm_final"),
        "norm_out": {"lin": f32(lin("norm_out.linear")),
                     "norm": ln("norm_out.norm")},
        "proj_out": lin("proj_out"),
    }


_CONFIG_KEYS = ("num_attention_heads", "attention_head_dim", "in_channels",
                "out_channels", "time_embed_dim", "text_embed_dim",
                "num_layers", "patch_size", "patch_size_t",
                "temporal_compression_ratio", "max_text_seq_length",
                "norm_eps", "spatial_interpolation_scale",
                "temporal_interpolation_scale",
                "use_rotary_positional_embeddings")


def load_cogvideox(model_dir: str, dtype=jnp.bfloat16, quantize=None
                   ) -> Tuple[CogVideoXConfig, Params]:
    """diffusers-layout checkpoint dir (config.json + safetensors, the
    layout `CogVideoXTransformer3DModel.from_pretrained` consumes —
    `cogvideox_transformer3d.py:683-780`) -> (config, params)."""
    import json
    import os

    from . import weights as W_
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    cfg = CogVideoXConfig(**{k: raw[k] for k in _CONFIG_KEYS if k in raw
                             and raw[k] is not None})
    sd = W_.load_state_dict(model_dir)
    if quantize == "fp8":
        # host-side quantization: the bf16 copy never ships (same staging
        # as the Wan 14B fp8 path)
        from ..utils.fp8 import quantize_params_fp8
        params = convert_cogvideox_state_dict(sd, cfg, dtype=dtype,
                                              device=False)
        del sd
        return cfg, jax.tree.map(jnp.asarray, quantize_params_fp8(params))
    if quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return cfg, convert_cogvideox_state_dict(sd, cfg, dtype=dtype)


# ------------------------------------------------------------------- blocks

def _ln_zero(p, x_vid, x_txt, temb, eps):
    """CogVideoXLayerNormZero: shared affine LN, per-stream shift/scale/gate."""
    m = W._linear(jax.nn.silu(temb), p["lin"], jnp.float32)
    shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(m, 6, axis=1)
    g, b = p["norm"]["scale"], p["norm"]["bias"]
    nv = W._layer_norm(x_vid, eps, g, b) * (1 + scale[:, None]) + shift[:, None]
    nt = W._layer_norm(x_txt, eps, g, b) * (1 + e_scale[:, None]) \
        + e_shift[:, None]
    return nv, nt, gate[:, None], e_gate[:, None]


def _head_ln(x, p_norm, eps):
    """per-head LayerNorm on q/k (diffusers qk_norm='layer_norm', eps 1e-6)."""
    return W._layer_norm(x, 1e-6, p_norm["scale"], p_norm["bias"]).astype(
        x.dtype)


def cog_block_apply(p, cfg: CogVideoXConfig, vid, txt, temb, rope_cs,
                    attn_backend=None, seq_mask=None):
    eps = cfg.norm_eps
    B, Lv, D = vid.shape
    Lt = txt.shape[1]
    N, hd = cfg.num_attention_heads, cfg.attention_head_dim

    nv, nt, gate, egate = _ln_zero(p["norm1"], vid, txt, temb, eps)
    cdtype = W._kernel_dtype(p["attn"]["q"])
    nt, nv = nt.astype(cdtype), nv.astype(cdtype)

    # project PER STREAM then concat (identical math to projecting the
    # concat — linears are per-token) so rope applies to the video tokens
    # without a dynamic-slice update on the (possibly seq-sharded) joint axis
    def heads(x, name):
        h = W._linear(x, p["attn"][name])
        return h.reshape(x.shape[0], x.shape[1], N, hd)

    q_t = _head_ln(heads(nt, "q"), p["attn"]["norm_q"], eps)
    q_v = _head_ln(heads(nv, "q"), p["attn"]["norm_q"], eps)
    k_t = _head_ln(heads(nt, "k"), p["attn"]["norm_k"], eps)
    k_v = _head_ln(heads(nv, "k"), p["attn"]["norm_k"], eps)
    if rope_cs is not None:
        cos, sin = rope_cs
        from . import rope as rope_lib
        q_v = rope_lib.apply_rope(q_v, cos, sin)
        k_v = rope_lib.apply_rope(k_v, cos, sin)
    q = jnp.concatenate([q_t, q_v], axis=1)
    k = jnp.concatenate([k_t, k_v], axis=1)
    v = jnp.concatenate([heads(nt, "v"), heads(nv, "v")], axis=1)
    o = attention(q, k, v, mask=seq_mask, backend=attn_backend
                  ).reshape(B, Lt + Lv, D)
    o = W._linear(o, p["attn"]["o"]).astype(jnp.float32)
    txt = txt + egate * o[:, :Lt]
    vid = vid + gate * o[:, Lt:]

    nv, nt, gate, egate = _ln_zero(p["norm2"], vid, txt, temb, eps)
    joint = jnp.concatenate([nt, nv], axis=1).astype(
        W._kernel_dtype(p["ff"]["fc1"]))
    h = W._linear(joint, p["ff"]["fc1"])
    h = jax.nn.gelu(h, approximate=True)
    h = W._linear(h, p["ff"]["fc2"]).astype(jnp.float32)
    txt = txt + egate * h[:, :Lt]
    vid = vid + gate * h[:, Lt:]
    return vid, txt


# ------------------------------------------------------------------ forward

def _timestep_embed(params, cfg: CogVideoXConfig, t: jax.Array) -> jax.Array:
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0) + TimestepEmbedding."""
    half = cfg.inner_dim // 2
    expo = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    ang = t.astype(jnp.float32)[:, None] * jnp.exp(expo)[None, :]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # flipped
    h = W._linear(emb, params["time_mlp"]["fc1"], jnp.float32)
    return W._linear(jax.nn.silu(h), params["time_mlp"]["fc2"], jnp.float32)


def cogvideox_forward(
    params: Params,
    cfg: CogVideoXConfig,
    hidden_states: jax.Array,        # [B, F, C, H, W] (CogVideoX layout)
    encoder_hidden_states: jax.Array,  # [B, Lt, text_embed_dim]
    timestep: jax.Array,             # [B]
    attn_backend=None,
    sp=None,                         # parallel.SPContext or None
) -> jax.Array:
    B, F, C, H, W_ = hidden_states.shape
    p = cfg.patch_size
    pt = cfg.patch_size_t or 1
    f, hh, ww = F // pt, H // p, W_ // p
    cdtype = W._kernel_dtype(params["patch_proj"])

    temb = _timestep_embed(params, cfg, timestep)

    # patchify: features ordered (pt, p, p, C) -> matches the 1.5 linear; for
    # 1.0 (pt=1) it equals the per-frame conv
    x = hidden_states.astype(cdtype).transpose(0, 1, 3, 4, 2)  # B F H W C
    x = x.reshape(B, f, pt, hh, p, ww, p, C)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(B, f * hh * ww, -1)
    vid = W._linear(x, params["patch_proj"]).astype(jnp.float32)
    txt = W._linear(encoder_hidden_states.astype(cdtype),
                    params["text_proj"]).astype(jnp.float32)
    Lt = txt.shape[1]

    rope_cs = None
    if cfg.use_rotary_positional_embeddings:
        cos, sin = get_3d_rope_cos_sin(cfg, (f, hh, ww))
        rope_cs = (jnp.asarray(cos), jnp.asarray(sin))
    else:
        pos = get_3d_sincos_pos_embed(
            cfg.inner_dim, (hh, ww), f, cfg.spatial_interpolation_scale,
            cfg.temporal_interpolation_scale).reshape(1, -1, cfg.inner_dim)
        vid = vid + jnp.asarray(pos)

    # ---- whole-forward sequence parallelism over the joint text+video
    # sequence (reference adapter: `dist/cogvideox_xfuser.py:13-105`): pad
    # EACH stream to a multiple of the seq axis, shard both residual streams
    # (+ the video rope tables), and mask padded keys out of every softmax.
    Lv_real = vid.shape[1]
    seq_mask = None
    if sp is not None and sp.size > 1:
        from ..parallel import joint_pad_masks, pad_rope_tables, pad_stream
        vid = pad_stream(vid, sp.size)
        txt = pad_stream(txt, sp.size)
        if rope_cs is not None:
            rope_cs = pad_rope_tables(*rope_cs, vid.shape[1])
            rope_cs = (sp.shard_rope(rope_cs[0]), sp.shard_rope(rope_cs[1]))
        if txt.shape[1] != Lt or vid.shape[1] != Lv_real:
            seq_mask = joint_pad_masks(B, Lt, txt.shape[1], Lv_real,
                                       vid.shape[1])
        vid = sp.shard_tokens(vid)
        txt = sp.shard_tokens(txt)

    def body(carry, bp):
        v_, t_ = carry
        v_, t_ = cog_block_apply(bp, cfg, v_, t_, temb, rope_cs,
                                 attn_backend=attn_backend,
                                 seq_mask=seq_mask)
        return (v_, t_), None

    (vid, txt), _ = jax.lax.scan(body, (vid, txt), params["blocks"])

    if sp is not None and sp.size > 1:
        vid = sp.gather(vid)[:, :Lv_real]
        txt = sp.gather(txt)[:, :Lt]

    if cfg.use_rotary_positional_embeddings:
        joint = jnp.concatenate([txt, vid], axis=1)
        joint = W._layer_norm(joint, cfg.norm_eps,
                              params["norm_final"]["scale"],
                              params["norm_final"]["bias"])
        vid = joint[:, Lt:]
    else:
        vid = W._layer_norm(vid, cfg.norm_eps, params["norm_final"]["scale"],
                            params["norm_final"]["bias"])

    # AdaLayerNorm out (chunk order shift, scale — diffusers chunk_dim=1;
    # the inner LayerNorm is elementwise-affine)
    m = W._linear(jax.nn.silu(temb), params["norm_out"]["lin"], jnp.float32)
    shift, scale = jnp.split(m, 2, axis=1)
    vid = W._layer_norm(vid, cfg.norm_eps, params["norm_out"]["norm"]["scale"],
                        params["norm_out"]["norm"]["bias"]) \
        * (1 + scale[:, None]) + shift[:, None]
    out = W._linear(vid.astype(cdtype), params["proj_out"])

    # unpatchify back to [B, F, C_out, H, W]; proj_out features are ordered
    # (C, pt, p, p) — `cogvideox_transformer3d.py:667-678` reshapes to
    # (..., -1, p_t, p, p)
    out = out.astype(jnp.float32).reshape(B, f, hh, ww, cfg.out_channels,
                                          pt, p, p)
    out = out.transpose(0, 1, 5, 4, 2, 6, 3, 7)
    return out.reshape(B, F, cfg.out_channels, H, W_)
