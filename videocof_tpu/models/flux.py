"""Flux 2D transformer (VideoX-Fun image-gen sibling).

Rebuild of `videox_fun/models/flux_transformer2d.py`: 19 double-stream MMDiT
blocks (separate img/text projections, joint attention, per-stream
AdaLayerNormZero) followed by 38 single-stream blocks (parallel attention+MLP
over the concatenated sequence, AdaLayerNormZeroSingle), 3-axis rope from
img/txt position ids, combined timestep+pooled-text (+guidance) conditioning,
AdaLayerNormContinuous output head.

Layout notes (match diffusers semantics exactly):
  * AdaLayerNormZero chunk order: shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp; Single: shift, scale, gate.
  * AdaLayerNormContinuous chunk order: scale, shift.
  * text tokens go FIRST in the joint sequence.
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
from . import rope as rope_lib

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19            # double-stream blocks
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# fp8 exclusions for Flux: unlike Wan (whose per-block modulation is a tiny
# [1, 6, d] table), Flux's AdaLN linears are full d->6d matmuls holding ~27%
# of all params (~3.2B = 12.8 GB fp32) — they MUST quantize for the 12B to
# fit one 16 GB chip (total fp8 ~11.9 GB). Only the global embedders and the
# output-head modulation (tiny, drive every block / the final scale) stay
# high precision; 1-D rms/bias leaves skip quantization via ndim < 2.
FLUX_FP8_EXCLUDE = ("bias", "time_embed", "text_embed", "guidance_embed",
                    "norm_")  # norm_out head mod + norm_q/k rms weights

FLUX_DEV = FluxConfig(guidance_embeds=True)
FLUX_TINY = FluxConfig(in_channels=8, out_channels=8, num_layers=2,
                       num_single_layers=2, attention_head_dim=16,
                       num_attention_heads=4, joint_attention_dim=32,
                       pooled_projection_dim=16, axes_dims_rope=(4, 6, 6))


def rope_from_ids(cfg: FluxConfig, ids: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """ids [L, n_axes] -> pairwise cos/sin [L, head_dim//2] (FluxPosEmbed)."""
    parts_c, parts_s = [], []
    for i, d in enumerate(cfg.axes_dims_rope):
        inv = 1.0 / cfg.rope_theta ** (
            jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        ang = ids[:, i].astype(jnp.float32)[:, None] * inv[None, :]
        parts_c.append(jnp.cos(ang))
        parts_s.append(jnp.sin(ang))
    return jnp.concatenate(parts_c, axis=-1), jnp.concatenate(parts_s, axis=-1)


# ---------------------------------------------------------------------- init

def init_flux(key, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    it = iter(jax.random.split(key, 64 + 16 * (cfg.num_layers +
                                               cfg.num_single_layers)))

    def rms(shape=(hd,)):
        return {"weight": jnp.ones(shape, dtype)}

    def dual_block():
        ks = [next(it) for _ in range(12)]
        return {
            "norm1": {"lin": W._init_linear(ks[0], d, 6 * d, jnp.float32)},
            "norm1_context": {"lin": W._init_linear(ks[1], d, 6 * d,
                                                    jnp.float32)},
            "attn": {
                "q": W._init_linear(ks[2], d, d, dtype),
                "k": W._init_linear(ks[3], d, d, dtype),
                "v": W._init_linear(ks[4], d, d, dtype),
                "o": W._init_linear(ks[5], d, d, dtype),
                "add_q": W._init_linear(ks[6], d, d, dtype),
                "add_k": W._init_linear(ks[7], d, d, dtype),
                "add_v": W._init_linear(ks[8], d, d, dtype),
                "add_o": W._init_linear(ks[9], d, d, dtype),
                "norm_q": rms(), "norm_k": rms(),
                "norm_added_q": rms(), "norm_added_k": rms(),
            },
            "ff": {"fc1": W._init_linear(ks[10], d, 4 * d, dtype),
                   "fc2": W._init_linear(next(it), 4 * d, d, dtype)},
            "ff_context": {"fc1": W._init_linear(next(it), d, 4 * d, dtype),
                           "fc2": W._init_linear(ks[11], 4 * d, d, dtype)},
        }

    def single_block():
        ks = [next(it) for _ in range(6)]
        return {
            "norm": {"lin": W._init_linear(ks[0], d, 3 * d, jnp.float32)},
            "attn": {
                "q": W._init_linear(ks[1], d, d, dtype),
                "k": W._init_linear(ks[2], d, d, dtype),
                "v": W._init_linear(ks[3], d, d, dtype),
                "norm_q": rms(), "norm_k": rms(),
            },
            "proj_mlp": W._init_linear(ks[4], d, 4 * d, dtype),
            "proj_out": W._init_linear(ks[5], 5 * d, d, dtype),
        }

    dual = [dual_block() for _ in range(cfg.num_layers)]
    single = [single_block() for _ in range(cfg.num_single_layers)]

    params: Params = {
        "x_embedder": W._init_linear(next(it), cfg.in_channels, d, dtype),
        "context_embedder": W._init_linear(next(it), cfg.joint_attention_dim,
                                           d, dtype),
        "time_embed": {"fc1": W._init_linear(next(it), 256, d, jnp.float32),
                       "fc2": W._init_linear(next(it), d, d, jnp.float32)},
        "text_embed": {"fc1": W._init_linear(
            next(it), cfg.pooled_projection_dim, d, jnp.float32),
            "fc2": W._init_linear(next(it), d, d, jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *dual),
        "single_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *single),
        "norm_out": {"lin": W._init_linear(next(it), d, 2 * d, jnp.float32)},
        "proj_out": W._init_linear(
            next(it), d, cfg.patch_size ** 2 * cfg.out_channels, dtype),
    }
    if cfg.guidance_embeds:
        params["guidance_embed"] = {
            "fc1": W._init_linear(next(it), 256, d, jnp.float32),
            "fc2": W._init_linear(next(it), d, d, jnp.float32)}
    return params


# -------------------------------------------------------- checkpoint loading

def _np_lin(sd, prefix, dtype, device=True):
    """``device=False`` keeps leaves as host numpy (ml_dtypes handles bf16)
    so a 12B-class model can be quantized to fp8 host-side WITHOUT ever
    materializing the bf16 copy in HBM (24 GB > the chip)."""
    conv = jnp.asarray if device else (lambda a, d: np.asarray(a, d))
    p = {"kernel": conv(np.ascontiguousarray(sd[prefix + ".weight"].T),
                        dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = conv(sd[prefix + ".bias"], dtype)
    return p


def _np_rms(sd, prefix, dtype, device=True):
    conv = jnp.asarray if device else (lambda a, d: np.asarray(a, d))
    return {"weight": conv(sd[prefix + ".weight"], dtype)}


def convert_flux_state_dict(sd: Dict[str, np.ndarray], cfg: FluxConfig,
                            dtype=jnp.float32, device=True) -> Params:
    """diffusers-layout `FluxTransformer2DModel` state dict (numpy values) ->
    our pytree (module names per `flux_transformer2d.py:426-505,638-695`).
    ``device=False`` -> host numpy leaves (see `_np_lin`)."""
    stack = jnp.stack if device else np.stack

    def lin(prefix, dt=dtype):
        return _np_lin(sd, prefix, dt, device=device)

    def dual(i):
        pre = f"transformer_blocks.{i}"
        return {
            "norm1": {"lin": lin(f"{pre}.norm1.linear", jnp.float32)},
            "norm1_context": {"lin": lin(f"{pre}.norm1_context.linear",
                                         jnp.float32)},
            "attn": {
                "q": lin(f"{pre}.attn.to_q"),
                "k": lin(f"{pre}.attn.to_k"),
                "v": lin(f"{pre}.attn.to_v"),
                "o": lin(f"{pre}.attn.to_out.0"),
                "add_q": lin(f"{pre}.attn.add_q_proj"),
                "add_k": lin(f"{pre}.attn.add_k_proj"),
                "add_v": lin(f"{pre}.attn.add_v_proj"),
                "add_o": lin(f"{pre}.attn.to_add_out"),
                "norm_q": _np_rms(sd, f"{pre}.attn.norm_q", dtype, device),
                "norm_k": _np_rms(sd, f"{pre}.attn.norm_k", dtype, device),
                "norm_added_q": _np_rms(sd, f"{pre}.attn.norm_added_q",
                                        dtype, device),
                "norm_added_k": _np_rms(sd, f"{pre}.attn.norm_added_k",
                                        dtype, device),
            },
            "ff": {"fc1": lin(f"{pre}.ff.net.0.proj"),
                   "fc2": lin(f"{pre}.ff.net.2")},
            "ff_context": {"fc1": lin(f"{pre}.ff_context.net.0.proj"),
                           "fc2": lin(f"{pre}.ff_context.net.2")},
        }

    def single(i):
        pre = f"single_transformer_blocks.{i}"
        return {
            "norm": {"lin": lin(f"{pre}.norm.linear", jnp.float32)},
            "attn": {
                "q": lin(f"{pre}.attn.to_q"),
                "k": lin(f"{pre}.attn.to_k"),
                "v": lin(f"{pre}.attn.to_v"),
                "norm_q": _np_rms(sd, f"{pre}.attn.norm_q", dtype, device),
                "norm_k": _np_rms(sd, f"{pre}.attn.norm_k", dtype, device),
            },
            "proj_mlp": lin(f"{pre}.proj_mlp"),
            "proj_out": lin(f"{pre}.proj_out"),
        }

    params: Params = {
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_embed": {
            "fc1": lin("time_text_embed.timestep_embedder.linear_1",
                       jnp.float32),
            "fc2": lin("time_text_embed.timestep_embedder.linear_2",
                       jnp.float32)},
        "text_embed": {
            "fc1": lin("time_text_embed.text_embedder.linear_1", jnp.float32),
            "fc2": lin("time_text_embed.text_embedder.linear_2",
                       jnp.float32)},
        "blocks": jax.tree.map(
            lambda *xs: stack(xs),
            *[dual(i) for i in range(cfg.num_layers)]),
        "single_blocks": jax.tree.map(
            lambda *xs: stack(xs),
            *[single(i) for i in range(cfg.num_single_layers)]),
        "norm_out": {"lin": lin("norm_out.linear", jnp.float32)},
        "proj_out": lin("proj_out"),
    }
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        params["guidance_embed"] = {
            "fc1": lin("time_text_embed.guidance_embedder.linear_1",
                       jnp.float32),
            "fc2": lin("time_text_embed.guidance_embedder.linear_2",
                       jnp.float32)}
    return params


_CONFIG_KEYS = ("patch_size", "in_channels", "out_channels", "num_layers",
                "num_single_layers", "attention_head_dim",
                "num_attention_heads", "joint_attention_dim",
                "pooled_projection_dim", "guidance_embeds", "axes_dims_rope")


def load_flux(model_dir: str, dtype=jnp.bfloat16, quantize=None
              ) -> Tuple[FluxConfig, Params]:
    """diffusers-layout checkpoint dir -> (config, params)
    (`flux_transformer2d.py:958-1048` from_pretrained layout).

    ``quantize="fp8"`` converts host-side and quantizes BEFORE the device
    ship (Flux-dev bf16 is 24 GB — it must never exist in HBM; the fp8 copy
    is 12 GB and fits one 16 GB chip, same staging as the Wan 14B path)."""
    import json
    import os

    from . import weights as W_
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    kw = {k: raw[k] for k in _CONFIG_KEYS if k in raw and raw[k] is not None}
    if "axes_dims_rope" in kw:
        kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
    kw.setdefault("out_channels", kw.get("in_channels", 64))
    cfg = FluxConfig(**kw)
    sd = W_.load_state_dict(model_dir)
    if quantize == "fp8":
        from ..utils.fp8 import quantize_params_fp8
        params = convert_flux_state_dict(sd, cfg, dtype=dtype, device=False)
        del sd
        params = quantize_params_fp8(params, exclude=FLUX_FP8_EXCLUDE)
        return cfg, jax.tree.map(jnp.asarray, params)
    if quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return cfg, convert_flux_state_dict(sd, cfg, dtype=dtype)


# -------------------------------------------------------------------- blocks

def _ada_zero(p, temb, n_chunks):
    m = W._linear(jax.nn.silu(temb), p["lin"], jnp.float32)
    return jnp.split(m, n_chunks, axis=1)


def _proj_heads(x, p, name, norm_name, N, hd, eps):
    h = W._linear(x, p[name]).reshape(x.shape[0], x.shape[1], N, hd)
    if norm_name:
        h = W._rms_norm(h, p[norm_name]["weight"], eps)
    return h


def flux_dual_block(p, cfg: FluxConfig, img, txt, temb, rope_cs,
                    attn_backend=None, seq_mask=None):
    eps = cfg.eps
    N, hd = cfg.num_attention_heads, cfg.attention_head_dim
    B, Li, D = img.shape
    Lt = txt.shape[1]
    cdtype = W._kernel_dtype(p["attn"]["q"])

    sh, sc, g_msa, sh_m, sc_m, g_mlp = _ada_zero(p["norm1"], temb, 6)
    csh, csc, cg_msa, csh_m, csc_m, cg_mlp = _ada_zero(p["norm1_context"],
                                                       temb, 6)
    ni = (W._layer_norm(img, 1e-6) * (1 + sc[:, None]) + sh[:, None]
          ).astype(cdtype)
    nt = (W._layer_norm(txt, 1e-6) * (1 + csc[:, None]) + csh[:, None]
          ).astype(cdtype)

    q = jnp.concatenate([
        _proj_heads(nt, p["attn"], "add_q", "norm_added_q", N, hd, eps),
        _proj_heads(ni, p["attn"], "q", "norm_q", N, hd, eps)], axis=1)
    k = jnp.concatenate([
        _proj_heads(nt, p["attn"], "add_k", "norm_added_k", N, hd, eps),
        _proj_heads(ni, p["attn"], "k", "norm_k", N, hd, eps)], axis=1)
    v = jnp.concatenate([
        _proj_heads(nt, p["attn"], "add_v", None, N, hd, eps),
        _proj_heads(ni, p["attn"], "v", None, N, hd, eps)], axis=1)
    if rope_cs is not None:
        q = rope_lib.apply_rope(q, *rope_cs)
        k = rope_lib.apply_rope(k, *rope_cs)
    o = attention(q, k, v, mask=seq_mask, backend=attn_backend
                  ).reshape(B, Lt + Li, D)
    o_txt = W._linear(o[:, :Lt], p["attn"]["add_o"]).astype(jnp.float32)
    o_img = W._linear(o[:, Lt:], p["attn"]["o"]).astype(jnp.float32)

    img = img + g_msa[:, None] * o_img
    ni = W._layer_norm(img, 1e-6) * (1 + sc_m[:, None]) + sh_m[:, None]
    h = W._linear(ni.astype(cdtype), p["ff"]["fc1"])
    h = jax.nn.gelu(h, approximate=True)
    img = img + g_mlp[:, None] * W._linear(h, p["ff"]["fc2"]).astype(
        jnp.float32)

    txt = txt + cg_msa[:, None] * o_txt
    nt = W._layer_norm(txt, 1e-6) * (1 + csc_m[:, None]) + csh_m[:, None]
    h = W._linear(nt.astype(cdtype), p["ff_context"]["fc1"])
    h = jax.nn.gelu(h, approximate=True)
    txt = txt + cg_mlp[:, None] * W._linear(h, p["ff_context"]["fc2"]
                                            ).astype(jnp.float32)
    return img, txt


def flux_single_block(p, cfg: FluxConfig, x, temb, rope_cs,
                      attn_backend=None, seq_mask=None):
    eps = cfg.eps
    N, hd = cfg.num_attention_heads, cfg.attention_head_dim
    B, L, D = x.shape
    cdtype = W._kernel_dtype(p["attn"]["q"])

    sh, sc, gate = _ada_zero(p["norm"], temb, 3)
    nx = (W._layer_norm(x, 1e-6) * (1 + sc[:, None]) + sh[:, None]
          ).astype(cdtype)
    q = _proj_heads(nx, p["attn"], "q", "norm_q", N, hd, eps)
    k = _proj_heads(nx, p["attn"], "k", "norm_k", N, hd, eps)
    v = _proj_heads(nx, p["attn"], "v", None, N, hd, eps)
    if rope_cs is not None:
        q = rope_lib.apply_rope(q, *rope_cs)
        k = rope_lib.apply_rope(k, *rope_cs)
    att = attention(q, k, v, mask=seq_mask, backend=attn_backend
                    ).reshape(B, L, D)
    mlp = jax.nn.gelu(W._linear(nx, p["proj_mlp"]), approximate=True)
    h = jnp.concatenate([att, mlp], axis=-1)
    out = W._linear(h, p["proj_out"]).astype(jnp.float32)
    return x + gate[:, None] * out


# ------------------------------------------------------------------- forward

def _sincos_256(t: jax.Array) -> jax.Array:
    """diffusers Timesteps(256, flip_sin_to_cos=True, shift=0)."""
    half = 128
    expo = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    ang = t.astype(jnp.float32)[:, None] * jnp.exp(expo)[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def flux_forward(
    params: Params,
    cfg: FluxConfig,
    hidden_states: jax.Array,        # [B, L_img, in_channels] packed latents
    encoder_hidden_states: jax.Array,  # [B, L_txt, joint_attention_dim]
    pooled_projections: jax.Array,   # [B, pooled_projection_dim]
    timestep: jax.Array,             # [B] in [0, 1]
    img_ids: jax.Array,              # [L_img, 3]
    txt_ids: jax.Array,              # [L_txt, 3]
    guidance: Optional[jax.Array] = None,
    attn_backend=None,
    sp=None,                         # parallel.SPContext or None
) -> jax.Array:
    cdtype = W._kernel_dtype(params["x_embedder"])
    img = W._linear(hidden_states.astype(cdtype), params["x_embedder"]
                    ).astype(jnp.float32)
    txt = W._linear(encoder_hidden_states.astype(cdtype),
                    params["context_embedder"]).astype(jnp.float32)

    # whole-forward SP over the joint txt+img sequence (reference adapter:
    # `dist/flux_xfuser.py:1-167`): pad per stream, shard both residual
    # streams, key-mask the pad slots. Ids pad with zeros = identity rope.
    Lt_real, Li_real = txt.shape[1], img.shape[1]
    seq_mask = None
    if sp is not None and sp.size > 1:
        from ..parallel import joint_pad_masks, pad_stream
        img = pad_stream(img, sp.size)
        txt = pad_stream(txt, sp.size)
        txt_ids = jnp.pad(txt_ids, ((0, txt.shape[1] - Lt_real), (0, 0)))
        img_ids = jnp.pad(img_ids, ((0, img.shape[1] - Li_real), (0, 0)))
        if txt.shape[1] != Lt_real or img.shape[1] != Li_real:
            seq_mask = joint_pad_masks(img.shape[0], Lt_real, txt.shape[1],
                                       Li_real, img.shape[1])
        img = sp.shard_tokens(img)
        txt = sp.shard_tokens(txt)

    temb = _sincos_256(timestep * 1000.0)
    temb = W._linear(temb, params["time_embed"]["fc1"], jnp.float32)
    temb = W._linear(jax.nn.silu(temb), params["time_embed"]["fc2"],
                     jnp.float32)
    pooled = W._linear(pooled_projections.astype(jnp.float32),
                       params["text_embed"]["fc1"], jnp.float32)
    pooled = W._linear(jax.nn.silu(pooled), params["text_embed"]["fc2"],
                       jnp.float32)
    temb = temb + pooled
    if guidance is not None and "guidance_embed" in params:
        g = _sincos_256(guidance * 1000.0)
        g = W._linear(g, params["guidance_embed"]["fc1"], jnp.float32)
        g = W._linear(jax.nn.silu(g), params["guidance_embed"]["fc2"],
                      jnp.float32)
        temb = temb + g

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    rope_cs = rope_from_ids(cfg, ids)
    if sp is not None and sp.size > 1:
        rope_cs = (sp.shard_rope(rope_cs[0]), sp.shard_rope(rope_cs[1]))

    def dual_body(carry, bp):
        i, t = carry
        i, t = flux_dual_block(bp, cfg, i, t, temb, rope_cs,
                               attn_backend=attn_backend, seq_mask=seq_mask)
        return (i, t), None

    (img, txt), _ = jax.lax.scan(dual_body, (img, txt), params["blocks"])

    x = jnp.concatenate([txt, img], axis=1)

    def single_body(carry, bp):
        return flux_single_block(bp, cfg, carry, temb, rope_cs,
                                 attn_backend=attn_backend,
                                 seq_mask=seq_mask), None

    x, _ = jax.lax.scan(single_body, x, params["single_blocks"])
    img = x[:, txt.shape[1]:]
    if sp is not None and sp.size > 1:
        img = sp.gather(img)[:, :Li_real]

    # AdaLayerNormContinuous: chunk order (scale, shift)
    m = W._linear(jax.nn.silu(temb), params["norm_out"]["lin"], jnp.float32)
    scale, shift = jnp.split(m, 2, axis=1)
    img = W._layer_norm(img, 1e-6) * (1 + scale[:, None]) + shift[:, None]
    return W._linear(img.astype(cdtype), params["proj_out"]).astype(
        jnp.float32)
