"""QwenImage 2D transformer (VideoX-Fun image-gen sibling).

Rebuild of `videox_fun/models/qwenimage_transformer2d.py`: 60 dual-stream
blocks where each stream derives TWO (shift, scale, gate) modulations from a
single silu+linear over the time embedding (`:369-414`), joint attention with
separate img/txt projections and RMS q/k norms, RMS-normed text input,
3-axis rope, AdaLayerNormContinuous head. Shares primitives with `flux.py`.
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
from .flux import _sincos_256, rope_from_ids as _flux_rope_from_ids

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# fp8 exclusions (same rationale as flux.FLUX_FP8_EXCLUDE): the per-stream
# img_mod/txt_mod AdaLN linears are full d->6d matmuls (~34% of all params)
# and must quantize; embedders/head mod stay high precision.
QWEN_FP8_EXCLUDE = ("bias", "time_embed", "txt_norm", "norm_")

QWENIMAGE = QwenImageConfig()
QWENIMAGE_TINY = QwenImageConfig(in_channels=8, out_channels=8, num_layers=2,
                                 attention_head_dim=16,
                                 num_attention_heads=4,
                                 joint_attention_dim=32,
                                 axes_dims_rope=(4, 6, 6))


def init_qwenimage(key, cfg: QwenImageConfig, dtype=jnp.float32) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    it = iter(jax.random.split(key, 24 + 16 * cfg.num_layers))

    def rms():
        return {"weight": jnp.ones((hd,), dtype)}

    def block():
        ks = [next(it) for _ in range(12)]
        return {
            "img_mod": {"lin": W._init_linear(ks[0], d, 6 * d, jnp.float32)},
            "txt_mod": {"lin": W._init_linear(ks[1], d, 6 * d, jnp.float32)},
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
            "img_mlp": {"fc1": W._init_linear(ks[10], d, 4 * d, dtype),
                        "fc2": W._init_linear(next(it), 4 * d, d, dtype)},
            "txt_mlp": {"fc1": W._init_linear(next(it), d, 4 * d, dtype),
                        "fc2": W._init_linear(ks[11], 4 * d, d, dtype)},
        }

    blocks = [block() for _ in range(cfg.num_layers)]
    return {
        "img_in": W._init_linear(next(it), cfg.in_channels, d, dtype),
        "txt_in": W._init_linear(next(it), cfg.joint_attention_dim, d, dtype),
        "txt_norm": {"weight": jnp.ones((cfg.joint_attention_dim,), dtype)},
        "time_embed": {"fc1": W._init_linear(next(it), 256, d, jnp.float32),
                       "fc2": W._init_linear(next(it), d, d, jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out": {"lin": W._init_linear(next(it), d, 2 * d, jnp.float32)},
        "proj_out": W._init_linear(
            next(it), d, cfg.patch_size ** 2 * cfg.out_channels, dtype),
    }


# -------------------------------------------------------- checkpoint loading

def convert_qwenimage_state_dict(sd, cfg: QwenImageConfig,
                                 dtype=jnp.float32, device=True) -> Params:
    """diffusers-layout `QwenImageTransformer2DModel` state dict (numpy
    values) -> our pytree (module names per
    `qwenimage_transformer2d.py:369-415,517-560`; the per-stream modulation
    is an `nn.Sequential(SiLU, Linear)`, hence the `.1` index)."""
    from .flux import _np_lin, _np_rms

    stack = jnp.stack if device else np.stack

    def lin(prefix, dt=dtype):
        return _np_lin(sd, prefix, dt, device=device)

    def block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "img_mod": {"lin": lin(f"{pre}.img_mod.1", jnp.float32)},
            "txt_mod": {"lin": lin(f"{pre}.txt_mod.1", jnp.float32)},
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
            "img_mlp": {"fc1": lin(f"{pre}.img_mlp.net.0.proj"),
                        "fc2": lin(f"{pre}.img_mlp.net.2")},
            "txt_mlp": {"fc1": lin(f"{pre}.txt_mlp.net.0.proj"),
                        "fc2": lin(f"{pre}.txt_mlp.net.2")},
        }

    return {
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "txt_norm": _np_rms(sd, "txt_norm", dtype, device),
        "time_embed": {
            "fc1": lin("time_text_embed.timestep_embedder.linear_1",
                       jnp.float32),
            "fc2": lin("time_text_embed.timestep_embedder.linear_2",
                       jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: stack(xs),
                               *[block(i) for i in range(cfg.num_layers)]),
        "norm_out": {"lin": lin("norm_out.linear", jnp.float32)},
        "proj_out": lin("proj_out"),
    }


_CONFIG_KEYS = ("patch_size", "in_channels", "out_channels", "num_layers",
                "attention_head_dim", "num_attention_heads",
                "joint_attention_dim", "axes_dims_rope")


def load_qwenimage(model_dir: str, dtype=jnp.bfloat16, quantize=None
                   ) -> Tuple[QwenImageConfig, Params]:
    """diffusers-layout checkpoint dir -> (config, params)
    (`qwenimage_transformer2d.py:760-854` from_pretrained layout).

    ``quantize="fp8"`` quantizes host-side before the device ship. NOTE:
    the full 20B QwenImage is ~20 GB even in fp8 — beyond one 16 GB v5e;
    single-chip fp8 serves distilled/pruned variants, the full model needs
    the TP path (parallel/tp.py) over >=2 chips."""
    import json
    import os

    from . import weights as W_
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    kw = {k: raw[k] for k in _CONFIG_KEYS if k in raw and raw[k] is not None}
    if "axes_dims_rope" in kw:
        kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
    cfg = QwenImageConfig(**kw)
    sd = W_.load_state_dict(model_dir)
    if quantize == "fp8":
        from ..utils.fp8 import quantize_params_fp8
        params = convert_qwenimage_state_dict(sd, cfg, dtype=dtype,
                                              device=False)
        del sd
        return cfg, jax.tree.map(jnp.asarray, quantize_params_fp8(
            params, exclude=QWEN_FP8_EXCLUDE))
    if quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return cfg, convert_qwenimage_state_dict(sd, cfg, dtype=dtype)


def qwen_position_ids(grid_fhw: Tuple[int, int, int], txt_len: int,
                      scale_rope: bool = True):
    """Position ids matching the reference `QwenEmbedRope`
    (`qwenimage_transformer2d.py:177-273`): video ids are (frame, h, w) per
    token with `scale_rope` centering h/w around zero (negative-side
    positions use index -k), text ids run on all three axes from
    `max_vid_index` upward."""
    f, h, w = grid_fhw
    fi = np.arange(f)
    hi = (np.concatenate([np.arange(-(h - h // 2), 0), np.arange(h // 2)])
          if scale_rope else np.arange(h))
    wi = (np.concatenate([np.arange(-(w - w // 2), 0), np.arange(w // 2)])
          if scale_rope else np.arange(w))
    img = np.stack(np.meshgrid(fi, hi, wi, indexing="ij"),
                   axis=-1).reshape(f * h * w, 3)
    mx = max(h // 2, w // 2) if scale_rope else max(h, w)
    txt = mx + np.arange(txt_len)
    txt = np.stack([txt, txt, txt], axis=-1)
    return jnp.asarray(img, jnp.float32), jnp.asarray(txt, jnp.float32)


def _modulate(x, mod, eps):
    """mod [B, 3*D] -> (modulated, gate) (`qwenimage:409-411`,
    chunk order shift, scale, gate)."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    return (W._layer_norm(x, eps) * (1 + scale[:, None]) + shift[:, None],
            gate[:, None])


def qwen_block_apply(p, cfg: QwenImageConfig, img, txt, temb, rope_cs,
                     txt_mask=None, attn_backend=None, seq_mask=None):
    eps = cfg.eps
    N, hd = cfg.num_attention_heads, cfg.attention_head_dim
    B, Li, D = img.shape
    Lt = txt.shape[1]
    cdtype = W._kernel_dtype(p["attn"]["q"])

    img_mod = W._linear(jax.nn.silu(temb), p["img_mod"]["lin"], jnp.float32)
    txt_mod = W._linear(jax.nn.silu(temb), p["txt_mod"]["lin"], jnp.float32)
    im1, im2 = jnp.split(img_mod, 2, axis=-1)
    tm1, tm2 = jnp.split(txt_mod, 2, axis=-1)

    ni, ig1 = _modulate(img, im1, eps)
    nt, tg1 = _modulate(txt, tm1, eps)
    ni, nt = ni.astype(cdtype), nt.astype(cdtype)

    def heads(x, name, norm):
        h = W._linear(x, p["attn"][name]).reshape(x.shape[0], x.shape[1], N,
                                                  hd)
        if norm:
            h = W._rms_norm(h, p["attn"][norm]["weight"], eps)
        return h

    q = jnp.concatenate([heads(nt, "add_q", "norm_added_q"),
                         heads(ni, "q", "norm_q")], axis=1)
    k = jnp.concatenate([heads(nt, "add_k", "norm_added_k"),
                         heads(ni, "k", "norm_k")], axis=1)
    v = jnp.concatenate([heads(nt, "add_v", None),
                         heads(ni, "v", None)], axis=1)
    if rope_cs is not None:
        q = rope_lib.apply_rope(q, *rope_cs)
        k = rope_lib.apply_rope(k, *rope_cs)
    mask = seq_mask
    if mask is None and txt_mask is not None:
        mask = jnp.concatenate(
            [txt_mask.astype(bool),
             jnp.ones((B, Li), bool)], axis=1)
    o = attention(q, k, v, mask=mask, backend=attn_backend
                  ).reshape(B, Lt + Li, D)
    o_txt = W._linear(o[:, :Lt], p["attn"]["add_o"]).astype(jnp.float32)
    o_img = W._linear(o[:, Lt:], p["attn"]["o"]).astype(jnp.float32)

    img = img + ig1 * o_img
    txt = txt + tg1 * o_txt

    ni, ig2 = _modulate(img, im2, eps)
    h = W._linear(ni.astype(cdtype), p["img_mlp"]["fc1"])
    h = jax.nn.gelu(h, approximate=True)
    img = img + ig2 * W._linear(h, p["img_mlp"]["fc2"]).astype(jnp.float32)

    nt, tg2 = _modulate(txt, tm2, eps)
    h = W._linear(nt.astype(cdtype), p["txt_mlp"]["fc1"])
    h = jax.nn.gelu(h, approximate=True)
    txt = txt + tg2 * W._linear(h, p["txt_mlp"]["fc2"]).astype(jnp.float32)
    return img, txt


def qwenimage_forward(
    params: Params,
    cfg: QwenImageConfig,
    hidden_states: jax.Array,          # [B, L_img, in_channels]
    encoder_hidden_states: jax.Array,  # [B, L_txt, joint_attention_dim]
    timestep: jax.Array,               # [B] in [0, 1]
    img_ids: jax.Array,                # [L_img, 3]
    txt_ids: jax.Array,                # [L_txt, 3]
    encoder_hidden_states_mask: Optional[jax.Array] = None,
    attn_backend=None,
    sp=None,                           # parallel.SPContext or None
) -> jax.Array:
    cdtype = W._kernel_dtype(params["img_in"])
    img = W._linear(hidden_states.astype(cdtype), params["img_in"]
                    ).astype(jnp.float32)
    txt = W._rms_norm(encoder_hidden_states.astype(cdtype),
                      params["txt_norm"]["weight"], 1e-6)
    txt = W._linear(txt, params["txt_in"]).astype(jnp.float32)

    temb = _sincos_256(timestep * 1000.0)
    temb = W._linear(temb, params["time_embed"]["fc1"], jnp.float32)
    temb = W._linear(jax.nn.silu(temb), params["time_embed"]["fc2"],
                     jnp.float32)

    # whole-forward SP over the joint txt+img sequence (reference adapter:
    # `dist/qwen_xfuser.py:1-175`): pad per stream, shard both streams,
    # fold the ragged text mask into the joint key mask. Ids pad with zeros
    # = identity rope.
    Lt_real, Li_real = txt.shape[1], img.shape[1]
    seq_mask = None
    if sp is not None and sp.size > 1:
        from ..parallel import joint_pad_masks, pad_stream
        img = pad_stream(img, sp.size)
        txt = pad_stream(txt, sp.size)
        txt_ids = jnp.pad(txt_ids, ((0, txt.shape[1] - Lt_real), (0, 0)))
        img_ids = jnp.pad(img_ids, ((0, img.shape[1] - Li_real), (0, 0)))
        padded = (txt.shape[1] != Lt_real or img.shape[1] != Li_real)
        if padded or encoder_hidden_states_mask is not None:
            lt = (encoder_hidden_states_mask
                  if encoder_hidden_states_mask is not None else Lt_real)
            seq_mask = joint_pad_masks(img.shape[0], lt, txt.shape[1],
                                       Li_real, img.shape[1])
        img = sp.shard_tokens(img)
        txt = sp.shard_tokens(txt)

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    rope_cs = _flux_rope_from_ids(cfg, ids)
    if sp is not None and sp.size > 1:
        rope_cs = (sp.shard_rope(rope_cs[0]), sp.shard_rope(rope_cs[1]))

    def body(carry, bp):
        i, t = carry
        i, t = qwen_block_apply(bp, cfg, i, t, temb, rope_cs,
                                txt_mask=encoder_hidden_states_mask,
                                attn_backend=attn_backend,
                                seq_mask=seq_mask)
        return (i, t), None

    (img, txt), _ = jax.lax.scan(body, (img, txt), params["blocks"])
    if sp is not None and sp.size > 1:
        img = sp.gather(img)[:, :Li_real]

    m = W._linear(jax.nn.silu(temb), params["norm_out"]["lin"], jnp.float32)
    scale, shift = jnp.split(m, 2, axis=1)
    img = W._layer_norm(img, 1e-6) * (1 + scale[:, None]) + shift[:, None]
    return W._linear(img.astype(cdtype), params["proj_out"]).astype(
        jnp.float32)
