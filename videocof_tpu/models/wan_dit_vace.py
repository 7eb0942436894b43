"""VACE control branch for the Wan DiT.

Rebuild of `videox_fun/models/wan_transformer3d_vace.py`: a ControlNet-style
side stack — ``vace_blocks`` (full Wan blocks at every ``stride``-th layer,
default every 2nd) run over patch-embedded control latents seeded with
``before_proj(c) + x`` and emit ``after_proj`` skips; the base stack adds
``hints[i] * context_scale`` after each vace-mapped layer (`:20-89,116-135`).

TPU structure: the vace chain is one `lax.scan` collecting the hint stack
[n_vace, B, L, D]; the base stack scans over GROUPS of ``stride`` layers so
hint injection stays inside a single compiled scan body (no per-layer Python
unrolling)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import WanDiTConfig
from . import wan_dit as W


def init_vace_params(key, cfg: WanDiTConfig, stride: int = 2,
                     vace_in_dim: Optional[int] = None,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """Extra parameters for the control branch. The base DiT params come from
    `wan_dit.init_wan_dit` unchanged."""
    assert cfg.num_layers % stride == 0
    n_vace = cfg.num_layers // stride
    vace_in = vace_in_dim or cfg.in_dim
    pt, ph, pw = cfg.patch_size
    ks = jax.random.split(key, n_vace + 3)

    blocks = [W.init_block_params(ks[i], cfg, dtype) for i in range(n_vace)]
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    zeros_lin = {"kernel": jnp.zeros((cfg.dim, cfg.dim), dtype),
                 "bias": jnp.zeros((cfg.dim,), dtype)}
    return {
        "vace_patch_embed": W._init_linear(ks[-1], vace_in * pt * ph * pw,
                                           cfg.dim, dtype),
        "vace_blocks": blocks,
        # zero-init projections (reference `:36-41`): the control branch is a
        # no-op at init
        "before_proj": jax.tree.map(jnp.copy, zeros_lin),
        "after_proj": jax.tree.map(
            lambda x: jnp.stack([x] * n_vace), zeros_lin),
    }


def convert_vace_state_dict(sd, cfg: WanDiTConfig, stride: int = 2,
                            dtype=None):
    """`VaceWanTransformer3DModel` torch keys -> (base_params, vace_params).

    Base keys (``blocks.{i}`` — `BaseWanAttentionBlock` adds no parameters,
    `wan_transformer3d_vace.py:66-90`) go through
    `weights.convert_dit_state_dict`; the control branch maps
    ``vace_patch_embedding`` (Conv3d -> linear over patchified tokens, same
    reshape as the base patch embed), ``vace_blocks.{n}`` (full Wan blocks),
    the zero-init ``vace_blocks.0.before_proj`` and the per-block
    ``after_proj`` stack (`:20-41`).
    """
    import numpy as np

    from .weights import _lin, convert_block_state_dict, \
        convert_dit_state_dict
    dtype = dtype or np.float32

    base = convert_dit_state_dict(sd, cfg, dtype=dtype)
    n_vace = cfg.num_layers // stride

    pe_w = sd["vace_patch_embedding.weight"]  # [D, C, kt, kh, kw]
    vace = {
        "vace_patch_embed": {
            "kernel": np.ascontiguousarray(
                pe_w.reshape(pe_w.shape[0], -1).T).astype(dtype),
            "bias": sd["vace_patch_embedding.bias"].astype(dtype),
        },
        "before_proj": _lin(sd, "vace_blocks.0.before_proj", dtype),
    }
    blocks = [convert_block_state_dict(sd, f"vace_blocks.{n}.", cfg, dtype)
              for n in range(n_vace)]
    import jax
    vace["vace_blocks"] = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks)
    projs = [_lin(sd, f"vace_blocks.{n}.after_proj", dtype)
             for n in range(n_vace)]
    vace["after_proj"] = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *projs)
    return base, vace


def vace_forward(
    base_params: Dict[str, Any],
    vace_params: Dict[str, Any],
    cfg: WanDiTConfig,
    x: jax.Array,                 # [B, C, F, H, W] latents
    vace_context: jax.Array,      # [B, C_vace, F, H, W] control latents
    t: jax.Array,
    context: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    context_scale: float = 1.0,
    stride: int = 2,
    attn_backend=None,
) -> jax.Array:
    """Velocity prediction with control hints."""
    compute_dtype = base_params["patch_embed"]["kernel"].dtype

    tokens, grid = W.patchify(x.astype(compute_dtype), cfg.patch_size)
    hseq = W._linear(tokens, base_params["patch_embed"])

    e = W.sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    e = W._linear(e, base_params["time_mlp"]["fc1"], jnp.float32)
    e = jax.nn.silu(e)
    e = W._linear(e, base_params["time_mlp"]["fc2"], jnp.float32)
    e0 = W._linear(jax.nn.silu(e), base_params["time_proj"]["fc"],
                   jnp.float32).reshape(e.shape[0], 6, cfg.dim)

    ctx = W._linear(context.astype(compute_dtype),
                    base_params["text_mlp"]["fc1"])
    ctx = W._gelu_tanh(ctx)
    ctx = W._linear(ctx, base_params["text_mlp"]["fc2"])

    rope_cs = (rope_cos, rope_sin)
    stream = hseq.astype(jnp.float32)

    # ---- control chain -> hint stack (`forward_vace`)
    ctoks, _ = W.patchify(vace_context.astype(compute_dtype), cfg.patch_size)
    c = W._linear(ctoks, vace_params["vace_patch_embed"]).astype(jnp.float32)
    c = W._linear(c, vace_params["before_proj"],
                  jnp.float32) + stream

    def vace_body(carry, bp_and_proj):
        bp, proj = bp_and_proj
        out = W.wan_block_apply(bp, cfg, carry, e0, ctx, rope_cs,
                                attn_backend=attn_backend)
        hint = W._linear(out, proj, jnp.float32)
        return out, hint

    _, hints = jax.lax.scan(
        vace_body, c,
        (vace_params["vace_blocks"], vace_params["after_proj"]))
    # hints: [n_vace, B, L, D]

    # ---- base stack, scanned over groups of `stride` layers; the group's
    # first layer receives the matching hint
    n_vace = hints.shape[0]
    assert cfg.num_layers == n_vace * stride
    grouped = jax.tree.map(
        lambda a: a.reshape(n_vace, stride, *a.shape[1:]),
        base_params["blocks"])

    def group_body(carry, inp):
        group_bp, hint = inp
        s = carry
        for j in range(stride):
            bp = jax.tree.map(lambda a: a[j], group_bp)
            s = W.wan_block_apply(bp, cfg, s, e0, ctx, rope_cs,
                                  attn_backend=attn_backend)
            if j == 0:
                s = s + hint * context_scale
        return s, None

    stream, _ = jax.lax.scan(group_body, stream, (grouped, hints))

    hm = base_params["head"]["modulation"][None].astype(jnp.float32) \
        + e[:, None, :]
    out = W._layer_norm(stream, cfg.eps) * (1.0 + hm[:, 1][:, None]) \
        + hm[:, 0][:, None]
    out = W._linear(out.astype(compute_dtype), base_params["head"]["fc"])
    return W.unpatchify(out.astype(jnp.float32), grid, cfg.patch_size,
                        cfg.out_dim)
