"""Wan 3D diffusion transformer, TPU-native.

Functional re-design of the reference denoiser
(`videox_fun/models/wan_transformer3d.py:567-1105`): parameters are a pytree,
the forward is a pure function, and the N transformer blocks run under a
`jax.lax.scan` over stacked block parameters (one compiled block body instead
of N inlined copies — critical for 30/40-layer models on a single-core build
machine and for clean remat).

Precision policy mirrors the reference's autocast islands: the residual stream
and AdaLN modulation run in fp32 (`wan_transformer3d.py:913`, block arithmetic
promotes to fp32), while matmul inputs are cast to the parameter dtype
(bf16 on TPU) so the MXU does the heavy lifting.

Key structural differences from the reference, by design:
  * RoPE segment logic arrives as precomputed cos/sin tables
    (`videocof_tpu.models.rope`) — data, not control flow, so the same forward
    jits for plain, paired, and CoF geometries and shards under pjit.
  * patch embedding is patchify+matmul rather than Conv3d: identical math for
    stride == kernel, and it lowers straight onto the MXU.
  * no list-of-tensors batch: one [B, C, F, H, W] array, one static seq_len.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
import numpy as np

from ..configs import WanDiTConfig
from ..ops import attention
from . import rope as rope_lib

Params = Dict[str, Any]


# --------------------------------------------------------------------- helpers

def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """cat([cos(p*w), sin(p*w)]) with w_i = 10000^(-i/half)
    (reference `wan_transformer3d.py:31-41`)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _layer_norm(x, eps, scale=None, bias=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out


def _rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1,
                                      keepdims=True) + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def _kernel(p, dtype=None):
    """Resolve a weight leaf, dequantizing {"fp8", "scale"} storage
    (utils/fp8.py) to the compute dtype. Inside the scanned block stack this
    means only ONE block's bf16 weights are ever materialized at a time — the
    fp8 copy is the only HBM-resident one, which is what fits the 14B DiT on
    a 16 GB chip (reference fallback: sequential CPU offload,
    `inference.py:306-321`)."""
    k = p["kernel"]
    if isinstance(k, dict):  # fp8 leaf
        dtype = dtype or jnp.bfloat16
        return (k["fp8"].astype(jnp.float32) * k["scale"]).astype(dtype)
    return k.astype(dtype) if dtype is not None else k


def _kernel_dtype(p):
    """Compute dtype implied by a weight leaf WITHOUT materializing it:
    fp8-stored {"fp8","scale"} leaves compute in bfloat16 (`_kernel`'s
    dequant target), plain arrays in their own dtype. Use this instead of
    `p["kernel"].dtype` — that eager read crashes on fp8 dicts."""
    k = p["kernel"]
    return jnp.bfloat16 if isinstance(k, dict) else k.dtype


def _linear(x, p, dtype=None):
    k = _kernel(p, dtype)
    dtype = dtype or k.dtype
    y = jnp.dot(x.astype(dtype), k.astype(dtype))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# ------------------------------------------------------------------------ init

def _init_linear(key, din, dout, dtype, bias=True, scale=None):
    kk, _ = jax.random.split(key)
    if scale is None:
        scale = 1.0 / math.sqrt(din)
    p = {"kernel": (jax.random.uniform(kk, (din, dout), jnp.float32,
                                       -scale, scale)).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def init_block_params(key, cfg: WanDiTConfig, dtype=jnp.float32) -> Params:
    d, f = cfg.dim, cfg.ffn_dim
    ks = jax.random.split(key, 12)
    attn = lambda k0: {
        "q": _init_linear(ks[k0], d, d, dtype),
        "k": _init_linear(ks[k0 + 1], d, d, dtype),
        "v": _init_linear(ks[k0 + 2], d, d, dtype),
        "o": _init_linear(ks[k0 + 3], d, d, dtype),
        "norm_q": {"weight": jnp.ones((d,), dtype)},
        "norm_k": {"weight": jnp.ones((d,), dtype)},
    }
    p = {
        "self_attn": attn(0),
        "cross_attn": attn(4),
        "ffn": {
            "fc1": _init_linear(ks[8], d, f, dtype),
            "fc2": _init_linear(ks[9], f, d, dtype),
        },
        "modulation": (jax.random.normal(ks[10], (6, d)) / d ** 0.5
                       ).astype(jnp.float32),
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {"scale": jnp.ones((d,), dtype),
                      "bias": jnp.zeros((d,), dtype)}
    if cfg.model_type == "i2v":
        # image K/V branch of the i2v cross attention
        # (`wan_transformer3d.py:339-393`)
        ks2 = jax.random.split(key, 2)
        p["cross_attn"]["k_img"] = _init_linear(ks2[0], d, d, dtype)
        p["cross_attn"]["v_img"] = _init_linear(ks2[1], d, d, dtype)
        p["cross_attn"]["norm_k_img"] = {"weight": jnp.ones((d,), dtype)}
    return p


def init_wan_dit(key, cfg: WanDiTConfig, dtype=jnp.float32) -> Params:
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    ks = jax.random.split(key, 8)
    params: Params = {
        "patch_embed": _init_linear(ks[0], cfg.in_dim * pt * ph * pw, d, dtype),
        "text_mlp": {
            "fc1": _init_linear(ks[1], cfg.text_dim, d, dtype),
            "fc2": _init_linear(ks[2], d, d, dtype),
        },
        "time_mlp": {
            "fc1": _init_linear(ks[3], cfg.freq_dim, d, jnp.float32),
            "fc2": _init_linear(ks[4], d, d, jnp.float32),
        },
        "time_proj": {"fc": _init_linear(ks[5], d, 6 * d, jnp.float32)},
        "head": {
            "fc": _init_linear(ks[6], d, pt * ph * pw * cfg.out_dim, dtype),
            "modulation": (jax.random.normal(ks[7], (2, d)) / d ** 0.5
                           ).astype(jnp.float32),
        },
    }
    if cfg.model_type == "i2v":
        # MLPProj for CLIP features (`wan_transformer3d.py:551-563`):
        # LN(1280) -> Linear(1280,1280) -> GELU -> Linear(1280,dim) -> LN(dim)
        kk = jax.random.split(key, 2)
        params["img_emb"] = {
            "ln1": {"scale": jnp.ones((1280,), dtype),
                    "bias": jnp.zeros((1280,), dtype)},
            "fc1": _init_linear(kk[0], 1280, 1280, dtype),
            "fc2": _init_linear(kk[1], 1280, d, dtype),
            "ln2": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
        }
    bkeys = jax.random.split(key, cfg.num_layers)
    blocks = [init_block_params(bk, cfg, dtype) for bk in bkeys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


# ----------------------------------------------------------------- block apply

def _attn_qkv(x_in, p, num_heads, eps, kv_in=None, rope_cs=None,
              kv_mask=None, backend=None, rope_dtype=None):
    """Shared self/cross attention body. x_in is the (modulated) fp32 stream;
    matmuls run in param dtype."""
    B, L, D = x_in.shape
    N = num_heads
    hd = D // N
    kv_in = x_in if kv_in is None else kv_in
    q = _rms_norm(_linear(x_in, p["q"]), p["norm_q"]["weight"], eps)
    k = _rms_norm(_linear(kv_in, p["k"]), p["norm_k"]["weight"], eps)
    v = _linear(kv_in, p["v"])
    q = q.reshape(B, L, N, hd)
    k = k.reshape(B, k.shape[1], N, hd)
    v = v.reshape(B, v.shape[1], N, hd)
    if rope_cs is not None:
        cos, sin = rope_cs
        q = rope_lib.apply_rope(q, cos, sin, compute_dtype=rope_dtype)
        k = rope_lib.apply_rope(k, cos, sin, compute_dtype=rope_dtype)
    out = attention(q, k, v, mask=kv_mask, backend=backend)
    out = out.reshape(B, L, D)
    return _linear(out, p["o"])


def _i2v_cross_attn(x_in, p, num_heads, eps, ctx_img, ctx_txt, txt_mask,
                    backend):
    """Dual-stream i2v cross attention: shared q, separate image/text K/V,
    summed before the output projection (`wan_transformer3d.py:354-393`)."""
    B, L, D = x_in.shape
    N, hd = num_heads, D // num_heads
    q = _rms_norm(_linear(x_in, p["q"]), p["norm_q"]["weight"], eps)
    q = q.reshape(B, L, N, hd)

    def kv(ctx, kname, vname, knorm):
        k = _linear(ctx, p[kname])
        if knorm is not None:
            k = _rms_norm(k, p[knorm]["weight"], eps)
        v = _linear(ctx, p[vname])
        return (k.reshape(B, -1, N, hd), v.reshape(B, -1, N, hd))

    k_t, v_t = kv(ctx_txt, "k", "v", "norm_k")
    k_i, v_i = kv(ctx_img, "k_img", "v_img", "norm_k_img")
    out_t = attention(q, k_t, v_t, mask=txt_mask, backend=backend)
    out_i = attention(q, k_i, v_i, backend=backend)
    out = (out_t + out_i).reshape(B, L, D)
    return _linear(out, p["o"])


def _remat_wrap(block_fn, remat_blocks):
    """Selective activation checkpointing for the scanned block stack.

    ``remat_blocks`` is False (no remat), True (full remat — recompute
    everything in the backward), a `jax.checkpoint_policies` attribute name
    (e.g. ``"dots_with_no_batch_dims_saveable"``), or
    ``"save_names:attn_out,xattn_out"`` to save only the tagged attention
    outputs (`wan_block_apply` names them via `checkpoint_name`) — the
    trade-memory-for-recompute dial `scripts/probe_train_step.py
    --remat-policy` sweeps on the real chip."""
    if not remat_blocks:
        return block_fn
    policy = None
    if isinstance(remat_blocks, str):
        if remat_blocks.startswith("save_names:"):
            names = remat_blocks.split(":", 1)[1].split(",")
            policy = jax.checkpoint_policies.save_only_these_names(*names)
        else:
            policy = getattr(jax.checkpoint_policies, remat_blocks, None)
            if policy is None:
                raise ValueError(
                    f"unknown remat policy {remat_blocks!r}; use a "
                    "jax.checkpoint_policies name or 'save_names:<n1,n2>'")
    return jax.checkpoint(block_fn, policy=policy)


def wan_block_apply(p: Params, cfg: WanDiTConfig, x, e0, context,
                    rope_cs, seq_mask=None, context_mask=None,
                    attn_backend=None):
    """One WanAttentionBlock (`wan_transformer3d.py:464-515`).

    x: [B, L, D] fp32 residual stream; e0: [B, 6, D] (or [B, L, 6, D] for
    per-token timesteps) fp32 AdaLN params; context: [B, Lt, D] text stream
    (param dtype).
    """
    eps = cfg.eps
    if e0.ndim == 4:  # per-token modulation (`wan_transformer3d.py:488-490`)
        e = p["modulation"][None, None].astype(jnp.float32) + e0
        e_ = [e[:, :, i] for i in range(6)]           # each [B, L, D]
    else:
        e = (p["modulation"][None].astype(jnp.float32) + e0)  # [B, 6, D]
        e_ = [e[:, i][:, None, :] for i in range(6)]  # each [B, 1, D]

    sdt = x.dtype  # residual-stream storage dtype (cfg.stream_dtype)

    # self-attention with AdaLN-zero gates
    tx = _layer_norm(x, eps) * (1.0 + e_[1]) + e_[0]
    y = _attn_qkv(tx.astype(context.dtype), p["self_attn"], cfg.num_heads, eps,
                  rope_cs=rope_cs, kv_mask=seq_mask, backend=attn_backend,
                  rope_dtype=jnp.dtype(cfg.rope_dtype))
    if cfg.remat_tag_names:   # only for 'save_names:' remat policies —
        # the name primitive would otherwise churn every traced graph
        y = _checkpoint_name(y, "attn_out")
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e_[2]).astype(sdt)

    # cross-attention (t2v: plain text K/V — `wan_transformer3d.py:308-336`;
    # i2v additionally attends q against the first 257 image tokens through a
    # separate K/V branch and sums before the output proj — `:339-393`).
    # A callable backend is the sequence-parallel *self*-attention; cross-attn
    # KV is tiny (512 text tokens) and runs fully sharded with no collectives.
    xattn_backend = None if callable(attn_backend) else attn_backend
    if cfg.cross_attn_norm:
        nx = _layer_norm(x, eps, p["norm3"]["scale"], p["norm3"]["bias"])
    else:
        nx = x
    nxc = nx.astype(context.dtype)
    if "k_img" in p["cross_attn"]:
        ctx_img, ctx_txt = context[:, :257], context[:, 257:]
        y = _i2v_cross_attn(nxc, p["cross_attn"], cfg.num_heads, eps,
                            ctx_img, ctx_txt, context_mask, xattn_backend)
    else:
        y = _attn_qkv(nxc, p["cross_attn"], cfg.num_heads,
                      eps, kv_in=context, kv_mask=context_mask,
                      backend=xattn_backend)
    if cfg.remat_tag_names:
        y = _checkpoint_name(y, "xattn_out")
    x = (x.astype(jnp.float32) + y.astype(jnp.float32)).astype(sdt)

    # gated FFN (optionally in sequential token chunks — bounds the
    # [L, ffn_dim] intermediate to 1/N, exact same math; see
    # configs.WanDiTConfig.ffn_chunks)
    tx = _layer_norm(x, eps) * (1.0 + e_[4]) + e_[3]
    txc = tx.astype(context.dtype)
    nch = getattr(cfg, "ffn_chunks", 1)
    if nch > 1 and txc.shape[1] % nch != 0:
        # honor the configured memory bound as closely as possible: fall to
        # the largest divisor of L (never silently to 1 — the full
        # [L, ffn_dim] intermediate is exactly what the caller excluded)
        eff = max(k for k in range(1, nch + 1) if txc.shape[1] % k == 0)
        import warnings
        warnings.warn(
            f"ffn_chunks={nch} does not divide the token count "
            f"{txc.shape[1]}; using {eff} chunks (consider "
            f"token_pad_multiple to keep the configured bound)",
            stacklevel=2)
        nch = eff
    if nch > 1 and txc.shape[1] % nch == 0:
        B, L, D = txc.shape

        def _ffn_chunk(seg):
            hh = _gelu_tanh(_linear(seg, p["ffn"]["fc1"]))
            return _linear(hh, p["ffn"]["fc2"])

        segs = txc.reshape(B, nch, L // nch, D).transpose(1, 0, 2, 3)
        h = jax.lax.map(_ffn_chunk, segs)
        h = h.transpose(1, 0, 2, 3).reshape(B, L, D)
    else:
        h = _gelu_tanh(_linear(txc, p["ffn"]["fc1"]))
        h = _linear(h, p["ffn"]["fc2"])
    x = (x.astype(jnp.float32) + h.astype(jnp.float32) * e_[5]).astype(sdt)
    return x


# -------------------------------------------------------------------- patchify

def patchify(x: jax.Array, patch_size) -> Tuple[jax.Array, Tuple[int, int, int]]:
    """[B, C, F, H, W] -> ([B, L, C*pt*ph*pw], grid). Feature order (c, dt,
    dh, dw) matches the Conv3d weight layout so checkpoint kernels reshape in."""
    B, C, F, H, W = x.shape
    pt, ph, pw = patch_size
    f, h, w = F // pt, H // ph, W // pw
    x = x.reshape(B, C, f, pt, h, ph, w, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # B f h w C pt ph pw
    return x.reshape(B, f * h * w, C * pt * ph * pw), (f, h, w)


def unpatchify(x: jax.Array, grid, patch_size, out_dim: int) -> jax.Array:
    """[B, L, pt*ph*pw*c] -> [B, c, F, H, W]; feature order (dt, dh, dw, c)
    matches the reference head/unpatchify einsum (`wan_transformer3d.py:1108-1131`)."""
    B, L, _ = x.shape
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x.reshape(B, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # B c f pt h ph w pw
    return x.reshape(B, out_dim, f * pt, h * ph, w * pw)


# --------------------------------------------------------------------- forward

def wan_dit_forward(
    params: Params,
    cfg: WanDiTConfig,
    x: jax.Array,                     # [B, C, F, H, W] latents
    t: jax.Array,                     # [B] timesteps (float or int)
    context: jax.Array,               # [B, text_len, text_dim]
    rope_cos: jax.Array,              # [L, head_dim//2] or [B, L, head_dim//2]
    rope_sin: jax.Array,
    context_mask: Optional[jax.Array] = None,   # [B, text_len] bool
    attn_backend: Optional[str] = None,
    remat_blocks: bool = False,
    sp=None,
    seq_lens: Optional[jax.Array] = None,       # [B] varlen token counts
    lora=None,                  # ([L,...]-stacked adapter blocks, scale)
) -> jax.Array:
    """Velocity prediction [B, out_dim, F, H, W].

    Equivalent of `WanTransformer3DModel.forward` (`wan_transformer3d.py:818-1105`)
    minus the i2v/VACE/camera branches (separate model files) and with TeaCache
    handled a level up (`videocof_tpu.models.teacache`).
    """
    out, _ = wan_dit_forward_with_residual(
        params, cfg, x, t, context, rope_cos, rope_sin,
        context_mask=context_mask, attn_backend=attn_backend,
        remat_blocks=remat_blocks, sp=sp, seq_lens=seq_lens, lora=lora)
    return out


def wan_dit_forward_with_residual(
    params: Params,
    cfg: WanDiTConfig,
    x: jax.Array,
    t: jax.Array,
    context: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    context_mask: Optional[jax.Array] = None,
    attn_backend: Optional[str] = None,
    remat_blocks: bool = False,
    residual: Optional[jax.Array] = None,
    skip_blocks=False,  # bool (static) or jax scalar (traced, needs residual)
    clip_fea: Optional[jax.Array] = None,   # [B, 257, 1280] i2v CLIP feats
    y: Optional[jax.Array] = None,          # i2v conditioning, channel-concat
    y_camera: Optional[jax.Array] = None,   # [B, D, F, H', W'] camera feats
    sp=None,                                # parallel.SPContext or None
    seq_lens: Optional[jax.Array] = None,   # [B] per-sample valid tokens
    lora=None,                # ([L,...]-stacked adapter blocks, scale) —
                              # per-block fusion inside the scan, see below
) -> Tuple[jax.Array, jax.Array]:
    """Forward that exposes the TeaCache token-stream residual: returns
    (velocity, residual). With ``skip_blocks=True`` the block stack is
    bypassed and ``residual`` (from a previous compute step) is re-added to
    the embedded stream (`wan_transformer3d.py:981-1031`). ``skip_blocks``
    may also be a traced boolean scalar (then ``residual`` must be provided
    every call): the choice becomes an in-graph `lax.cond`, which is what
    lets a precomputed TeaCache schedule ride a single fused scan.

    Params may carry fp8 weight storage (`utils/fp8.quantize_params_fp8`):
    matmul kernels arrive as {"fp8", "scale"} dicts and are dequantized
    per-use inside the scanned block body (see `_kernel`).

    With ``sp`` (a `videocof_tpu.parallel.SPContext`) the WHOLE forward is
    sequence-parallel, mirroring the reference's token chunking after patch
    embed and all_gather after the head (`wan_transformer3d.py:949-953,
    1085-1086`): the token stream, RoPE tables, and (per-token) AdaLN params
    are sharded over the ``seq`` mesh axis via GSPMD constraints, a
    non-dividing token count is zero-padded to a multiple of the axis (with a
    key mask so padded tokens never enter a softmax), and the head output is
    gathered before unpatchify. FFN/projections/AdaLN/head all scale with the
    SP degree — not just attention."""
    pk = params["patch_embed"]["kernel"]
    compute_dtype = jnp.bfloat16 if isinstance(pk, dict) else pk.dtype

    if y is not None:  # i2v conditioning video (`wan_transformer3d.py:866-867`)
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=1)

    # patch embed -> [B, L, D]
    tokens, grid = patchify(x.astype(compute_dtype), cfg.patch_size)
    hseq = _linear(tokens, params["patch_embed"])

    if y_camera is not None:
        # camera-control features added onto the patch embeddings
        # (`wan_transformer3d.py:871-874`)
        B = hseq.shape[0]
        cam = y_camera.reshape(B, y_camera.shape[1], -1).transpose(0, 2, 1)
        hseq = hseq + cam.astype(hseq.dtype)

    # time embedding in fp32 (reference autocast island
    # `wan_transformer3d.py:912-929`). t may be [B] (one timestep per sample)
    # or [B, L] (per-token timesteps, used by the S2V/TI2V variants).
    per_token_t = t.ndim == 2
    e = sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    e = _linear(e, params["time_mlp"]["fc1"], jnp.float32)
    e = jax.nn.silu(e)
    e = _linear(e, params["time_mlp"]["fc2"], jnp.float32)   # [B,(L,)D]
    e0 = _linear(jax.nn.silu(e), params["time_proj"]["fc"], jnp.float32)
    if per_token_t:
        e0 = e0.reshape(e0.shape[0], e0.shape[1], 6, cfg.dim)  # [B, L, 6, D]
    else:
        e0 = e0.reshape(e0.shape[0], 6, cfg.dim)               # [B, 6, D]

    # text embedding MLP
    ctx = _linear(context.astype(compute_dtype), params["text_mlp"]["fc1"])
    ctx = _gelu_tanh(ctx)
    ctx = _linear(ctx, params["text_mlp"]["fc2"])                # [B, Lt, D]

    if clip_fea is not None and "img_emb" in params:
        # CLIP image tokens prepended to the text context
        # (`wan_transformer3d.py:944-946`)
        ie = params["img_emb"]
        h = _layer_norm(clip_fea, 1e-5, ie["ln1"]["scale"], ie["ln1"]["bias"])
        h = _linear(h.astype(compute_dtype), ie["fc1"])
        h = jax.nn.gelu(h, approximate=False)
        h = _linear(h, ie["fc2"])
        h = _layer_norm(h, 1e-5, ie["ln2"]["scale"], ie["ln2"]["bias"])
        ctx = jnp.concatenate([h.astype(ctx.dtype), ctx], axis=1)

    # ---- token padding + whole-forward sequence parallelism (see
    # docstring): pad tokens to a multiple of the seq axis (SP) and/or the
    # kernel tile (cfg.token_pad_multiple), shard stream/rope/per-token-
    # AdaLN, and mask padded keys out of self-attention
    L_real = hseq.shape[1]
    seq_mask = None
    pad_to = math.lcm(cfg.token_pad_multiple,
                      sp.size if (sp is not None and sp.size > 1) else 1)
    rope_lead = ((0, 0),) if rope_cos.ndim == 3 else ()  # per-sample tables
    if pad_to > 1:
        Lp = ((L_real + pad_to - 1) // pad_to) * pad_to
        if Lp != L_real:
            pad = Lp - L_real
            hseq = jnp.pad(hseq, ((0, 0), (0, pad), (0, 0)))
            # identity rotation for padded positions
            rope_cos = jnp.pad(rope_cos, rope_lead + ((0, pad), (0, 0)),
                               constant_values=1.0)
            rope_sin = jnp.pad(rope_sin, rope_lead + ((0, pad), (0, 0)))
            seq_mask = jnp.broadcast_to((jnp.arange(Lp) < L_real)[None],
                                        (hseq.shape[0], Lp))
            if per_token_t:
                # pad with the last token's AdaLN params, mirroring the
                # reference's t padding (`wan_transformer3d.py:919-923`)
                e0 = jnp.pad(e0, ((0, 0), (0, pad), (0, 0), (0, 0)),
                             mode="edge")
                e = jnp.pad(e, ((0, 0), (0, pad), (0, 0)), mode="edge")
    if seq_lens is not None:
        # varlen (ragged) batch: per-sample valid token counts — keys past
        # a sample's own length leave its softmax, mirroring the reference's
        # per-sample q_lens/k_lens varlen packing
        # (`attention_utils.py:113-146`). Padded tokens are pure
        # passengers: attention is masked, every other op is per-token, and
        # the caller slices each sample's valid region after unpatchify.
        seq_mask = (jnp.arange(hseq.shape[1])[None]
                    < jnp.asarray(seq_lens)[:, None])
    if sp is not None and sp.size > 1:
        hseq = sp.shard_tokens(hseq)
        if rope_cos.ndim == 3:  # per-sample tables shard like the stream
            rope_cos = sp.shard_tokens(rope_cos)
            rope_sin = sp.shard_tokens(rope_sin)
        else:
            rope_cos = sp.shard_rope(rope_cos)
            rope_sin = sp.shard_rope(rope_sin)
        if per_token_t:
            e0 = sp.shard_tokens(e0)
            e = sp.shard_tokens(e)

    rope_cs = (rope_cos, rope_sin)
    stream0 = hseq.astype(jnp.dtype(cfg.stream_dtype))

    def block_fn(bp, carry):
        return wan_block_apply(bp, cfg, carry, e0, ctx, rope_cs,
                               seq_mask=seq_mask,
                               context_mask=context_mask,
                               attn_backend=attn_backend)

    if lora is None and "lora__" in params:
        # runtime serving adapters attached into the param tree
        # (WanPipeline.set_runtime_lora / lora.load_runtime_lora): the
        # fp8-resident LoRA path — deltas apply per block, weights unmutated
        lora = (params["lora__"]["blocks"], params["lora__"]["scale"])
    if lora is not None:
        # per-block adapter fusion INSIDE the scan (models/lora.py
        # fuse_block_adapters): only one block's W_eff materializes at a
        # time — a full-tree apply_lora_adapters copy costs +param-size
        # HBM, which the 16 GB LoRA training config cannot afford
        from .lora import fuse_block_adapters
        ad_blocks, lora_scale = lora

        def fused_fn(xs_, carry):
            bp, ad = xs_
            return block_fn(fuse_block_adapters(bp, ad, lora_scale), carry)

        body_fn = _remat_wrap(fused_fn, remat_blocks)
        scan_xs = (params["blocks"], ad_blocks)
    else:
        body_fn = _remat_wrap(block_fn, remat_blocks)
        scan_xs = params["blocks"]

    def body(carry, xs_):
        return body_fn(xs_, carry), None

    if isinstance(skip_blocks, bool):
        if skip_blocks:
            assert residual is not None, "skip_blocks needs a cached residual"
            stream = stream0 + residual
            residual_out = residual
        else:
            stream, _ = jax.lax.scan(body, stream0, scan_xs)
            residual_out = stream - stream0
    else:
        # traced skip flag (the fused TeaCache trajectory: the skip plan is
        # data-independent, so the whole schedule rides one compiled scan
        # with a per-step cond — only the taken branch executes on TPU)
        assert residual is not None, "traced skip needs a residual operand"

        def run_blocks(_):
            stream, _ = jax.lax.scan(body, stream0, scan_xs)
            return stream, stream - stream0

        def use_cached(_):
            return stream0 + residual, residual

        stream, residual_out = jax.lax.cond(skip_blocks, use_cached,
                                            run_blocks, None)

    # head with 2-way modulation (`wan_transformer3d.py:518-548`; per-token
    # branch at `:541-543`)
    if per_token_t:
        hm = params["head"]["modulation"][None, None].astype(jnp.float32) \
            + e[:, :, None, :]
        he0, he1 = hm[:, :, 0], hm[:, :, 1]
    else:
        hm = params["head"]["modulation"][None].astype(jnp.float32) \
            + e[:, None, :]
        he0, he1 = hm[:, 0][:, None, :], hm[:, 1][:, None, :]
    out = _layer_norm(stream, cfg.eps) * (1.0 + he1) + he0
    out = _linear(out.astype(compute_dtype), params["head"]["fc"])

    if sp is not None and sp.size > 1:
        # head-exit all_gather (`wan_transformer3d.py:1085-1086`)
        out = sp.gather(out)
    if out.shape[1] != L_real:
        out = out[:, :L_real]  # drop SP/kernel-tile padding

    return unpatchify(out.astype(jnp.float32), grid, cfg.patch_size,
                      cfg.out_dim), residual_out


def make_rope_for_geometry(cfg: WanDiTConfig, grid,
                           f_src: Optional[int] = None, f_ground: int = 0,
                           temporal_table: Optional[np.ndarray] = None):
    """Host-side cos/sin tables for a latent grid (see rope.py docstring)."""
    return rope_lib.build_rope_cos_sin(
        grid, cfg.head_dim, f_src=f_src, f_ground=f_ground,
        max_pos=cfg.rope_max_pos, theta=cfg.rope_theta,
        temporal_table=temporal_table)
