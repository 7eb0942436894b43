"""Load reference (torch) modules from /root/reference as numeric oracles.

The reference depends on `diffusers` (not installed here) and optional CUDA
libraries. This module installs a minimal, faithful stub of the diffusers
surface the target files touch, registers synthetic `videox_fun.*` parent
packages (so we never execute the heavyweight package __init__ files that
drag in torchvision/every model family), and imports the real module files:

    wan_transformer3d.py   — DiT forward + CoF rope_apply oracle
    wan_vae.py             — causal VAE encode/decode oracle
    fm_solvers_unipc.py    — Flow UniPC trajectory oracle
    fm_solvers.py          — Flow DPM++ trajectory oracle

Only stub classes that merely anchor inheritance are fabricated; every
numeric path executed by the oracles is reference code verbatim, on torch
CPU. DiagonalGaussianDistribution is re-implemented faithfully (chunk into
mean/logvar along dim=1; mode()==mean) because the VAE's output contract
flows through it.
"""

from __future__ import annotations

import functools
import importlib
import inspect
import sys
import types

REF_ROOT = "/root/reference"


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def mod(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    diffusers = mod("diffusers")

    # --- configuration_utils
    cu = mod("diffusers.configuration_utils")

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            if getattr(self, "config", None) is None:
                self.config = _AttrDict()
            self.config.update(kwargs)

        def __getattr__(self, name):
            # diffusers ConfigMixin falls back to registered config values
            # for attribute access (with a deprecation warning); the Wan
            # pipeline relies on it for vae.latent_channels /
            # *_compression_ratio (`pipeline_wan.py:136,628,684`)
            if name.startswith("_") or name in ("config",):
                raise AttributeError(name)
            cfg = self.__dict__.get("config")
            if cfg is None and hasattr(type(self), "config"):
                cfg = getattr(type(self), "config")
            if cfg is not None and name in cfg:
                return cfg[name]
            raise AttributeError(name)

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            ba = sig.bind(self, *args, **kwargs)
            ba.apply_defaults()
            cfg = {k: v for k, v in ba.arguments.items() if k != "self"}
            # diffusers registers the config BEFORE running __init__ so the
            # body can read self.config.*
            self.config = _AttrDict(cfg)
            init(self, *args, **kwargs)

        return wrapped

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    cu.FrozenDict = _AttrDict

    # --- loaders
    loaders = mod("diffusers.loaders")
    sfm = mod("diffusers.loaders.single_file_model")

    class FromOriginalModelMixin:
        pass

    class PeftAdapterMixin:
        pass

    sfm.FromOriginalModelMixin = FromOriginalModelMixin
    loaders.FromOriginalModelMixin = FromOriginalModelMixin
    loaders.PeftAdapterMixin = PeftAdapterMixin

    # --- models
    mod("diffusers.models")
    mu_ = mod("diffusers.models.modeling_utils")

    class ModelMixin(nn.Module):
        config = None

        def __getattr__(self, name):
            # nn.Module.__getattr__ precedes ConfigMixin's in the MRO of
            # `class X(ModelMixin, ConfigMixin)`; chain to the config
            # fallback like real diffusers ModelMixin does
            try:
                return nn.Module.__getattr__(self, name)
            except AttributeError:
                return ConfigMixin.__getattr__(self, name)

        @property
        def dtype(self):
            try:
                return next(self.parameters()).dtype
            except StopIteration:
                return torch.float32

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    mu_.ModelMixin = ModelMixin

    # name anchors pulled in by qwenimage_vae.py's import block but never
    # exercised by its VAE compute (verified: only `get_activation` is called,
    # and only with "silu") — see /root/reference/videox_fun/models/
    # qwenimage_vae.py:37-53.
    act_mod = mod("diffusers.models.activations")

    def get_activation(name):
        return {"silu": nn.SiLU, "swish": nn.SiLU, "relu": nn.ReLU,
                "gelu": nn.GELU, "mish": nn.Mish}[name]()

    act_mod.get_activation = get_activation

    # ---- numeric components (faithful reimplementations of the diffusers
    # modules the CogVideoX / Flux / QwenImage reference files exercise; each
    # follows the published diffusers source semantics so the reference
    # wiring runs verbatim on top of them)
    import inspect as _inspect
    import math as _math

    import torch.nn.functional as F

    class RMSNorm(nn.Module):
        def __init__(self, dim, eps, elementwise_affine=True, bias=False):
            super().__init__()
            self.eps = eps
            self.weight = (nn.Parameter(torch.ones(dim))
                           if elementwise_affine else None)
            self.bias = (nn.Parameter(torch.zeros(dim))
                         if elementwise_affine and bias else None)

        def forward(self, x):
            dt = x.dtype
            var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
            x = x * torch.rsqrt(var + self.eps)
            if self.weight is not None:
                x = x * self.weight
                if self.bias is not None:
                    x = x + self.bias
            return x.to(dt)

    def get_timestep_embedding(timesteps, embedding_dim,
                               flip_sin_to_cos=False,
                               downscale_freq_shift=1.0, scale=1.0,
                               max_period=10000):
        half_dim = embedding_dim // 2
        exponent = -_math.log(max_period) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device)
        exponent = exponent / (half_dim - downscale_freq_shift)
        emb = torch.exp(exponent)
        emb = timesteps[:, None].float() * emb[None, :]
        emb = scale * emb
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if flip_sin_to_cos:
            emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
        if embedding_dim % 2 == 1:
            emb = F.pad(emb, (0, 1, 0, 0))
        return emb

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos,
                     downscale_freq_shift, scale=1):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift
            self.scale = scale

        def forward(self, timesteps):
            return get_timestep_embedding(
                timesteps, self.num_channels,
                flip_sin_to_cos=self.flip_sin_to_cos,
                downscale_freq_shift=self.downscale_freq_shift,
                scale=self.scale)

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None,
                     sample_proj_bias=True):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim,
                                      sample_proj_bias)
            self.act = get_activation(act_fn)
            self.linear_2 = nn.Linear(time_embed_dim,
                                      out_dim or time_embed_dim,
                                      sample_proj_bias)

        def forward(self, sample, condition=None):
            return self.linear_2(self.act(self.linear_1(sample)))

    class PixArtAlphaTextProjection(nn.Module):
        def __init__(self, in_features, hidden_size, out_features=None,
                     act_fn="gelu_tanh"):
            super().__init__()
            self.linear_1 = nn.Linear(in_features, hidden_size, bias=True)
            self.act_1 = (nn.GELU(approximate="tanh")
                          if act_fn == "gelu_tanh" else nn.SiLU())
            self.linear_2 = nn.Linear(hidden_size,
                                      out_features or hidden_size, bias=True)

        def forward(self, caption):
            return self.linear_2(self.act_1(self.linear_1(caption)))

    class CombinedTimestepTextProjEmbeddings(nn.Module):
        def __init__(self, embedding_dim, pooled_projection_dim):
            super().__init__()
            self.time_proj = Timesteps(256, flip_sin_to_cos=True,
                                       downscale_freq_shift=0)
            self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
            self.text_embedder = PixArtAlphaTextProjection(
                pooled_projection_dim, embedding_dim, act_fn="silu")

        def forward(self, timestep, pooled_projection):
            t = self.timestep_embedder(
                self.time_proj(timestep).to(pooled_projection.dtype))
            return t + self.text_embedder(pooled_projection)

    class CombinedTimestepGuidanceTextProjEmbeddings(nn.Module):
        def __init__(self, embedding_dim, pooled_projection_dim):
            super().__init__()
            self.time_proj = Timesteps(256, flip_sin_to_cos=True,
                                       downscale_freq_shift=0)
            self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
            self.guidance_embedder = TimestepEmbedding(256, embedding_dim)
            self.text_embedder = PixArtAlphaTextProjection(
                pooled_projection_dim, embedding_dim, act_fn="silu")

        def forward(self, timestep, guidance, pooled_projection):
            t = self.timestep_embedder(
                self.time_proj(timestep).to(pooled_projection.dtype))
            g = self.guidance_embedder(
                self.time_proj(guidance).to(pooled_projection.dtype))
            return t + g + self.text_embedder(pooled_projection)

    import numpy as _np

    def _sincos_1d_from_grid(embed_dim, pos):
        omega = _np.arange(embed_dim // 2, dtype=_np.float64)
        omega /= embed_dim / 2.0
        omega = 1.0 / 10000**omega
        out = _np.einsum("m,d->md", pos.reshape(-1), omega)
        return _np.concatenate([_np.sin(out), _np.cos(out)], axis=1)

    def get_3d_sincos_pos_embed(embed_dim, spatial_size, temporal_size,
                                spatial_interpolation_scale=1.0,
                                temporal_interpolation_scale=1.0):
        # diffusers embeddings.py: spatial_size arrives as (width, height);
        # grid = np.meshgrid(grid_w, grid_h) "here w goes first", so the
        # first spatial half embeds the *w* coordinate
        if isinstance(spatial_size, int):
            spatial_size = (spatial_size, spatial_size)
        dim_s = 3 * embed_dim // 4
        dim_t = embed_dim // 4
        grid_h = _np.arange(spatial_size[1],
                            dtype=_np.float32) / spatial_interpolation_scale
        grid_w = _np.arange(spatial_size[0],
                            dtype=_np.float32) / spatial_interpolation_scale
        grid = _np.meshgrid(grid_w, grid_h)
        grid = _np.stack(grid, axis=0)
        grid = grid.reshape([2, 1, spatial_size[1], spatial_size[0]])
        emb_w = _sincos_1d_from_grid(dim_s // 2, grid[0])
        emb_h = _sincos_1d_from_grid(dim_s // 2, grid[1])
        spatial = _np.concatenate([emb_w, emb_h], axis=1)
        grid_t = _np.arange(temporal_size,
                            dtype=_np.float32) / temporal_interpolation_scale
        temporal = _sincos_1d_from_grid(dim_t, grid_t)
        spatial = _np.repeat(spatial[_np.newaxis], temporal_size, axis=0)
        temporal = _np.repeat(temporal[:, _np.newaxis],
                              grid.shape[2] * grid.shape[3], axis=1)
        return _np.concatenate([temporal, spatial], axis=-1)

    def get_1d_rotary_pos_embed(dim, pos, theta=10000.0, use_real=False,
                                linear_factor=1.0, ntk_factor=1.0,
                                repeat_interleave_real=True,
                                freqs_dtype=torch.float32):
        if isinstance(pos, int):
            pos = torch.arange(pos)
        theta = theta * ntk_factor
        freqs = 1.0 / (theta ** (torch.arange(0, dim, 2,
                                              dtype=freqs_dtype)[: dim // 2]
                                 / dim)) / linear_factor
        freqs = torch.outer(pos.to(freqs.dtype), freqs)
        if use_real and repeat_interleave_real:
            return (freqs.cos().repeat_interleave(2, dim=1).float(),
                    freqs.sin().repeat_interleave(2, dim=1).float())
        if use_real:
            return (torch.cat([freqs.cos(), freqs.cos()], dim=-1).float(),
                    torch.cat([freqs.sin(), freqs.sin()], dim=-1).float())
        return torch.polar(torch.ones_like(freqs), freqs)

    def apply_rotary_emb(x, freqs_cis, use_real=True, use_real_unbind_dim=-1,
                         sequence_dim=2):
        cos, sin = freqs_cis
        if sequence_dim == 2:
            cos, sin = cos[None, None], sin[None, None]
        else:
            cos, sin = cos[None, :, None], sin[None, :, None]
        x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
        x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
        return (x.float() * cos + x_rot.float() * sin).to(x.dtype)

    attn_mod = mod("diffusers.models.attention")
    ap_mod = mod("diffusers.models.attention_processor")

    class GELU(nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x):
            return F.gelu(self.proj(x), approximate=self.approximate)

    class FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False,
                     inner_dim=None, bias=True):
            super().__init__()
            inner_dim = inner_dim or int(dim * mult)
            assert activation_fn == "gelu-approximate", activation_fn
            self.net = nn.ModuleList([
                GELU(dim, inner_dim, approximate="tanh", bias=bias),
                nn.Dropout(dropout),
                nn.Linear(inner_dim, dim_out or dim, bias=bias)])
            if final_dropout:
                self.net.append(nn.Dropout(dropout))

        def forward(self, x):
            for layer in self.net:
                x = layer(x)
            return x

    class Attention(nn.Module):
        """Subset of diffusers Attention covering the CogVideoX (qk
        layer_norm, self-attn) and QwenImage (rms_norm + added KV
        projections) constructor paths; forward dispatches to the processor
        with signature-filtered kwargs like diffusers does."""

        def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                     dim_head=64, dropout=0.0, bias=False, qk_norm=None,
                     added_kv_proj_dim=None, added_proj_bias=True,
                     out_bias=True, eps=1e-5, out_dim=None,
                     context_pre_only=None, pre_only=False,
                     elementwise_affine=True, processor=None, **_unused):
            super().__init__()
            self.inner_dim = (out_dim if out_dim is not None
                              else dim_head * heads)
            self.query_dim = query_dim
            self.is_cross_attention = cross_attention_dim is not None
            self.cross_attention_dim = cross_attention_dim or query_dim
            self.out_dim = out_dim if out_dim is not None else query_dim
            self.context_pre_only = context_pre_only
            self.pre_only = pre_only
            self.heads = (out_dim // dim_head if out_dim is not None
                          else heads)
            self.added_kv_proj_dim = added_kv_proj_dim
            if qk_norm is None:
                self.norm_q = self.norm_k = None
            elif qk_norm == "layer_norm":
                self.norm_q = nn.LayerNorm(dim_head, eps=eps)
                self.norm_k = nn.LayerNorm(dim_head, eps=eps)
            elif qk_norm == "rms_norm":
                self.norm_q = RMSNorm(dim_head, eps=eps)
                self.norm_k = RMSNorm(dim_head, eps=eps)
            else:
                raise ValueError(qk_norm)
            self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
            self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim,
                                  bias=bias)
            self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim,
                                  bias=bias)
            self.norm_added_q = self.norm_added_k = None
            if added_kv_proj_dim is not None:
                self.add_q_proj = nn.Linear(added_kv_proj_dim,
                                            self.inner_dim,
                                            bias=added_proj_bias)
                self.add_k_proj = nn.Linear(added_kv_proj_dim,
                                            self.inner_dim,
                                            bias=added_proj_bias)
                self.add_v_proj = nn.Linear(added_kv_proj_dim,
                                            self.inner_dim,
                                            bias=added_proj_bias)
                if qk_norm == "rms_norm":
                    self.norm_added_q = RMSNorm(dim_head, eps=eps)
                    self.norm_added_k = RMSNorm(dim_head, eps=eps)
            if not pre_only:
                self.to_out = nn.ModuleList([
                    nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
                    nn.Dropout(dropout)])
            if added_kv_proj_dim is not None and context_pre_only is False:
                self.to_add_out = nn.Linear(self.inner_dim, self.out_dim,
                                            bias=out_bias)
            self.processor = processor

        def set_processor(self, processor):
            self.processor = processor

        def get_processor(self):
            return self.processor

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **kwargs):
            params = set(_inspect.signature(
                self.processor.__call__).parameters.keys())
            kwargs = {k: v for k, v in kwargs.items() if k in params}
            return self.processor(
                self, hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask, **kwargs)

    class CogVideoXAttnProcessor2_0:
        def __call__(self, attn, hidden_states, encoder_hidden_states,
                     attention_mask=None, image_rotary_emb=None):
            text_seq_length = encoder_hidden_states.size(1)
            hidden_states = torch.cat([encoder_hidden_states, hidden_states],
                                      dim=1)
            batch_size = hidden_states.shape[0]
            query = attn.to_q(hidden_states)
            key = attn.to_k(hidden_states)
            value = attn.to_v(hidden_states)
            head_dim = key.shape[-1] // attn.heads
            query = query.view(batch_size, -1, attn.heads,
                               head_dim).transpose(1, 2)
            key = key.view(batch_size, -1, attn.heads,
                           head_dim).transpose(1, 2)
            value = value.view(batch_size, -1, attn.heads,
                               head_dim).transpose(1, 2)
            if attn.norm_q is not None:
                query = attn.norm_q(query)
            if attn.norm_k is not None:
                key = attn.norm_k(key)
            if image_rotary_emb is not None:
                query[:, :, text_seq_length:] = apply_rotary_emb(
                    query[:, :, text_seq_length:], image_rotary_emb)
                if not attn.is_cross_attention:
                    key[:, :, text_seq_length:] = apply_rotary_emb(
                        key[:, :, text_seq_length:], image_rotary_emb)
            hidden_states = F.scaled_dot_product_attention(
                query, key, value, attn_mask=attention_mask, dropout_p=0.0,
                is_causal=False)
            hidden_states = hidden_states.transpose(1, 2).reshape(
                batch_size, -1, attn.heads * head_dim)
            hidden_states = attn.to_out[0](hidden_states)
            hidden_states = attn.to_out[1](hidden_states)
            encoder_hidden_states, hidden_states = hidden_states.split(
                [text_seq_length, hidden_states.size(1) - text_seq_length],
                dim=1)
            return hidden_states, encoder_hidden_states

    class FusedCogVideoXAttnProcessor2_0:  # anchor (fuse path unused)
        pass

    attn_mod.FeedForward = FeedForward
    attn_mod.GELU = GELU
    attn_mod.Attention = Attention
    ap_mod.Attention = Attention
    ap_mod.AttentionProcessor = object  # typing alias in diffusers
    ap_mod.CogVideoXAttnProcessor2_0 = CogVideoXAttnProcessor2_0
    ap_mod.FusedCogVideoXAttnProcessor2_0 = FusedCogVideoXAttnProcessor2_0

    emb_mod = mod("diffusers.models.embeddings")
    emb_mod.TimestepEmbedding = TimestepEmbedding
    emb_mod.Timesteps = Timesteps
    emb_mod.get_timestep_embedding = get_timestep_embedding
    emb_mod.get_3d_sincos_pos_embed = get_3d_sincos_pos_embed
    emb_mod.get_1d_rotary_pos_embed = get_1d_rotary_pos_embed
    emb_mod.apply_rotary_emb = apply_rotary_emb
    emb_mod.PixArtAlphaTextProjection = PixArtAlphaTextProjection
    emb_mod.CombinedTimestepTextProjEmbeddings = \
        CombinedTimestepTextProjEmbeddings
    emb_mod.CombinedTimestepGuidanceTextProjEmbeddings = \
        CombinedTimestepGuidanceTextProjEmbeddings
    # CogVideoXPatchEmbed is imported but shadowed by the reference file's
    # own definition (`cogvideox_transformer3d.py:46`); anchor suffices.
    emb_mod.CogVideoXPatchEmbed = type("CogVideoXPatchEmbed", (nn.Module,),
                                       {})

    norm_mod = mod("diffusers.models.normalization")

    class AdaLayerNorm(nn.Module):
        def __init__(self, embedding_dim, num_embeddings=None,
                     output_dim=None, norm_elementwise_affine=False,
                     norm_eps=1e-5, chunk_dim=0):
            super().__init__()
            self.chunk_dim = chunk_dim
            output_dim = output_dim or embedding_dim * 2
            self.emb = (nn.Embedding(num_embeddings, embedding_dim)
                        if num_embeddings is not None else None)
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, output_dim)
            self.norm = nn.LayerNorm(output_dim // 2, norm_eps,
                                     norm_elementwise_affine)

        def forward(self, x, timestep=None, temb=None):
            if self.emb is not None:
                temb = self.emb(timestep)
            temb = self.linear(self.silu(temb))
            if self.chunk_dim == 1:
                shift, scale = temb.chunk(2, dim=1)
                shift, scale = shift[:, None, :], scale[:, None, :]
            else:
                scale, shift = temb.chunk(2, dim=0)
            return self.norm(x) * (1 + scale) + shift

    class CogVideoXLayerNormZero(nn.Module):
        def __init__(self, conditioning_dim, embedding_dim,
                     elementwise_affine=True, eps=1e-5, bias=True):
            super().__init__()
            self.silu = nn.SiLU()
            self.linear = nn.Linear(conditioning_dim, 6 * embedding_dim,
                                    bias=bias)
            self.norm = nn.LayerNorm(embedding_dim, eps=eps,
                                     elementwise_affine=elementwise_affine)

        def forward(self, hidden_states, encoder_hidden_states, temb):
            shift, scale, gate, enc_shift, enc_scale, enc_gate = \
                self.linear(self.silu(temb)).chunk(6, dim=1)
            hidden_states = self.norm(hidden_states) * (
                1 + scale)[:, None, :] + shift[:, None, :]
            encoder_hidden_states = self.norm(encoder_hidden_states) * (
                1 + enc_scale)[:, None, :] + enc_shift[:, None, :]
            return (hidden_states, encoder_hidden_states,
                    gate[:, None, :], enc_gate[:, None, :])

    class AdaLayerNormZero(nn.Module):
        def __init__(self, embedding_dim, num_embeddings=None,
                     norm_type="layer_norm", bias=True):
            super().__init__()
            self.emb = None
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, 6 * embedding_dim,
                                    bias=bias)
            self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                     eps=1e-6)

        def forward(self, x, timestep=None, class_labels=None,
                    hidden_dtype=None, emb=None):
            emb = self.linear(self.silu(emb))
            (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
             gate_mlp) = emb.chunk(6, dim=1)
            x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
            return x, gate_msa, shift_mlp, scale_mlp, gate_mlp

    class AdaLayerNormZeroSingle(nn.Module):
        def __init__(self, embedding_dim, norm_type="layer_norm", bias=True):
            super().__init__()
            self.silu = nn.SiLU()
            self.linear = nn.Linear(embedding_dim, 3 * embedding_dim,
                                    bias=bias)
            self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                     eps=1e-6)

        def forward(self, x, emb=None):
            emb = self.linear(self.silu(emb))
            shift_msa, scale_msa, gate_msa = emb.chunk(3, dim=1)
            x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
            return x, gate_msa

    class AdaLayerNormContinuous(nn.Module):
        def __init__(self, embedding_dim, conditioning_embedding_dim,
                     elementwise_affine=True, eps=1e-5, bias=True,
                     norm_type="layer_norm"):
            super().__init__()
            self.silu = nn.SiLU()
            self.linear = nn.Linear(conditioning_embedding_dim,
                                    embedding_dim * 2, bias=bias)
            self.norm = nn.LayerNorm(embedding_dim, eps, elementwise_affine,
                                     bias)

        def forward(self, x, conditioning_embedding):
            emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
            scale, shift = torch.chunk(emb, 2, dim=1)
            return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]

    ds_mod = mod("diffusers.models.downsampling")

    class CogVideoXDownsample3D(nn.Module):
        """Faithful diffusers downsampling.py: optional first-frame-keep
        temporal avg-pool, (0,1,0,1) spatial pad, stride-2 Conv2d/frame."""

        def __init__(self, in_channels, out_channels, kernel_size=3,
                     stride=2, padding=0, compress_time=False):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels,
                                  kernel_size=kernel_size, stride=stride,
                                  padding=padding)
            self.compress_time = compress_time

        def forward(self, x):
            if self.compress_time:
                bs, ch, frames, h, w = x.shape
                x = x.permute(0, 3, 4, 1, 2).reshape(bs * h * w, ch, frames)
                if x.shape[-1] % 2 == 1:
                    x_first, x_rest = x[..., 0], x[..., 1:]
                    if x_rest.shape[-1] > 0:
                        x_rest = F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                    x = torch.cat([x_first[..., None], x_rest], dim=-1)
                else:
                    x = F.avg_pool1d(x, kernel_size=2, stride=2)
                x = x.reshape(bs, h, w, ch, x.shape[-1]).permute(0, 3, 4, 1,
                                                                 2)
            x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
            bs, ch, frames, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(bs * frames, ch, h, w)
            x = self.conv(x)
            return x.reshape(bs, frames, x.shape[1], x.shape[2],
                             x.shape[3]).permute(0, 2, 1, 3, 4)

    ds_mod.CogVideoXDownsample3D = CogVideoXDownsample3D
    us_mod = mod("diffusers.models.upsampling")
    # the reference file defines its own CogVideoXUpsample3D (`:201`),
    # shadowing this import; anchor suffices
    us_mod.CogVideoXUpsample3D = type("CogVideoXUpsample3D", (nn.Module,),
                                      {})

    norm_mod.AdaLayerNorm = AdaLayerNorm
    norm_mod.CogVideoXLayerNormZero = CogVideoXLayerNormZero
    norm_mod.AdaLayerNormZero = AdaLayerNormZero
    norm_mod.AdaLayerNormZeroSingle = AdaLayerNormZeroSingle
    norm_mod.AdaLayerNormContinuous = AdaLayerNormContinuous
    norm_mod.RMSNorm = RMSNorm

    mod("diffusers.models.autoencoders")
    vae_mod = mod("diffusers.models.autoencoders.vae")

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.deterministic = deterministic
            self.std = torch.exp(0.5 * self.logvar)
            self.var = torch.exp(self.logvar)

        def sample(self, generator=None):
            noise = torch.randn(self.mean.shape, generator=generator,
                                dtype=self.mean.dtype)
            return self.mean + self.std * noise

        def mode(self):
            return self.mean

    class DecoderOutput:
        def __init__(self, sample, commit_loss=None):
            self.sample = sample
            self.commit_loss = commit_loss

    vae_mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    vae_mod.DecoderOutput = DecoderOutput

    lora_mod = mod("diffusers.models.lora")

    class LoRACompatibleLinear(nn.Linear):
        pass

    class LoRACompatibleConv(nn.Conv2d):
        pass

    lora_mod.LoRACompatibleLinear = LoRACompatibleLinear
    lora_mod.LoRACompatibleConv = LoRACompatibleConv

    mo = mod("diffusers.models.modeling_outputs")

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

        def __getitem__(self, i):
            # diffusers BaseOutput supports tuple-style indexing; the Wan
            # pipeline uses `vae.encode(v)[0]` (`pipeline_wan.py:406`)
            return (self.latent_dist,)[i]

    mo.AutoencoderKLOutput = AutoencoderKLOutput

    class Transformer2DModelOutput:  # anchor
        def __init__(self, sample=None):
            self.sample = sample

    mo.Transformer2DModelOutput = Transformer2DModelOutput

    # --- utils
    du = mod("diffusers.utils")

    def is_torch_version(operation, version):
        from packaging import version as v
        cur = v.parse(torch.__version__.split("+")[0])
        ref = v.parse(version)
        return {"<": cur < ref, "<=": cur <= ref, ">": cur > ref,
                ">=": cur >= ref, "==": cur == ref}[operation]

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            import logging
            return logging.getLogger(name or "diffusers")

    du.is_torch_version = is_torch_version
    du.logging = _Logging()
    du.deprecate = lambda *a, **k: None
    du.is_scipy_available = lambda: True
    du.BaseOutput = object
    du.USE_PEFT_BACKEND = False
    du.scale_lora_layers = lambda *a, **k: None
    du.unscale_lora_layers = lambda *a, **k: None

    au = mod("diffusers.utils.accelerate_utils")
    au.apply_forward_hook = lambda fn: fn
    du.accelerate_utils = au

    tu = mod("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None,
                     layout=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    tu.randn_tensor = randn_tensor
    tu.maybe_allow_in_graph = lambda cls: cls
    du.torch_utils = tu

    # --- schedulers
    mod("diffusers.schedulers")
    su = mod("diffusers.schedulers.scheduling_utils")
    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1

    class SchedulerMixin:
        config = None

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    su.SchedulerMixin = SchedulerMixin
    su.SchedulerOutput = SchedulerOutput

    # --- FlowMatchEulerDiscreteScheduler: a faithful reimplementation of the
    # published diffusers scheduler (scheduling_flow_match_euler_discrete.py)
    # for the surface the Wan pipeline exercises: the static-shift sigma grid
    # (NOTE: set_timesteps re-derives the grid from the ALREADY-shifted
    # sigma_min and shifts again — genuine diffusers behaviour the reference
    # inherits), the exponential dynamic shift under use_dynamic_shifting
    # (where the pipeline's mu=1 applies), and the first-order step.
    class FlowMatchEulerDiscreteScheduler(SchedulerMixin, ConfigMixin):
        order = 1

        @register_to_config
        def __init__(self, num_train_timesteps=1000, shift=1.0,
                     use_dynamic_shifting=False, base_shift=0.5,
                     max_shift=1.15, base_image_seq_len=256,
                     max_image_seq_len=4096):
            import numpy as np
            ts = np.linspace(1, num_train_timesteps, num_train_timesteps,
                             dtype=np.float32)[::-1].copy()
            sigmas = torch.from_numpy(ts).to(torch.float32) \
                / num_train_timesteps
            if not use_dynamic_shifting:
                sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
            self.timesteps = sigmas * num_train_timesteps
            self.sigmas = sigmas
            self.sigma_min = self.sigmas[-1].item()
            self.sigma_max = self.sigmas[0].item()
            self._step_index = None

        def scale_model_input(self, sample, timestep=None):
            return sample

        def _sigma_to_t(self, sigma):
            return sigma * self.config.num_train_timesteps

        def time_shift(self, mu, sigma, t):
            import math as m
            return m.exp(mu) / (m.exp(mu) + (1 / t - 1) ** sigma)

        def set_timesteps(self, num_inference_steps=None, device=None,
                          sigmas=None, mu=None, timesteps=None):
            import numpy as np
            if self.config.use_dynamic_shifting and mu is None:
                raise ValueError("`mu` required with use_dynamic_shifting")
            if sigmas is None:
                ts = np.linspace(self._sigma_to_t(self.sigma_max),
                                 self._sigma_to_t(self.sigma_min),
                                 num_inference_steps)
                sigmas = ts / self.config.num_train_timesteps
            if self.config.use_dynamic_shifting:
                sigmas = self.time_shift(mu, 1.0, sigmas)
            else:
                sigmas = (self.config.shift * sigmas
                          / (1 + (self.config.shift - 1) * sigmas))
            sigmas = torch.from_numpy(np.asarray(sigmas)).to(torch.float32)
            self.timesteps = sigmas * self.config.num_train_timesteps
            self.num_inference_steps = num_inference_steps
            self.sigmas = torch.cat([sigmas, torch.zeros(1)])
            self._step_index = None

        def step(self, model_output, timestep, sample, generator=None,
                 return_dict=True):
            if self._step_index is None:
                self._step_index = 0
            sample = sample.to(torch.float32)
            sigma = self.sigmas[self._step_index]
            sigma_next = self.sigmas[self._step_index + 1]
            prev_sample = sample + (sigma_next - sigma) * model_output
            prev_sample = prev_sample.to(model_output.dtype)
            self._step_index += 1
            if not return_dict:
                return (prev_sample,)
            return SchedulerOutput(prev_sample)

    diffusers.FlowMatchEulerDiscreteScheduler = FlowMatchEulerDiscreteScheduler

    # --- pipeline machinery (pipeline_wan.py's import surface)
    pipelines = mod("diffusers.pipelines")
    pu = mod("diffusers.pipelines.pipeline_utils")

    class _ProgressBar:
        def update(self, n=1):
            pass

    class DiffusionPipeline(ConfigMixin):
        def __init__(self):
            pass

        def register_modules(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)

        @property
        def _execution_device(self):
            return torch.device("cpu")

        def progress_bar(self, total=None, **kw):
            import contextlib

            @contextlib.contextmanager
            def _cm():
                yield _ProgressBar()

            return _cm()

        def maybe_free_model_hooks(self):
            pass

    pu.DiffusionPipeline = DiffusionPipeline
    pipelines.pipeline_utils = pu
    diffusers.pipelines = pipelines
    diffusers.DiffusionPipeline = DiffusionPipeline

    cb_mod = mod("diffusers.callbacks")

    class PipelineCallback:  # anchors: isinstance checks only
        pass

    class MultiPipelineCallbacks:
        pass

    cb_mod.PipelineCallback = PipelineCallback
    cb_mod.MultiPipelineCallbacks = MultiPipelineCallbacks

    vp_mod = mod("diffusers.video_processor")

    class VideoProcessor:
        def __init__(self, vae_scale_factor=8, **kw):
            self.vae_scale_factor = vae_scale_factor

    vp_mod.VideoProcessor = VideoProcessor

    du.replace_example_docstring = lambda doc: (lambda fn: fn)

    diffusers.ConfigMixin = ConfigMixin
    diffusers.ModelMixin = ModelMixin


def _install_torchvision_stub():
    """wan_image_encoder imports torchvision.transforms only for the
    (unused-in-oracle) preprocessing Compose; attribute shells suffice."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class _Shell:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _Interp:
        BICUBIC = "bicubic"

    tr.Compose = _Shell
    tr.Resize = _Shell
    tr.ToTensor = _Shell
    tr.Normalize = _Shell
    tr.InterpolationMode = _Interp
    tv.transforms = tr
    # a real-looking spec + version so transformers'
    # _is_package_available("torchvision") doesn't choke on the stub
    import importlib.machinery
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    tv.__version__ = "0.0.0-stub"
    tr.__spec__ = importlib.machinery.ModuleSpec("torchvision.transforms",
                                                 loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def _install_dataset_dep_stubs():
    """dataset_image_video.py imports decord/albumentations/func_timeout at
    module level but the oracle targets (the instruction regex, frame-index
    math, visualization helpers) never call them; attribute shells suffice."""
    class _ShellModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {"__init__": lambda self, *a, **k: None})

    for name in ("albumentations", "decord", "func_timeout"):
        if name not in sys.modules:
            m = _ShellModule(name)
            import importlib.machinery
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    ft = sys.modules["func_timeout"]
    if not hasattr(ft, "_patched"):
        class FunctionTimedOut(Exception):
            pass

        ft.FunctionTimedOut = FunctionTimedOut
        ft.func_timeout = lambda timeout, fn, args=(), kwargs=None: fn(
            *args, **(kwargs or {}))
        ft._patched = True


def _install_videox_fun_parents():
    """Synthetic `videox_fun`, `videox_fun.models`, `videox_fun.utils`,
    `videox_fun.dist` packages: real module files resolve under them, but the
    heavyweight real __init__ bodies never run."""
    if "videox_fun" in sys.modules:
        return
    pkg = types.ModuleType("videox_fun")
    pkg.__path__ = [f"{REF_ROOT}/videox_fun"]
    sys.modules["videox_fun"] = pkg

    models = types.ModuleType("videox_fun.models")
    models.__path__ = [f"{REF_ROOT}/videox_fun/models"]
    sys.modules["videox_fun.models"] = models

    utils = types.ModuleType("videox_fun.utils")
    utils.__path__ = [f"{REF_ROOT}/videox_fun/utils"]
    sys.modules["videox_fun.utils"] = utils

    # `from ..dist import ...` — only names; the SP path is never exercised
    # on the CPU oracle (sp_world_size stays 1).
    dist = types.ModuleType("videox_fun.dist")
    dist.get_sequence_parallel_rank = lambda: 0
    dist.get_sequence_parallel_world_size = lambda: 1
    dist.get_sp_group = lambda: None
    dist.usp_attn_forward = None
    dist.usp_attn_s2v_forward = None
    dist.xFuserLongContextAttention = None
    dist.FluxMultiGPUsAttnProcessor2_0 = None
    dist.QwenImageMultiGPUsAttnProcessor2_0 = None
    sys.modules["videox_fun.dist"] = dist
    cog_xfuser = types.ModuleType("videox_fun.dist.cogvideox_xfuser")
    cog_xfuser.CogVideoXMultiGPUsAttnProcessor2_0 = None
    sys.modules["videox_fun.dist.cogvideox_xfuser"] = cog_xfuser

    # `from ..utils import cfg_skip` resolves through the synthetic package:
    # load the real cfg_optimization file and re-export.
    cfg_opt = importlib.import_module("videox_fun.utils.cfg_optimization")
    utils.cfg_skip = cfg_opt.cfg_skip


@functools.lru_cache(maxsize=1)
def load_reference():
    """-> namespace with .wan_transformer3d, .wan_vae, .fm_solvers_unipc,
    .fm_solvers (reference torch modules, CPU)."""
    _install_diffusers_stub()
    _install_torchvision_stub()
    _install_videox_fun_parents()
    ns = types.SimpleNamespace()
    ns.wan_transformer3d = importlib.import_module(
        "videox_fun.models.wan_transformer3d")
    ns.wan_vae = importlib.import_module("videox_fun.models.wan_vae")
    ns.fm_solvers_unipc = importlib.import_module(
        "videox_fun.utils.fm_solvers_unipc")
    ns.fm_solvers = importlib.import_module("videox_fun.utils.fm_solvers")
    ns.wan_xlm_roberta = importlib.import_module(
        "videox_fun.models.wan_xlm_roberta")
    ns.wan_image_encoder = importlib.import_module(
        "videox_fun.models.wan_image_encoder")
    ns.wan_vae3_8 = importlib.import_module("videox_fun.models.wan_vae3_8")
    ns.wan_text_encoder = importlib.import_module(
        "videox_fun.models.wan_text_encoder")
    ns.wan_transformer3d_vace = importlib.import_module(
        "videox_fun.models.wan_transformer3d_vace")
    ns.lora_utils = importlib.import_module("videox_fun.utils.lora_utils")
    # utils.utils: i2v/v2v conditioning builders + misc helpers (imageio and
    # PIL are real on this box; torchvision is the stub above)
    ns.utils = importlib.import_module("videox_fun.utils.utils")
    # wan_transformer3d_s2v imports wan_audio_injector, which is ABSENT from
    # the reference snapshot (dangling import). Name shells let the module
    # import; the oracle only exercises the first-party block/rope math.
    if "videox_fun.models.wan_audio_injector" not in sys.modules:
        aud = types.ModuleType("videox_fun.models.wan_audio_injector")
        for name in ("AudioInjector_WAN", "CausalAudioEncoder",
                     "FramePackMotioner", "MotionerTransformers"):
            setattr(aud, name, type(name, (), {}))
        aud.rope_precompute = None
        sys.modules["videox_fun.models.wan_audio_injector"] = aud
    ns.wan_transformer3d_s2v = importlib.import_module(
        "videox_fun.models.wan_transformer3d_s2v")
    # QwenImage VAE: self-contained torch math (only `get_activation("silu")`
    # comes from diffusers; the rest of its import block is name anchors).
    ns.qwenimage_vae = importlib.import_module(
        "videox_fun.models.qwenimage_vae")
    # image-gen transformer families: their diffusers components
    # (Attention/FeedForward/norm/embedding classes) are faithful numeric
    # reimplementations above; all wiring is reference code verbatim.
    ns.cogvideox_transformer3d = importlib.import_module(
        "videox_fun.models.cogvideox_transformer3d")
    ns.cogvideox_vae = importlib.import_module(
        "videox_fun.models.cogvideox_vae")
    ns.flux_transformer2d = importlib.import_module(
        "videox_fun.models.flux_transformer2d")
    ns.qwenimage_transformer2d = importlib.import_module(
        "videox_fun.models.qwenimage_transformer2d")
    _install_dataset_dep_stubs()
    data_pkg = types.ModuleType("videox_fun.data")
    data_pkg.__path__ = [f"{REF_ROOT}/videox_fun/data"]
    sys.modules.setdefault("videox_fun.data", data_pkg)
    ns.dataset_image_video = importlib.import_module(
        "videox_fun.data.dataset_image_video")
    # the real pipeline file imports `from ..models import (AutoencoderKLWan,
    # AutoTokenizer, WanT5EncoderModel, WanTransformer3DModel)` — resolve
    # those names on the synthetic package from the already-loaded real
    # modules (AutoTokenizer is a name anchor; tests inject instances)
    models_pkg = sys.modules["videox_fun.models"]
    models_pkg.AutoencoderKLWan = ns.wan_vae.AutoencoderKLWan
    models_pkg.WanT5EncoderModel = ns.wan_text_encoder.WanT5EncoderModel
    models_pkg.WanTransformer3DModel = \
        ns.wan_transformer3d.WanTransformer3DModel
    models_pkg.AutoTokenizer = object
    pipeline_pkg = types.ModuleType("videox_fun.pipeline")
    pipeline_pkg.__path__ = [f"{REF_ROOT}/videox_fun/pipeline"]
    sys.modules.setdefault("videox_fun.pipeline", pipeline_pkg)
    ns.pipeline_wan = importlib.import_module(
        "videox_fun.pipeline.pipeline_wan")
    # the Wan2.2 t2v pipeline imports the MoE transformer class by name
    models_pkg.Wan2_2Transformer3DModel = \
        ns.wan_transformer3d.Wan2_2Transformer3DModel
    ns.pipeline_wan2_2 = importlib.import_module(
        "videox_fun.pipeline.pipeline_wan2_2")
    return ns
