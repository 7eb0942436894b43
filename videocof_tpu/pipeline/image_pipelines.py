"""Generation pipelines for the non-Wan model families.

The reference ships these families as bare model files (its only pipelines
are the Wan CoF editors — `videox_fun/pipeline/`); users drive them through
external diffusers pipelines. Here they are first-class: minimal, jitted,
TPU-native samplers that make each family usable end to end.

Text encoders are out of scope by design — CogVideoX wants T5-XXL, Flux
wants CLIP+T5, QwenImage wants Qwen2.5-VL, none of which the reference
carries either. Each pipeline takes precomputed text embeddings (the
standard serving decomposition: embed once, sample many), so the sampling
loop is a pure jitted function of arrays.

  * `CogVideoXPipeline` — t2v, DDIM (v-pred, zero-terminal-SNR, the
    CogVideoX scheduler family) with classifier-free guidance, decoded
    through `models.cogvideox_vae`.
  * `QwenImagePipeline` — t2i, flow-matching Euler with Qwen's dynamic
    mu-shift and true CFG, decoded through the Wan-VAE-based
    `models/qwenimage_vae` layout (single-frame).
  * `FluxPipeline` — t2i latents via the guidance-distilled (or CFG-free)
    flow Euler path; Flux's 2D AutoencoderKL is not part of the reference
    scope, so decoding accepts a caller-supplied ``decode_fn`` and otherwise
    returns unpacked latents.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cogvideox as cog
from ..models import cogvideox_vae as cvae
from ..models import flux as flux_lib
from ..models import qwenimage as qwen_lib
from ..schedulers import get_scheduler


def calculate_mu_shift(seq_len: int, base_seq_len: int = 256,
                       max_seq_len: int = 4096, base_shift: float = 0.5,
                       max_shift: float = 1.15) -> float:
    """Flux/Qwen dynamic timestep shifting: mu is linear in the image token
    count (diffusers `calculate_shift`)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return seq_len * m + (base_shift - m * base_seq_len)


class _SPMixin:
    """Sequence parallelism for the image/video family pipelines, matching
    the reference's per-family xfuser adapters (`dist/cogvideox_xfuser.py`,
    `flux_xfuser.py`, `qwen_xfuser.py`) with the repo's whole-forward SP:
    both joint streams token-sharded (padded per stream), Ulysses/ring
    attention over the ICI mesh."""

    attn_backend = None
    sp_ctx = None

    def enable_sequence_parallel(self, mesh=None, data: int = 1,
                                 seq: Optional[int] = None,
                                 mode: str = "ulysses") -> None:
        from ..parallel import (SPContext, make_mesh, make_ring_attention,
                                make_ulysses_attention)
        if mesh is None:
            mesh = make_mesh(data=data,
                             seq=seq or max(1, len(jax.devices()) // data))
        maker = {"ulysses": make_ulysses_attention,
                 "ring": make_ring_attention}[mode]
        self.attn_backend = maker(mesh)
        self.sp_ctx = SPContext(mesh)
        self._jit_cache.clear()

    def disable_sequence_parallel(self) -> None:
        self.attn_backend = None
        self.sp_ctx = None
        self._jit_cache.clear()


# ------------------------------------------------------------------ CogVideoX

@dataclasses.dataclass
class CogVideoXPipeline(_SPMixin):
    dit_params: Any
    dit_cfg: cog.CogVideoXConfig
    vae_params: Any
    vae_cfg: cvae.CogVideoXVAEConfig
    dtype: Any = jnp.float32

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}

    @classmethod
    def from_pretrained(cls, transformer_dir: str, vae_dir: str,
                        dtype=jnp.bfloat16,
                        quantize=None) -> "CogVideoXPipeline":
        dcfg, dparams = cog.load_cogvideox(transformer_dir, dtype=dtype,
                                           quantize=quantize)
        vcfg, vparams = cvae.load_cogvideox_vae(vae_dir, dtype=dtype)
        return cls(dparams, dcfg, vparams, vcfg, dtype=dtype)

    def __call__(self, text_embeddings: jax.Array,
                 negative_embeddings: Optional[jax.Array] = None,
                 height: int = 480, width: int = 720, num_frames: int = 49,
                 num_inference_steps: int = 50, guidance_scale: float = 6.0,
                 seed: int = 0, scheduler: str = "ddim",
                 fused: bool = False) -> np.ndarray:
        """text embeddings [B, Lt, text_embed_dim] -> video [B, 3, F, H, W]
        in [0, 1]. ``fused=True`` runs the whole DDIM trajectory as ONE
        lax.scan program over the host-precomputed `plan_arrays()` (the
        repo's fused-sampler pattern; exact-equal to stepwise)."""
        cfg = self.dit_cfg
        vr = self.vae_cfg.spatial_compression_ratio
        tc = self.vae_cfg.temporal_compression_ratio
        f_lat = (num_frames - 1) // tc + 1
        h_lat, w_lat = height // vr, width // vr
        B = text_embeddings.shape[0]
        do_cfg = guidance_scale > 1.0 and negative_embeddings is not None

        sched = get_scheduler(scheduler)
        ts = sched.set_timesteps(num_inference_steps)
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (B, f_lat, cfg.in_channels, h_lat, w_lat), jnp.float32)

        def model_v(params, x, txt, neg, t, g):
            if do_cfg:
                xin = jnp.concatenate([x, x], axis=0)
                ctx = jnp.concatenate([neg, txt], axis=0)
            else:
                xin, ctx = x, txt
            tt = jnp.full((xin.shape[0],), t, jnp.float32)
            v = cog.cogvideox_forward(params, cfg, xin, ctx, tt,
                                      attn_backend=self.attn_backend,
                                      sp=self.sp_ctx)
            if do_cfg:
                vu, vc = jnp.split(v, 2, axis=0)
                v = vu + g * (vc - vu)
            return v

        neg = (negative_embeddings if negative_embeddings is not None
               else text_embeddings)
        if fused:
            if scheduler != "ddim":
                raise ValueError("fused CogVideoX trajectory needs the "
                                 "ddim plan")
            plan = sched.plan_arrays()
            key = ("cog_fused", do_cfg, latents.shape,
                   text_embeddings.shape[1], num_inference_steps)
            if key not in self._jit_cache:
                @jax.jit
                def traj(params, x0, txt, neg, g, t_arr, cx_arr, cv_arr):
                    def body(x, per_step):
                        t, cx, cv = per_step
                        v = model_v(params, x, txt, neg, t, g)
                        return (cx * x + cv * v).astype(x.dtype), None

                    x, _ = jax.lax.scan(body, x0,
                                        (t_arr, cx_arr, cv_arr))
                    return x

                self._jit_cache[key] = traj
            latents = self._jit_cache[key](
                self.dit_params, latents, text_embeddings, neg,
                float(guidance_scale),
                jnp.asarray(plan["timesteps"], jnp.float32),
                jnp.asarray(plan["c_x"], jnp.float32),
                jnp.asarray(plan["c_v"], jnp.float32))
        else:
            key = ("cog_step", do_cfg, latents.shape,
                   text_embeddings.shape[1])
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(model_v)
            step_fn = self._jit_cache[key]
            state = sched.init_state(latents)
            for i, t in enumerate(ts):
                v = step_fn(self.dit_params, latents, text_embeddings, neg,
                            float(t), float(guidance_scale))
                latents, state = sched.step(v, i, latents, state)

        # [B, F, C, h, w] -> [B, C, F, h, w]; diffusers scales z by
        # 1/scaling_factor before decode
        z = latents.transpose(0, 2, 1, 3, 4) / self.vae_cfg.scaling_factor
        video = cvae.decode(self.vae_params, self.vae_cfg,
                            z.astype(self.dtype))
        return np.asarray((video + 1.0) / 2.0, np.float32)


# ------------------------------------------------------------------ QwenImage

def _pack_latents(z: jax.Array) -> jax.Array:
    """[B, C, h, w] -> [B, (h/2)(w/2), C*4] (2x2 patch packing, diffusers
    `_pack_latents` order: features (C, 2, 2))."""
    B, C, h, w = z.shape
    z = z.reshape(B, C, h // 2, 2, w // 2, 2)
    z = z.transpose(0, 2, 4, 1, 3, 5)
    return z.reshape(B, (h // 2) * (w // 2), C * 4)


def _unpack_latents(x: jax.Array, h: int, w: int) -> jax.Array:
    B, L, F = x.shape
    C = F // 4
    x = x.reshape(B, h // 2, w // 2, C, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, h, w)


@dataclasses.dataclass
class QwenImagePipeline(_SPMixin):
    dit_params: Any
    dit_cfg: qwen_lib.QwenImageConfig
    vae_params: Any = None           # Wan-VAE-layout params (qwenimage_vae)
    vae_cfg: Any = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}

    @classmethod
    def from_pretrained(cls, transformer_dir: str,
                        vae_path: Optional[str] = None,
                        dtype=jnp.bfloat16,
                        quantize=None) -> "QwenImagePipeline":
        from ..models import qwenimage_vae, weights
        cfg, params = qwen_lib.load_qwenimage(transformer_dir, dtype=dtype,
                                              quantize=quantize)
        vparams = vcfg = None
        if vae_path:
            vcfg = qwenimage_vae.QWENIMAGE_VAE_CONFIG
            sd = weights.load_state_dict(vae_path)
            vparams = qwenimage_vae.convert_qwenimage_vae_state_dict(
                sd, vcfg, dtype=dtype)
        return cls(params, cfg, vparams, vcfg, dtype=dtype)

    def __call__(self, text_embeddings: jax.Array,
                 negative_embeddings: Optional[jax.Array] = None,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 30,
                 true_cfg_scale: float = 4.0, seed: int = 0) -> np.ndarray:
        """text embeddings [B, Lt, joint_attention_dim] -> image latents
        [B, z, h, w] (or decoded [B, 3, H, W] in [0,1] when a VAE is set)."""
        cfg = self.dit_cfg
        h_lat, w_lat = height // 8, width // 8
        L = (h_lat // 2) * (w_lat // 2)
        B, Lt = text_embeddings.shape[:2]
        Cz = cfg.in_channels // 4          # 16 for the real checkpoints
        do_cfg = true_cfg_scale > 1.0 and negative_embeddings is not None

        sched = get_scheduler("euler")
        sched.set_timesteps(num_inference_steps,
                            mu=calculate_mu_shift(L))
        z0 = jax.random.normal(jax.random.PRNGKey(seed),
                               (B, Cz, h_lat, w_lat), jnp.float32)
        latents = _pack_latents(z0)
        img_ids, txt_ids = qwen_lib.qwen_position_ids(
            (1, h_lat // 2, w_lat // 2), Lt)

        # rope ids and guidance are traced ARGUMENTS (not closure constants)
        # so a cache hit can never reuse another geometry's positions or an
        # older guidance scale
        key = ("qwen_step", do_cfg, latents.shape, Lt, h_lat, w_lat)
        if key not in self._jit_cache:
            @jax.jit
            def step_fn(params, x, txt, neg, t, g, iids, tids):
                vc = qwen_lib.qwenimage_forward(
                    params, cfg, x, txt, t, iids, tids,
                    attn_backend=self.attn_backend, sp=self.sp_ctx)
                if not do_cfg:
                    return vc
                vu = qwen_lib.qwenimage_forward(
                    params, cfg, x, neg, t, iids, tids,
                    attn_backend=self.attn_backend, sp=self.sp_ctx)
                return vu + g * (vc - vu)

            self._jit_cache[key] = step_fn
        step_fn = self._jit_cache[key]

        neg = (negative_embeddings if negative_embeddings is not None
               else text_embeddings)
        state = sched.init_state(latents)
        for i, t in enumerate(sched.timesteps):
            v = step_fn(self.dit_params, latents, text_embeddings, neg,
                        jnp.full((B,), t / 1000.0, jnp.float32),
                        jnp.float32(true_cfg_scale), img_ids, txt_ids)
            latents, state = sched.step(v, i, latents, state)

        z = _unpack_latents(latents, h_lat, w_lat)
        if self.vae_params is None:
            return np.asarray(z, np.float32)
        from ..models import wan_vae
        img = wan_vae.decode(self.vae_params, self.vae_cfg,
                             z[:, :, None].astype(self.dtype))
        return np.asarray((img[:, :, 0] + 1.0) / 2.0, np.float32)


# ----------------------------------------------------------------------- Flux

@dataclasses.dataclass
class FluxPipeline(_SPMixin):
    dit_params: Any
    dit_cfg: flux_lib.FluxConfig
    decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        self._jit_cache: Dict[Any, Any] = {}

    @classmethod
    def from_pretrained(cls, transformer_dir: str, decode_fn=None,
                        vae_path=None, dtype=jnp.bfloat16,
                        quantize=None) -> "FluxPipeline":
        cfg, params = flux_lib.load_flux(transformer_dir, dtype=dtype,
                                         quantize=quantize)
        if decode_fn is None and vae_path is not None:
            # in-repo 2D KL-VAE decoder (models/kl_vae.py): pixels without
            # diffusers' external AutoencoderKL
            from ..models import kl_vae
            vcfg, vparams = kl_vae.load_kl_vae(vae_path, dtype=dtype)
            decode_fn = kl_vae.make_decode_fn(vparams, vcfg,
                                              compute_dtype=dtype)
        return cls(params, cfg, decode_fn=decode_fn, dtype=dtype)

    def __call__(self, text_embeddings: jax.Array,
                 pooled_projections: jax.Array,
                 height: int = 1024, width: int = 1024,
                 num_inference_steps: int = 28, guidance: float = 3.5,
                 seed: int = 0) -> np.ndarray:
        """-> unpacked latents [B, C_z, h, w] (C_z = in_channels/4), or
        ``decode_fn``'s output when provided."""
        cfg = self.dit_cfg
        h_lat, w_lat = height // 8, width // 8
        L = (h_lat // 2) * (w_lat // 2)
        B, Lt = text_embeddings.shape[:2]
        Cz = cfg.in_channels // 4

        sched = get_scheduler("euler")
        sched.set_timesteps(num_inference_steps, mu=calculate_mu_shift(L))
        z0 = jax.random.normal(jax.random.PRNGKey(seed),
                               (B, Cz, h_lat, w_lat), jnp.float32)
        latents = _pack_latents(z0)
        yy, xx = np.meshgrid(np.arange(h_lat // 2), np.arange(w_lat // 2),
                             indexing="ij")
        img_ids = jnp.asarray(np.stack(
            [np.zeros_like(yy), yy, xx], axis=-1).reshape(L, 3), jnp.float32)
        txt_ids = jnp.zeros((Lt, 3), jnp.float32)
        g = (jnp.full((B,), guidance, jnp.float32)
             if cfg.guidance_embeds else None)

        # ids and guidance are traced arguments; the key carries the 2D
        # geometry because equal token counts can come from different
        # aspect ratios
        key = ("flux_step", latents.shape, Lt, h_lat, w_lat)
        if key not in self._jit_cache:
            @jax.jit
            def step_fn(params, x, txt, pooled, t, gg, iids, tids):
                return flux_lib.flux_forward(
                    params, cfg, x, txt, pooled, t, iids, tids, guidance=gg,
                    attn_backend=self.attn_backend, sp=self.sp_ctx)

            self._jit_cache[key] = step_fn
        step_fn = self._jit_cache[key]

        state = sched.init_state(latents)
        for i, t in enumerate(sched.timesteps):
            v = step_fn(self.dit_params, latents, text_embeddings,
                        pooled_projections,
                        jnp.full((B,), t / 1000.0, jnp.float32),
                        g, img_ids, txt_ids)
            latents, state = sched.step(v, i, latents, state)

        z = _unpack_latents(latents, h_lat, w_lat)
        if self.decode_fn is not None:
            return np.asarray(self.decode_fn(z), np.float32)
        return np.asarray(z, np.float32)
