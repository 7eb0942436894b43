"""VACE control-to-video pipeline — the consumer for the VACE control branch.

The reference snapshot ships the transformer (`videox_fun/models/
wan_transformer3d_vace.py`) but NO pipeline for it (its UI import is
dangling), so this surface goes beyond the snapshot. The context layout
follows the published VACE design that the reference transformer expects
(``vace_in_dim = 96`` in real checkpoints = 16 inactive-latent + 16
reactive-latent + 64 mask channels; the transformer itself only requires a
``[B, C_vace, F', H', W']`` tensor — `wan_transformer3d_vace.py:150-156`):

* ``inactive = frames * (1 - mask)`` and ``reactive = frames * mask`` are
  VAE-encoded separately (16 latent channels each),
* the binary mask is spatially patchified sc x sc into sc^2 channels and
  nearest-resampled to the latent frame count.

Full generation under control (depth/pose/scribble maps) is ``mask = 1``
everywhere: inactive encodes black frames, reactive encodes the control
map. Inpainting passes the region mask.

Denoise runs the standard t2v trajectory (no CoF segments, no source
freeze) with `wan_dit_vace.vace_forward` as the velocity model; CFG doubles
the control context alongside the latents. Steps are jitted individually —
the control chain adds ~1.5x the block FLOPs of a base step, and the
existing fused-scan machinery is specialized to the plain Wan forward, so a
stepwise loop keeps each dispatched program inside the remote worker's
program-length window at every geometry.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wan_dit, wan_dit_vace
from .wan_pipeline import WanPipeline, WanPipelineOutput, latent_frame_count


def patchify_mask(mask: jax.Array, sc: int, t_latent: int) -> jax.Array:
    """[B, 1, F, H, W] binary mask -> [B, sc*sc, T_latent, H/sc, W/sc].

    Spatial sc x sc blocks become channels; the frame axis is resampled to
    the latent frame count with nearest-exact indices (the VACE mask
    encoding the reference transformer's 96-channel input expects)."""
    B, _, F, H, W = mask.shape
    m = mask.reshape(B, F, H // sc, sc, W // sc, sc)
    m = m.transpose(0, 3, 5, 1, 2, 4).reshape(B, sc * sc, F,
                                              H // sc, W // sc)
    idx = np.clip(
        np.round((np.arange(t_latent) + 0.5) * (F / t_latent) - 0.5),
        0, F - 1).astype(np.int32)
    return m[:, :, idx]


class VacePipeline(WanPipeline):
    """`WanPipeline` + the VACE hint branch (`models/wan_dit_vace.py`)."""

    def __init__(self, *args, vace_params=None, vace_stride: int = 2,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if vace_params is None:
            raise ValueError("VacePipeline needs vace_params "
                             "(init_vace_params / convert_vace_state_dict)")
        self.vace_params = vace_params
        self.vace_stride = vace_stride

    # ------------------------------------------------------------- context
    def prepare_vace_context(self, control_video, mask=None) -> jax.Array:
        """Build the [B, 2*z + sc^2, T', H', W'] control context.

        ``control_video``: [B, 3, F, H, W] float in [-1, 1] or uint8.
        ``mask``: [B, 1, F, H, W] in {0, 1}, 1 = region to generate;
        defaults to all-ones (full generation under control)."""
        video = jnp.asarray(control_video)
        if video.dtype == jnp.uint8:
            video = video.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        B, _, F, H, W = video.shape
        sc = self.vae_cfg.spatial_compression_ratio
        tcr = self.vae_cfg.temporal_compression_ratio
        t_latent = latent_frame_count(F, tcr)
        if mask is None:
            mask = jnp.ones((B, 1, F, H, W), jnp.float32)
        else:
            mask = jnp.asarray(mask, jnp.float32)
        inactive = self.vae_encode(video * (1.0 - mask))
        reactive = self.vae_encode(video * mask)
        mask_ch = patchify_mask(mask, sc, t_latent)
        return jnp.concatenate(
            [inactive.astype(jnp.float32), reactive.astype(jnp.float32),
             mask_ch], axis=1)

    # ---------------------------------------------------------------- step
    def _vace_step_fn(self, do_cfg: bool, guidance_scale: float,
                      context_scale: float):
        key = ("vace_step", do_cfg, float(guidance_scale),
               float(context_scale), self._backend_for(do_cfg))
        if key in self._jit_cache:
            return self._jit_cache[key]

        dit_cfg = self.dit_cfg
        stride = self.vace_stride
        backend = self._backend_for(do_cfg)

        @jax.jit
        def step(base_params, vace_params, latents, vctx, t_scalar,
                 context, rope_cos, rope_sin):
            if do_cfg:
                x = jnp.concatenate([latents, latents], axis=0)
                vc = jnp.concatenate([vctx, vctx], axis=0)
                ctx = context  # [2B] uncond first
            else:
                x, vc, ctx = latents, vctx, context
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            v = wan_dit_vace.vace_forward(
                base_params, vace_params, dit_cfg, x.astype(self.dtype),
                vc.astype(self.dtype), t, ctx, rope_cos, rope_sin,
                context_scale=context_scale, stride=stride,
                attn_backend=backend)
            if do_cfg:
                vu, vcnd = jnp.split(v, 2, axis=0)
                v = vu + guidance_scale * (vcnd - vu)
            return v

        self._jit_cache[key] = step
        return step

    # ---------------------------------------------------------------- call
    def control_to_video(
        self,
        prompt: Union[str, Sequence[str]],
        control_video,
        *,
        mask=None,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        context_scale: float = 1.0,
        shift: float = 5.0,
        sampler: str = "unipc",
        seed: int = 0,
        max_sequence_length: int = 512,
        noise: Optional[jax.Array] = None,
        solver_order: Optional[int] = None,
        output_latents: bool = False,
    ) -> WanPipelineOutput:
        """Text + control video (+ optional region mask) -> video."""
        from ..schedulers import get_scheduler

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        video = self._prepare_video(control_video, prompts)
        B, _, F = video.shape[:3]
        do_cfg = guidance_scale > 1.0

        embeds = self.encode_prompt(prompts, max_sequence_length)
        if do_cfg:
            neg = self.encode_prompt([negative_prompt] * B,
                                     max_sequence_length)
            context = jnp.concatenate([neg, embeds], axis=0)
        else:
            context = embeds
        context = context.astype(self.dtype)

        vctx = self.prepare_vace_context(video, mask)
        Tl, Hl, Wl = vctx.shape[2:]
        if noise is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (B, self.vae_cfg.z_dim, Tl, Hl, Wl), jnp.float32)
        else:
            latents = jnp.asarray(noise, jnp.float32)

        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)
        rope_key = (grid, None, 0, None, None, None)
        if rope_key not in self._rope_cache:
            cos, sin = wan_dit.make_rope_for_geometry(self.dit_cfg, grid)
            self._rope_cache[rope_key] = (jnp.asarray(cos), jnp.asarray(sin))
        cos, sin = self._rope_cache[rope_key]

        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)

        step = self._vace_step_fn(do_cfg, guidance_scale, context_scale)
        state = sched.init_state(latents)
        sk = ("sched", sampler, num_inference_steps, float(shift),
              solver_order)
        if sk not in self._jit_cache:
            self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
        sstep = self._jit_cache[sk]
        for i in range(num_inference_steps):
            v = step(self.dit_params, self.vace_params, latents, vctx,
                     float(sched.timesteps[i]), context, cos, sin)
            latents, state = sstep(v, i, latents, state)

        out_video = self.decode_to_numpy01(latents)
        out = WanPipelineOutput(videos=out_video, edit_videos=out_video)
        if output_latents:
            out.latents = np.asarray(latents)
        return out
