"""Speech-to-video pipeline — the consumer for the S2V transformer.

The reference's own S2V path is broken in the snapshot
(`videox_fun/models/wan_transformer3d_s2v.py` imports `wan_audio_injector`,
which is absent), so this surface goes beyond it: text prompt + per-frame
audio features -> video. Audio arrives as precomputed feature vectors
aligned to latent frames (e.g. pooled wav2vec activations, the reference's
`audio_dim=5120` input contract at `wan_transformer3d_s2v.py:190`); the
reconstructed causal audio encoder (`models/wan_dit_s2v.py:97-112`)
projects them to per-frame audio tokens that the per-layer injectors
cross-attend to.

The trajectory is the standard t2v loop with `wan_s2v_forward` as the
velocity model: one token segment (seg_ids = 0, segment AdaLN reduces to
the plain modulation), per-sample RoPE tables broadcast from the shared
grid, CFG doubling carries the audio features alongside the latents so
both guidance branches hear the same audio.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import rope as rope_mod
from ..models import wan_dit_s2v
from .wan_pipeline import WanPipeline, WanPipelineOutput, latent_frame_count


class S2VPipeline(WanPipeline):
    """`WanPipeline` + audio injection (`models/wan_dit_s2v.py`)."""

    def __init__(self, *args, s2v_params=None,
                 inject_layers: Sequence[int] = (0,),
                 num_audio_token: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        if s2v_params is None:
            raise ValueError("S2VPipeline needs s2v_params "
                             "(wan_dit_s2v.init_s2v_params)")
        self.s2v_params = s2v_params
        self.inject_layers = tuple(int(i) for i in inject_layers)
        self.num_audio_token = num_audio_token

    def _s2v_step_fn(self, do_cfg: bool, guidance_scale: float):
        key = ("s2v_step", do_cfg, float(guidance_scale),
               self._backend_for(do_cfg))
        if key in self._jit_cache:
            return self._jit_cache[key]

        dit_cfg = self.dit_cfg
        inject = self.inject_layers
        nat = self.num_audio_token
        backend = self._backend_for(do_cfg)

        @jax.jit
        def step(base_params, s2v_params, latents, audio, t_scalar,
                 context, rope_cos, rope_sin, seg_ids):
            if do_cfg:
                x = jnp.concatenate([latents, latents], axis=0)
                au = (None if audio is None
                      else jnp.concatenate([audio, audio], axis=0))
                ctx = context
            else:
                x, au, ctx = latents, audio, context
            B = x.shape[0]
            t = jnp.full((B,), t_scalar, jnp.float32)
            cos = jnp.broadcast_to(rope_cos[None],
                                   (B,) + rope_cos.shape)
            sin = jnp.broadcast_to(rope_sin[None],
                                   (B,) + rope_sin.shape)
            v = wan_dit_s2v.wan_s2v_forward(
                base_params, s2v_params, dit_cfg, x.astype(self.dtype), t,
                ctx, cos, sin, seg_ids, audio_feats=au,
                inject_layers=inject, num_audio_token=nat,
                attn_backend=backend)
            if do_cfg:
                vu, vc = jnp.split(v, 2, axis=0)
                v = vu + guidance_scale * (vc - vu)
            return v

        self._jit_cache[key] = step
        return step

    def speech_to_video(
        self,
        prompt: Union[str, Sequence[str]],
        audio_feats,                     # [B, T_latent, audio_dim] or None
        *,
        negative_prompt: str = "",
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        shift: float = 5.0,
        sampler: str = "unipc",
        seed: int = 0,
        max_sequence_length: int = 512,
        noise: Optional[jax.Array] = None,
        solver_order: Optional[int] = None,
        output_latents: bool = False,
    ) -> WanPipelineOutput:
        """Text + per-latent-frame audio features -> video."""
        from ..schedulers import get_scheduler

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        do_cfg = guidance_scale > 1.0

        embeds = self.encode_prompt(prompts, max_sequence_length)
        if do_cfg:
            neg = self.encode_prompt([negative_prompt] * B,
                                     max_sequence_length)
            context = jnp.concatenate([neg, embeds], axis=0)
        else:
            context = embeds
        context = context.astype(self.dtype)

        tc = self.vae_cfg.temporal_compression_ratio
        sc = self.vae_cfg.spatial_compression_ratio
        Tl = latent_frame_count(num_frames, tc)
        Hl, Wl = height // sc, width // sc
        if noise is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (B, self.vae_cfg.z_dim, Tl, Hl, Wl), jnp.float32)
        else:
            latents = jnp.asarray(noise, jnp.float32)

        audio = None
        if audio_feats is not None:
            audio = jnp.asarray(audio_feats)
            if audio.shape[1] != Tl:
                raise ValueError(
                    f"audio_feats must align to {Tl} latent frames, "
                    f"got {audio.shape[1]}")

        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)
        rope_key = ("s2v", grid)
        if rope_key not in self._rope_cache:
            cos, sin = rope_mod.build_rope_cos_sin(grid,
                                                   self.dit_cfg.head_dim)
            self._rope_cache[rope_key] = (jnp.asarray(cos),
                                          jnp.asarray(sin))
        cos, sin = self._rope_cache[rope_key]
        L = grid[0] * grid[1] * grid[2]
        seg_ids = jnp.zeros((L,), jnp.int32)

        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)

        step = self._s2v_step_fn(do_cfg, guidance_scale)
        state = sched.init_state(latents)
        sk = ("sched", sampler, num_inference_steps, float(shift),
              solver_order)
        if sk not in self._jit_cache:
            self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
        sstep = self._jit_cache[sk]
        for i in range(num_inference_steps):
            v = step(self.dit_params, self.s2v_params, latents, audio,
                     float(sched.timesteps[i]), context, cos, sin, seg_ids)
            latents, state = sstep(v, i, latents, state)

        video = self.decode_to_numpy01(latents)
        out = WanPipelineOutput(videos=video, edit_videos=video)
        if output_latents:
            out.latents = np.asarray(latents)
        return out
