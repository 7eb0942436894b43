"""Camera-controlled text-to-video — the consumer for the camera adapter.

The reference wires a ``control_adapter`` (`SimpleAdapter`,
`wan_camera_adapter.py`) into the DiT patch embeddings
(`wan_transformer3d.py:871-874`) but ships no pipeline that feeds it (its
Fun-Control UI is dead code in the snapshot). This surface completes the
path: RealEstate10K-style pose rows -> Plücker-ray maps
(`data/camera.py`, oracle-matched against the reference's CameraCtrl
helpers) -> temporal packing to latent-frame-aligned 24-channel maps ->
`camera_adapter_forward` -> ``y_camera`` through the standard t2v denoise.

Temporal packing mirrors the Fun-Control convention the 24-channel adapter
input implies (6 Plücker channels x the VAE's 4x temporal compression):
frame 0 is repeated 4x, then every 4 consecutive frames fold into the
channel axis, giving one 24-channel map per LATENT frame.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import camera_adapter as ca
from ..models import wan_dit
from .wan_pipeline import WanPipeline, WanPipelineOutput, latent_frame_count


def convert_camera_adapter_state_dict(sd, dtype=np.float32):
    """Reference ``control_adapter.*`` torch keys
    (`wan_camera_adapter.py:5-41`) -> `init_camera_adapter` pytree."""
    pre = "control_adapter."
    conv = lambda k: {"kernel": np.asarray(sd[pre + k + ".weight"],
                                           dtype=dtype),
                      "bias": np.asarray(sd[pre + k + ".bias"], dtype=dtype)}
    res = []
    i = 0
    while pre + f"residual_blocks.{i}.conv1.weight" in sd:
        res.append({"conv1": conv(f"residual_blocks.{i}.conv1"),
                    "conv2": conv(f"residual_blocks.{i}.conv2")})
        i += 1
    return {"conv": conv("conv"), "res": res}


def pack_camera_frames(rays: jax.Array, tc: int = 4) -> jax.Array:
    """[B, 6, F, H, W] per-pixel-frame ray maps -> [B, 6*tc, F', H, W]
    latent-frame-aligned maps: frame 0 repeated ``tc`` times, then groups of
    ``tc`` frames folded into channels (F' = (F-1)//tc + 1)."""
    B, C, F, H, W = rays.shape
    if (F - 1) % tc != 0:
        # fail up front with the fix, not a reshape error deep below
        raise ValueError(
            f"camera stream has {F} frames; need (F-1) % {tc} == 0 "
            f"(latent-frame alignment) — pass 1 + k*{tc} pose rows, e.g. "
            f"{(F - 1) // tc * tc + 1} or {((F - 1) // tc + 1) * tc + 1}")
    first = jnp.repeat(rays[:, :, :1], tc, axis=2)
    x = jnp.concatenate([first, rays[:, :, 1:]], axis=2)  # [B, C, tc*F', H, W]
    Fp = x.shape[2] // tc
    x = x.reshape(B, C, Fp, tc, H, W)
    return x.transpose(0, 3, 1, 2, 4, 5).reshape(B, tc * C, Fp, H, W)


class CameraPipeline(WanPipeline):
    """`WanPipeline` + Plücker-ray camera control (`models/camera_adapter`)."""

    def __init__(self, *args, camera_params=None, **kwargs):
        super().__init__(*args, **kwargs)
        if camera_params is None:
            raise ValueError("CameraPipeline needs camera_params "
                             "(init_camera_adapter / "
                             "convert_camera_adapter_state_dict)")
        self.camera_params = camera_params

    def prepare_camera_features(self, cam_params, height: int, width: int
                                ) -> jax.Array:
        """Pose rows (or a pre-built [T, H, W, 6] embedding) ->
        ``y_camera`` [1, dim, T', H'/p, W'/p] on the DiT patch grid."""
        from ..data.camera import pose_params_to_embedding
        arr = np.asarray(cam_params, np.float32)
        if arr.ndim == 4 and arr.shape[-1] == 6:
            emb = arr
        else:
            emb = pose_params_to_embedding(arr, width, height)
        rays = jnp.asarray(emb).transpose(3, 0, 1, 2)[None]  # [1,6,T,H,W]
        tc = self.vae_cfg.temporal_compression_ratio
        packed = pack_camera_frames(rays, tc)
        return ca.camera_adapter_forward(
            self.camera_params, packed.astype(self.dtype))

    def _camera_step_fn(self, do_cfg: bool, guidance_scale: float):
        key = ("camera_step", do_cfg, float(guidance_scale),
               self._backend_for(do_cfg))
        if key in self._jit_cache:
            return self._jit_cache[key]
        dit_cfg = self.dit_cfg
        backend = self._backend_for(do_cfg)

        @jax.jit
        def step(dit_params, latents, y_camera, t_scalar, context,
                 rope_cos, rope_sin):
            if do_cfg:
                x = jnp.concatenate([latents, latents], axis=0)
                cam = jnp.concatenate([y_camera, y_camera], axis=0)
                ctx = context
            else:
                x, cam, ctx = latents, y_camera, context
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            v, _ = wan_dit.wan_dit_forward_with_residual(
                dit_params, dit_cfg, x.astype(self.dtype), t, ctx,
                rope_cos, rope_sin, attn_backend=backend, y_camera=cam)
            if do_cfg:
                vu, vc = jnp.split(v, 2, axis=0)
                v = vu + guidance_scale * (vc - vu)
            return v

        self._jit_cache[key] = step
        return step

    def camera_to_video(
        self,
        prompt: Union[str, Sequence[str]],
        cam_params,                  # pose rows or [T, H, W, 6] embedding
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
        """Text + camera trajectory -> video following the camera."""
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

        y_camera = self.prepare_camera_features(cam_params, height, width)
        if y_camera.shape[2] != Tl:
            raise ValueError(
                f"camera trajectory covers {y_camera.shape[2]} latent "
                f"frames, video needs {Tl} — pass {num_frames} pose rows")
        if B > 1:
            y_camera = jnp.broadcast_to(y_camera,
                                        (B,) + y_camera.shape[1:])

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

        step = self._camera_step_fn(do_cfg, guidance_scale)
        state = sched.init_state(latents)
        sk = ("sched", sampler, num_inference_steps, float(shift),
              solver_order)
        if sk not in self._jit_cache:
            self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
        sstep = self._jit_cache[sk]
        for i in range(num_inference_steps):
            v = step(self.dit_params, latents, y_camera,
                     float(sched.timesteps[i]), context, cos, sin)
            latents, state = sstep(v, i, latents, state)

        video = self.decode_to_numpy01(latents)
        out = WanPipelineOutput(videos=video, edit_videos=video)
        if output_latents:
            out.latents = np.asarray(latents)
        return out
