"""Chain-of-frames trainer.

The reference never released its training script (`README.md:199` TODO); it
shipped DeepSpeed ZeRO configs, the CoT triplet dataset, FSDP wrappers, and
the timestep-band sampler (SURVEY.md §2.4/§2.7). This module closes the loop
TPU-natively: dataset triplets -> frozen-VAE latents in the CoF layout
[src | ground | tgt] -> frozen-T5 text embeddings -> masked flow-matching
loss (source frames stay clean, mirroring inference) -> one pjit'd train step
(FSDP + DP + optional Ulysses SP) -> orbax checkpoints.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import T5Config, WanDiTConfig, WanVAEConfig
from ..models import t5_encoder, wan_dit, wan_vae
from ..pipeline.wan_pipeline import latent_frame_count
from .timestep_sampler import DiscreteSampling
from .train_step import TrainState, make_train_step


@dataclass
class TrainerConfig:
    height: int = 480
    width: int = 832
    source_frames: int = 33
    target_frames: int = 33
    reasoning_frames: int = 4
    batch_size: int = 1
    total_steps: int = 1000
    learning_rate: float = 1e-5
    weight_decay: float = 1e-3
    grad_clip: float = 0.05          # reference ZeRO configs clip at 0.05
    mesh_data: int = 1
    mesh_seq: int = 1
    log_every: int = 10
    save_every: int = 500
    checkpoint_dir: Optional[str] = None
    seed: int = 0
    # LoRA mode (the reference's actual 14B training regime): train only
    # rank-r adapters over a frozen base; None = full fine-tuning
    lora_rank: Optional[int] = None


class CoFTrainer:
    def __init__(self, dit_params, dit_cfg: WanDiTConfig, vae_params,
                 vae_cfg: WanVAEConfig, t5_params, t5_cfg: T5Config,
                 tokenizer, tcfg: TrainerConfig):
        from ..parallel import make_mesh

        self.dit_cfg = dit_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg
        self.tokenizer = tokenizer
        self.tcfg = tcfg

        self.mesh = make_mesh(data=tcfg.mesh_data, seq=tcfg.mesh_seq)
        tx = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(tcfg.learning_rate, weight_decay=tcfg.weight_decay))
        self.base_params = None
        if tcfg.lora_rank:
            from ..parallel import fsdp_param_sharding
            from .train_step import make_lora_train_step
            init_fn, self.step_fn = make_lora_train_step(
                self.mesh, dit_cfg, tx, rank=tcfg.lora_rank,
                use_ulysses=tcfg.mesh_seq > 1)
            self.base_params = jax.device_put(
                dit_params, fsdp_param_sharding(self.mesh, dit_params))
            self.state = init_fn(jax.random.PRNGKey(tcfg.seed + 1))
        else:
            init_fn, self.step_fn = make_train_step(
                self.mesh, dit_cfg, tx, use_ulysses=tcfg.mesh_seq > 1)
            self.state: TrainState = init_fn(dit_params)
        self.sampler = DiscreteSampling(group_num=max(1, tcfg.mesh_data))
        self._encode_jit = jax.jit(
            lambda v: wan_vae.encode(self.vae_params, self.vae_cfg, v)[0])
        # jitted text encode: eager per-op dispatch over the remote tunnel
        # costs ~50-100 ms/op — the same fix the pipeline's encode_prompt
        # carries (hundreds of encoder ops would add minutes per step)
        self._t5_jit = jax.jit(
            lambda ids, mask: t5_encoder.t5_encode(
                self.t5_params, self.t5_cfg, ids, mask)
            * mask[..., None].astype(jnp.float32))

        # static CoF geometry
        tc = vae_cfg.temporal_compression_ratio
        self.f_src = latent_frame_count(tcfg.source_frames, tc)
        self.f_ground = latent_frame_count(tcfg.reasoning_frames, tc)
        self.f_tgt = latent_frame_count(tcfg.target_frames, tc)
        self.f_total = self.f_src + self.f_ground + self.f_tgt

    # ----------------------------------------------------------- preparation
    def prepare_batch(self, samples) -> Dict[str, Any]:
        """List of dataset dicts -> device batch (latents, context, rope,
        timesteps, CoF frame mask)."""
        pix = np.stack([np.concatenate(
            [s["pixel_src"], s["pixel_ground"], s["pixel_tgt"]], axis=1)
            for s in samples])                     # [B, 3, T_pix, H, W]
        # encode the three segments separately so each starts causally
        b = pix.shape[0]
        src_px = self.tcfg.source_frames
        grd_px = self.tcfg.reasoning_frames
        lat_parts = []
        for lo, hi in ((0, src_px), (src_px, src_px + grd_px),
                       (src_px + grd_px, pix.shape[2])):
            lat_parts.append(self._encode_jit(jnp.asarray(pix[:, :, lo:hi])))
        x0 = jnp.concatenate(lat_parts, axis=2)    # [B, C, f_total, h, w]

        texts = [s["text"] for s in samples]
        ids, mask = self.tokenizer(texts, max_length=self.dit_cfg.text_len)
        ctx = self._t5_jit(jnp.asarray(ids), jnp.asarray(mask))

        hl, wl = x0.shape[3], x0.shape[4]
        ph, pw = self.dit_cfg.patch_size[1:]
        cos, sin = wan_dit.make_rope_for_geometry(
            self.dit_cfg, (self.f_total, hl // ph, wl // pw),
            f_src=self.f_src, f_ground=self.f_ground)

        frame_mask = np.ones((self.f_total,), np.float32)
        frame_mask[: self.f_src] = 0.0             # source stays clean

        return {
            "x0": x0.astype(jnp.float32),
            "context": ctx.astype(jnp.float32),
            "rope_cos": jnp.asarray(cos),
            "rope_sin": jnp.asarray(sin),
            "frame_mask": jnp.asarray(frame_mask),
        }

    # ------------------------------------------------------------------ loop
    def train(self, sample_iter: Iterator, total_steps: Optional[int] = None
              ) -> TrainState:
        tcfg = self.tcfg
        total_steps = total_steps or tcfg.total_steps
        rng = jax.random.PRNGKey(tcfg.seed)
        t_start = time.time()
        for step in range(total_steps):
            samples = [next(sample_iter) for _ in range(tcfg.batch_size)]
            batch = self.prepare_batch(samples)
            rng, k1, k2 = jax.random.split(rng, 3)
            batch["timesteps"] = self.sampler.sample(
                k1, tcfg.batch_size, dp_rank=jax.process_index())
            if self.base_params is not None:   # LoRA mode
                self.state, loss = self.step_fn(self.state, self.base_params,
                                                batch, k2)
            else:
                self.state, loss = self.step_fn(self.state, batch, k2)
            if step % tcfg.log_every == 0:
                print(f"[train] step {step} loss {float(loss):.4f} "
                      f"({time.time() - t_start:.0f}s)", file=sys.stderr,
                      flush=True)
            if (tcfg.checkpoint_dir and tcfg.save_every
                    and (step + 1) % tcfg.save_every == 0):
                from ..utils.checkpoint import save_train_state
                save_train_state(tcfg.checkpoint_dir, self.state)
                print(f"[train] checkpoint @ step {step + 1}",
                      file=sys.stderr)
        return self.state
