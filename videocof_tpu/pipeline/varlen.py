"""Ragged (mixed-length) batch editing — varlen semantics over one batch.

The reference packs true per-sample ``q_lens``/``k_lens`` varlen batches
through FlashAttention-2/3 (`attention_utils.py:113-146`): samples of
different lengths share one kernel launch, each attending only within its
own span. The TPU-native equivalent keeps everything STATIC-shaped (XLA
compiles one program for the max geometry) and makes the raggedness pure
DATA:

  * every sample's latents are zero-padded along latent-T to the batch max;
  * each sample carries ITS OWN CoF RoPE table (positions are data, so a
    [B, L, d/2] stack of per-geometry tables just rides along);
  * a ``seq_lens`` [B] vector turns into a per-sample key mask inside the
    flash kernel — padded tokens never enter any softmax;
  * the per-sample source-freeze boundary (different ``condition_count``
    per item) becomes a [B, 1, T, 1, 1] multiplicative mask on the
    predicted velocity.

Padded tokens are inert passengers: attention is masked, every other DiT op
is per-token, and the sampler update is elementwise — so each sample's
valid region is EXACTLY its own per-item run (test_varlen_pipeline.py pins
latents and decoded videos). VAE encode/decode run per item (conv over a
padded tensor would change boundary math), which mirrors the reference: its
varlen packing lives in the transformer only.

Scope: same H x W across the batch (the CLI buckets by resolution — mixed
frame COUNTS are the realistic ragged axis), stepwise trajectory, optional
CFG. TeaCache/cfg-skip stay per-item features (their residual caches are
geometry-global).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wan_dit
from ..schedulers import get_scheduler
from .wan_pipeline import WanPipelineOutput, latent_frame_count


def batch_edit(
    pipe,
    videos: Sequence,
    source_frames: Sequence[int],
    prompt_embeds: Sequence,
    reasoning_frames: int = 4,
    num_inference_steps: int = 4,
    guidance_scale: float = 1.0,
    negative_prompt_embeds: Optional[Sequence] = None,
    shift: float = 3.0,
    sampler: str = "unipc",
    seeds: Optional[Sequence[int]] = None,
    solver_order: Optional[int] = None,
    output_latents: bool = False,
):
    """Edit N videos of DIFFERENT lengths as ONE denoise batch.

    ``videos[i]`` is [3, T_i, H, W] (or [1, 3, T_i, H, W]) with a shared
    H x W; ``source_frames[i]`` its source span; ``prompt_embeds[i]``
    [text_len, dim] (or [1, text_len, dim]). ``seeds[i]`` defaults to
    ``i`` — each item's noise draw matches ``pipe(video_i, seed=i)``
    exactly. Returns a list of ``WanPipelineOutput``, one per item.
    """
    B = len(videos)
    assert len(source_frames) == B and len(prompt_embeds) == B
    seeds = list(range(B)) if seeds is None else list(seeds)
    do_cfg = guidance_scale > 1.0
    if do_cfg:
        assert negative_prompt_embeds is not None, \
            "CFG needs negative_prompt_embeds per item"

    tc = pipe.vae_cfg.temporal_compression_ratio
    ground = latent_frame_count(reasoning_frames, tc)
    ph, pw = pipe.dit_cfg.patch_size[1:]

    # ---- per-item prep: VAE encode + noise (exactly the per-item path),
    # geometry, rope table
    lats, conds, ropes, Ls = [], [], [], []
    for i, v in enumerate(videos):
        v = np.asarray(v)
        if v.ndim == 4:
            v = v[None]
        v = pipe._prepare_video(v, ["batch"])
        cond = latent_frame_count(int(source_frames[i]), tc)
        lat = pipe.prepare_cot_latents(v, ground, jax.random.PRNGKey(
            int(seeds[i])))
        lats.append(lat)
        conds.append(cond)
        Tl, Hl, Wl = lat.shape[2], lat.shape[3], lat.shape[4]
        cos_i, sin_i = wan_dit.make_rope_for_geometry(
            pipe.dit_cfg, (Tl, Hl // ph, Wl // pw), f_src=cond,
            f_ground=ground)
        ropes.append((np.asarray(cos_i), np.asarray(sin_i)))
        Ls.append(Tl * (Hl // ph) * (Wl // pw))

    T_max = max(lat.shape[2] for lat in lats)
    L_max = max(Ls)
    latents = jnp.concatenate([
        jnp.pad(lat, ((0, 0), (0, 0), (0, T_max - lat.shape[2]),
                      (0, 0), (0, 0))) for lat in lats])
    cos_b = jnp.stack([
        jnp.asarray(np.pad(c, ((0, L_max - c.shape[0]), (0, 0)),
                           constant_values=1.0)) for c, _ in ropes])
    sin_b = jnp.stack([
        jnp.asarray(np.pad(s, ((0, L_max - s.shape[0]), (0, 0))))
        for _, s in ropes])
    seq_lens = jnp.asarray(Ls, jnp.int32)

    # velocity keep-mask: 0 on each item's frozen source frames AND on its
    # T padding (padding stays bitwise-fixed through the whole trajectory)
    fidx = jnp.arange(T_max)
    keep = ((fidx[None] >= jnp.asarray(conds)[:, None])
            & (fidx[None] < jnp.asarray([lat.shape[2] for lat in lats])
               [:, None])).astype(jnp.float32)[:, None, :, None, None]

    embeds = jnp.concatenate([jnp.asarray(e).reshape(1, *np.shape(e)[-2:])
                              for e in prompt_embeds]).astype(pipe.dtype)
    if do_cfg:
        neg = jnp.concatenate([jnp.asarray(e).reshape(1, *np.shape(e)[-2:])
                               for e in negative_prompt_embeds]
                              ).astype(pipe.dtype)
        context = jnp.concatenate([neg, embeds], axis=0)  # uncond first
    else:
        context = embeds

    sched_kw = ({"solver_order": solver_order} if solver_order is not None
                and sampler in ("unipc", "dpm++") else {})
    sched = get_scheduler(sampler, **sched_kw)
    sched.set_timesteps(num_inference_steps, shift=shift)
    state = sched.init_state(latents)

    dit_cfg = pipe.dit_cfg
    if getattr(pipe, "sp_mesh", None) is not None:
        # the varlen step never threads sp= through wan_dit_forward, so an
        # SP/TP/cfg-parallel backend would run against unsharded tokens
        # (shape mismatch or silent mis-partitioning). Mixed-length batching
        # is a single-chip convenience; shard over items with DP instead.
        raise NotImplementedError(
            "varlen.batch_edit does not compose with sequence/tensor/"
            "cfg-parallel pipelines; disable_sequence_parallel() first")
    backend = pipe.attn_backend
    g = float(guidance_scale)
    dtype = pipe.dtype

    key = ("varlen_step", do_cfg, g, backend, B)
    if key not in pipe._jit_cache:

        @jax.jit
        def step(dit_params, latents, t_scalar, context, rope_cos, rope_sin,
                 seq_lens, keep):
            if do_cfg:
                x = jnp.concatenate([latents, latents], axis=0)
                rc = jnp.concatenate([rope_cos, rope_cos], axis=0)
                rs = jnp.concatenate([rope_sin, rope_sin], axis=0)
                sl = jnp.concatenate([seq_lens, seq_lens], axis=0)
            else:
                x, rc, rs, sl = latents, rope_cos, rope_sin, seq_lens
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            v = wan_dit.wan_dit_forward(
                dit_params, dit_cfg, x.astype(dtype), t, context, rc, rs,
                attn_backend=backend, seq_lens=sl)
            if do_cfg:
                vu, vc = jnp.split(v, 2, axis=0)
                v = vu + g * (vc - vu)
            return v * keep

        pipe._jit_cache[key] = step
    step = pipe._jit_cache[key]

    sched_key = ("sched", sampler, num_inference_steps, float(shift),
                 solver_order)
    if sched_key not in pipe._jit_cache:
        pipe._jit_cache[sched_key] = jax.jit(sched.step, static_argnums=(1,))
    sched_step = pipe._jit_cache[sched_key]

    for i in range(num_inference_steps):
        v = step(pipe.dit_params, latents, float(sched.timesteps[i]),
                 context, cos_b, sin_b, seq_lens, keep)
        latents, state = sched_step(v, i, latents, state)

    # ---- per-item decode of each sample's valid region
    outs = []
    for i in range(B):
        lat_i = latents[i:i + 1, :, :lats[i].shape[2]]
        out: WanPipelineOutput = pipe._decode_outputs(lat_i, True, conds[i],
                                                      ground)
        if output_latents:
            out.latents = np.asarray(lat_i)
        outs.append(out)
    return outs
