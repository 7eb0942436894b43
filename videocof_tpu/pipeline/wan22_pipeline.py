"""Wan2.2 dual-expert (MoE) pipeline.

Parity target: reference `videox_fun/pipeline/pipeline_wan2_2.py` — two DiT
experts split by noise level: ``transformer_2`` (high-noise expert) handles
steps with t >= boundary * num_train_timesteps (boundary 0.875,
`pipeline_wan2_2.py:115-137,533-535`), the base transformer the rest, with
per-expert guidance scales (`:552-553`).

The Wan2.2 *transformer* itself is architecturally the t2v Wan DiT with plain
cross-attention and no image branch (`wan_transformer3d.py:1302-1399`), so
both experts reuse `wan_dit`. The expert choice is data-INdependent (monotone
timestep schedule vs a fixed boundary), so the default path fuses the whole
trajectory into one compiled program of two `lax.scan` phases — high-noise
expert first, base expert after — threading one sampler carry
(`fused_sampler.make_fused_sample_fn_moe`). ``fused_sampling=False`` selects
the SEGMENTED dual-expert trajectory (K steps per dispatch, one shared
segment executable for both experts — for trajectories too long to run as
one program on watchdog-limited workers); set ``VIDEOCOF_STEPWISE=1`` for
the true one-dispatch-per-step loop (per-step debugging).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .wan_pipeline import WanPipeline, WanPipelineOutput, latent_frame_count
from ..models import wan_dit
from ..schedulers import get_scheduler


class Wan22Pipeline(WanPipeline):
    def __init__(self, *args, dit_params_2=None, boundary: float = 0.875,
                 num_train_timesteps: int = 1000, **kwargs):
        super().__init__(*args, **kwargs)
        self.dit_params_2 = dit_params_2      # high-noise expert (optional)
        self.boundary = boundary
        self.num_train_timesteps = num_train_timesteps
        if dit_params_2 is not None:
            # dual-expert residency (2x weights, measured r5): the chunk-3
            # decode programs AND the fused one-program encode that fit
            # beside ONE 1.3B ResourceExhaust beside two — keep the
            # smaller-footprint chunk and the per-chunk encode here
            self.vae_decode_chunk = 2
            self.encode_fused_enabled = False

    def _split_idx(self, sched) -> int:
        """Leading steps routed to the high-noise expert (host-side static:
        monotone decreasing schedule vs the fixed boundary)."""
        if self.dit_params_2 is None:
            return 0
        thr = self.boundary * self.num_train_timesteps
        return int(sum(float(t) >= thr for t in sched.timesteps))

    def precompile_fused(self, *, height: int, width: int,
                         source_frames: int = 33, reasoning_frames: int = 4,
                         num_inference_steps: int = 50,
                         guidance_scale: float = 5.0,
                         guidance_scale_2: Optional[float] = None,
                         shift: float = 5.0, sampler: str = "unipc",
                         batch: int = 1, max_sequence_length: int = 512,
                         cot: bool = True,
                         dit_param_abstract=None, dit_param_2_abstract=None,
                         layouts: str = "default"):
        """AOT-compile the dual-expert fused executable for one geometry and
        return (base_expert_formats, high_noise_expert_formats) — the MoE
        analogue of `WanPipeline.precompile_fused` (see utils/layouts.py for
        why weights must be created in the consumer's input formats)."""
        from .fused_sampler import make_fused_sample_fn_moe
        from ..models import wan_dit as _wd
        from ..schedulers import get_scheduler as _gs

        do_cfg = guidance_scale > 1.0
        g2 = guidance_scale if guidance_scale_2 is None else guidance_scale_2
        tc = self.vae_cfg.temporal_compression_ratio
        sc = self.vae_cfg.spatial_compression_ratio
        cond = latent_frame_count(source_frames, tc)
        ground = latent_frame_count(reasoning_frames, tc) if cot else 0
        Tl = cond + ground + cond
        Hl, Wl = height // sc, width // sc
        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)

        cos, sin = _wd.make_rope_for_geometry(
            self.dit_cfg, grid, f_src=cond, f_ground=ground)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        sched = _gs(sampler)
        sched.set_timesteps(num_inference_steps, shift=shift)
        split_idx = self._split_idx(sched)
        sp = self._sp_for(do_cfg)
        fn = make_fused_sample_fn_moe(
            self.dit_cfg, sampler, sched.plan_arrays(), split_idx, do_cfg,
            guidance_scale, g2, cond, self.dtype,
            attn_backend=self._backend_for(do_cfg), sp=sp)

        p_abs = (dit_param_abstract if dit_param_abstract is not None
                 else jax.eval_shape(lambda p: p, self.dit_params))
        p2_src = (self.dit_params_2 if self.dit_params_2 is not None
                  else self.dit_params)
        p2_abs = (dit_param_2_abstract if dit_param_2_abstract is not None
                  else jax.eval_shape(lambda p: p, p2_src))
        lat_abs = jax.ShapeDtypeStruct(
            (batch, self.vae_cfg.z_dim, Tl, Hl, Wl), jnp.float32)
        ctx_abs = jax.ShapeDtypeStruct(
            (batch * (2 if do_cfg else 1), max_sequence_length,
             self.dit_cfg.text_dim), self.dtype)
        # layouts: "default" is the production recipe (reproducible
        # input_formats through the persistent compile cache; ship with
        # utils.layouts.device_put_into); "auto" removes hoisted relayout
        # copies of multi-use weight stacks for one-program trajectories
        # but its cached formats are unreliable (CLAUDE.md) — see
        # WanPipeline.precompile_fused.
        if layouts == "auto":
            from jax.experimental.layout import Format, Layout
            fn_jit = jax.jit(fn, in_shardings=Format(Layout.AUTO))
        else:
            fn_jit = jax.jit(fn)
        compiled = fn_jit.lower(p_abs, p2_abs, lat_abs, ctx_abs, cos,
                                sin).compile()
        fmts = compiled.input_formats[0]

        def runner(p, p2, lat, ctx, rc, rs):
            return compiled(p, p2, jax.device_put(lat, fmts[2]),
                            jax.device_put(ctx, fmts[3]),
                            jax.device_put(rc, fmts[4]),
                            jax.device_put(rs, fmts[5]))

        # shape-locked AOT runner: key carries the compiled geometry so
        # other-geometry calls fall back to jit instead of crashing. Built
        # by the ONE shared builder so it mirrors the __call__-side key by
        # construction (see fused_sampler.fused_cache_key).
        from .fused_sampler import fused_cache_key
        runner.is_aot = True  # dispatch-side hit counter (VIDEOCOF_TIMING)
        fkey = fused_cache_key(
            "fused22", sampler=sampler,
            num_inference_steps=num_inference_steps, shift=shift,
            do_cfg=do_cfg, guidance_scale=guidance_scale,
            guidance_scale_2=g2, split_idx=split_idx,
            condition_count=cond, backend=self._backend_for(do_cfg),
            latents_shape=lat_abs.shape, context_shape=ctx_abs.shape)
        self._jit_cache[fkey] = runner
        return fmts[0], fmts[1]

    def _plan_t2v_teacache(self, sched, num_inference_steps,
                           enable_teacache, teacache_threshold,
                           teacache_skip_start_steps, teacache_coefficients,
                           teacache_forced_plan, do_cfg, cfg_skip_ratio):
        """MoE override: plan PER EXPERT with forced recompute at the
        expert boundary — same contract as `__call__`'s planning."""
        cfg_off = None
        if do_cfg and cfg_skip_ratio > 0.0:
            cfg_off = num_inference_steps - int(
                round(num_inference_steps * cfg_skip_ratio))
        split_idx = self._split_idx(sched)
        skip_mask = None
        if enable_teacache and teacache_forced_plan is not None:
            assert len(teacache_forced_plan) == num_inference_steps
            plan = [bool(s) for s in teacache_forced_plan]
            plan[0] = False
            if 0 < split_idx < num_inference_steps:
                plan[split_idx] = False
            skip_mask = tuple(plan)
        elif enable_teacache:
            from ..models import teacache as tc
            coeffs = (teacache_coefficients or
                      tc.TEACACHE_COEFFICIENTS["wan2.1-i2v-14b-720p"])
            ts = [float(t) for t in sched.timesteps]
            hi_params = (self.dit_params_2
                         if self.dit_params_2 is not None
                         else self.dit_params)
            plan_hi = tc.plan_teacache_skips(
                hi_params, self.dit_cfg, ts[:split_idx], coeffs,
                teacache_threshold,
                teacache_skip_start_steps) if split_idx else []
            plan_lo = tc.plan_teacache_skips(
                self.dit_params, self.dit_cfg, ts[split_idx:], coeffs,
                teacache_threshold,
                max(0, teacache_skip_start_steps - split_idx)
            ) if split_idx < num_inference_steps else []
            skip_mask = tuple(plan_hi) + tuple(plan_lo)
        return skip_mask, cfg_off

    def _t2v_denoise(self, latents, context, cos, sin, sched, sampler,
                     num_inference_steps, shift, do_cfg, guidance_scale,
                     fused_sampling, solver_order, **tc_kw):
        """Dual-expert t2v trajectory: the reference `Wan2_2Pipeline`
        denoise loop (`pipeline_wan2_2.py:517-561`: boundary-routed
        transformer choice + per-expert guidance) as static phase scans —
        same dispatch tiers as the base (`fused` one-program / segmented /
        stepwise), with TeaCache planned per expert."""
        from .fused_sampler import (auto_segment_steps,
                                    estimate_step_seconds,
                                    make_fused_sample_fn_moe,
                                    make_segmented_sample_fn_moe)
        guidance_scale_2 = getattr(self, "_t2v_g2", None)
        g2 = (guidance_scale if guidance_scale_2 is None
              else guidance_scale_2)
        split_idx = self._split_idx(sched)
        skip_mask, cfg_off = self._plan_t2v_teacache(
            sched, num_inference_steps,
            tc_kw.get("enable_teacache", False),
            tc_kw.get("teacache_threshold", 0.10),
            tc_kw.get("teacache_skip_start_steps", 5),
            tc_kw.get("teacache_coefficients"),
            tc_kw.get("teacache_forced_plan"),
            do_cfg, tc_kw.get("cfg_skip_ratio", 0.0))
        can_fuse = not (skip_mask is not None and cfg_off is not None)
        if do_cfg and self.cfg_sequential:
            can_fuse = False  # sequential CFG is a two-dispatch step
        params_2 = (self.dit_params_2 if self.dit_params_2 is not None
                    else self.dit_params)
        backend = self._backend_for(do_cfg)
        L_tok = cos.shape[0] if cos.ndim == 2 else (
            latents.shape[2] * (latents.shape[3] // 2)
            * (latents.shape[4] // 2))
        if fused_sampling is None:
            est = num_inference_steps * estimate_step_seconds(
                L_tok, do_cfg, dit_cfg=self.dit_cfg)
            fused_sampling = est <= 45.0
        fkey = ("t2v_fused22", sampler, num_inference_steps, float(shift),
                do_cfg, float(guidance_scale), float(g2), split_idx,
                backend, skip_mask, cfg_off, tuple(latents.shape),
                tuple(context.shape), solver_order)
        if fused_sampling and can_fuse:
            if fkey not in self._jit_cache:
                self._jit_cache[fkey] = make_fused_sample_fn_moe(
                    self.dit_cfg, sampler, sched.plan_arrays(), split_idx,
                    do_cfg, guidance_scale, g2, 0, self.dtype,
                    attn_backend=backend, sp=self._sp_for(do_cfg),
                    skip_mask=skip_mask, cfg_off_after=cfg_off)
            return self._jit_cache[fkey](self.dit_params, params_2, latents,
                                         context, cos, sin)
        import os as _os
        if (_os.environ.get("VIDEOCOF_STEPWISE") != "1"
                and sampler in ("unipc", "dpm++", "euler")
                and not (do_cfg and self.cfg_sequential)):
            seg_env = _os.environ.get("VIDEOCOF_SEG_STEPS")
            seg_n = max(1, int(seg_env)) if seg_env else auto_segment_steps(
                L_tok, do_cfg, dit_cfg=self.dit_cfg)
            skey = ("t2v_seg22", sampler, num_inference_steps, float(shift),
                    do_cfg, float(guidance_scale), float(g2), split_idx,
                    backend, skip_mask, cfg_off, seg_n, solver_order)
            if skey not in self._jit_cache:
                self._jit_cache[skey] = make_segmented_sample_fn_moe(
                    self.dit_cfg, sampler, sched.plan_arrays(), split_idx,
                    do_cfg, guidance_scale, g2, 0, self.dtype,
                    attn_backend=backend, sp=self._sp_for(do_cfg),
                    skip_mask=skip_mask, cfg_off_after=cfg_off,
                    segment_steps=seg_n)
            return self._jit_cache[skey](self.dit_params, params_2, latents,
                                         context, cos, sin)
        state = sched.init_state(latents)
        sk = ("sched", sampler, num_inference_steps, float(shift),
              solver_order)
        if sk not in self._jit_cache:
            self._jit_cache[sk] = jax.jit(sched.step, static_argnums=(1,))
        sstep = self._jit_cache[sk]
        skips = (list(skip_mask) if skip_mask is not None
                 else [False] * num_inference_steps)
        residual = None
        for i in range(num_inference_steps):
            high = i < split_idx
            step_cfg = do_cfg and (cfg_off is None or i < cfg_off)
            ctx_i = context
            if do_cfg and not step_cfg:
                ctx_i = context[context.shape[0] // 2:]  # cond rows
            res_in = None
            if skips[i]:
                res_in = residual
                need = latents.shape[0] * (2 if step_cfg else 1)
                if res_in.shape[0] != need:
                    res_in = res_in[-need:]  # cond rows (ref [-B:])
            step = self._step_fn(step_cfg,
                                 g2 if high else guidance_scale, 0,
                                 skip_blocks=skips[i])
            v, res = step(params_2 if high else self.dit_params, latents,
                          float(sched.timesteps[i]), ctx_i, cos, sin,
                          res_in)
            if not skips[i]:
                residual = res
            latents, state = sstep(v, i, latents, state)
        return latents

    def text_to_video(self, prompt, *, guidance_scale: float = 5.0,
                      guidance_scale_2: Optional[float] = None, **kw):
        """t2v with dual-expert routing: the high-noise prefix runs
        ``dit_params_2`` at ``guidance_scale_2`` (defaults to
        ``guidance_scale`` — `pipeline_wan2_2.py:552-558`)."""
        self._t2v_g2 = guidance_scale_2
        try:
            return super().text_to_video(prompt,
                                         guidance_scale=guidance_scale,
                                         **kw)
        finally:
            self._t2v_g2 = None

    def expert_for_timestep(self, t: float):
        """High-noise expert above the boundary, base expert below
        (`pipeline_wan2_2.py:533-535`)."""
        if (self.dit_params_2 is not None and
                t >= self.boundary * self.num_train_timesteps):
            return self.dit_params_2
        return self.dit_params

    def __call__(self, video, prompt, negative_prompt: str = "",
                 source_frames: int = 33, reasoning_frames: int = 4,
                 num_inference_steps: int = 50, guidance_scale: float = 5.0,
                 guidance_scale_2: Optional[float] = None,
                 shift: float = 5.0, sampler: str = "unipc",
                 repeat_rope: bool = True, cot: bool = True, seed: int = 0,
                 max_sequence_length: int = 512,
                 prompt_embeds=None, negative_prompt_embeds=None,
                 fused_sampling: Optional[bool] = None,
                 enable_teacache: bool = False,
                 teacache_threshold: float = 0.10,
                 teacache_skip_start_steps: int = 5,
                 teacache_coefficients=None,
                 teacache_forced_plan=None,
                 cfg_skip_ratio: float = 0.0,
                 riflex_k: Optional[int] = None,
                 riflex_L_test: Optional[int] = None,
                 riflex_L_test_scale: Optional[float] = None,
                 noise=None, latents=None,
                 output_latents: bool = False,
                 solver_order: Optional[int] = None) -> WanPipelineOutput:
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        # the CoT path's fused latent prep normalizes u8 in-program (same
        # contract as WanPipeline.__call__)
        video = self._prepare_video(video, prompts,
                                    convert=not (cot and latents is None))
        B = video.shape[0]

        do_cfg = guidance_scale > 1.0
        g2 = guidance_scale if guidance_scale_2 is None else guidance_scale_2
        tc = self.vae_cfg.temporal_compression_ratio
        condition_count = latent_frame_count(source_frames, tc)
        ground_latent_count = latent_frame_count(reasoning_frames, tc) if cot else 0

        embeds = (jnp.asarray(prompt_embeds) if prompt_embeds is not None
                  else self.encode_prompt(prompts, max_sequence_length))
        if do_cfg:
            neg = (jnp.asarray(negative_prompt_embeds)
                   if negative_prompt_embeds is not None
                   else self.encode_prompt([negative_prompt] * B,
                                           max_sequence_length))
            context = jnp.concatenate([neg, embeds], axis=0)
        else:
            context = embeds
        context = context.astype(self.dtype)

        key = jax.random.PRNGKey(seed)
        if latents is not None:
            latents = jnp.asarray(latents, jnp.float32)
        elif cot:
            latents = self.prepare_cot_latents(video, ground_latent_count,
                                               key, noise=noise)
        else:
            latents = self.prepare_paired_latents(video, key, noise=noise)
        _, C, Tl, Hl, Wl = latents.shape

        ph, pw = self.dit_cfg.patch_size[1:]
        grid = (Tl, Hl // ph, Wl // pw)
        f_src = condition_count if repeat_rope else None
        f_ground = ground_latent_count if (repeat_rope and cot) else 0
        rope_key = (grid, f_src, f_ground, riflex_k, riflex_L_test,
                    riflex_L_test_scale)
        if rope_key in self._rope_cache:
            cos, sin = self._rope_cache[rope_key]
        else:
            temporal_table = None
            if riflex_k is not None:
                from ..models.rope import riflex_angle_table
                temporal_table = riflex_angle_table(
                    self.dit_cfg.head_dim, riflex_k, riflex_L_test or 66,
                    riflex_L_test_scale, max_pos=self.dit_cfg.rope_max_pos,
                    theta=self.dit_cfg.rope_theta)
            cos, sin = wan_dit.make_rope_for_geometry(
                self.dit_cfg, grid, f_src=f_src, f_ground=f_ground,
                temporal_table=temporal_table)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            self._rope_cache[rope_key] = (cos, sin)

        sched_kw = ({"solver_order": solver_order}
                    if solver_order is not None
                    and sampler in ("unipc", "dpm++") else {})
        sched = get_scheduler(sampler, **sched_kw)
        sched.set_timesteps(num_inference_steps, shift=shift)
        state = sched.init_state(latents)

        # leading steps routed to the high-noise expert — a host-side static
        # count (monotone decreasing schedule, data-independent boundary)
        split_idx = self._split_idx(sched)

        # ---- TeaCache (planned PER EXPERT — each expert has its own
        # timestep-modulation trajectory, forced recompute at the expert
        # boundary) + cfg-skip cut, shared with the t2v path
        skip_mask, cfg_off = self._plan_t2v_teacache(
            sched, num_inference_steps, enable_teacache, teacache_threshold,
            teacache_skip_start_steps, teacache_coefficients,
            teacache_forced_plan, do_cfg, cfg_skip_ratio)
        # one-program fusion excludes TeaCache+cfg-skip COMBINED (residual
        # batch shapes disagree across the cfg split); segmented composes
        can_fuse = not (skip_mask is not None and cfg_off is not None)
        if do_cfg and self.cfg_sequential:
            can_fuse = False  # sequential CFG is a two-dispatch step

        from .fused_sampler import fused_cache_key
        fkey = fused_cache_key(
            "fused22", sampler=sampler,
            num_inference_steps=num_inference_steps, shift=shift,
            do_cfg=do_cfg, guidance_scale=guidance_scale,
            guidance_scale_2=g2, split_idx=split_idx,
            condition_count=condition_count,
            backend=self._backend_for(do_cfg),
            latents_shape=latents.shape, context_shape=context.shape,
            skip_mask=skip_mask, cfg_off=cfg_off, solver_order=solver_order)
        if fused_sampling is None:
            if not can_fuse:
                fused_sampling = False
            elif fkey in self._jit_cache:
                # a precompiled AOT runner exists for exactly this geometry:
                # always use it (the weights were shipped into ITS formats —
                # re-jitting would relayout-copy the whole tree)
                fused_sampling = True
            else:
                # one-program trajectories past the remote worker's
                # program-kill window go segmented (same wall model that
                # sizes the segments)
                from .fused_sampler import estimate_step_seconds
                ph2, pw2 = self.dit_cfg.patch_size[1:]
                L_tok = Tl * (Hl // ph2) * (Wl // pw2)
                est_total = num_inference_steps * estimate_step_seconds(
                    L_tok, do_cfg, dit_cfg=self.dit_cfg)
                fused_sampling = est_total <= 45.0
        if fused_sampling and can_fuse:
            # whole trajectory (both expert phases) as ONE compiled program
            if fkey not in self._jit_cache:
                from .fused_sampler import make_fused_sample_fn_moe
                sp = self._sp_for(do_cfg)
                self._jit_cache[fkey] = make_fused_sample_fn_moe(
                    self.dit_cfg, sampler, sched.plan_arrays(), split_idx,
                    do_cfg, guidance_scale, g2, condition_count, self.dtype,
                    attn_backend=self._backend_for(do_cfg), sp=sp,
                    skip_mask=skip_mask, cfg_off_after=cfg_off)
            params_2 = (self.dit_params_2 if self.dit_params_2 is not None
                        else self.dit_params)
            fused_fn = self._jit_cache[fkey]
            if getattr(fused_fn, "is_aot", False):
                self.aot_runner_hits += 1
            latents = fused_fn(self.dit_params, params_2,
                               latents, context, cos, sin)
        else:
            import os as _os
            if (_os.environ.get("VIDEOCOF_STEPWISE") != "1"
                    and sampler in ("unipc", "dpm++", "euler")
                    and not (do_cfg and self.cfg_sequential)):
                # segmented dual-expert trajectory: K steps per dispatch,
                # one shared segment executable for both experts (see
                # fused_sampler.make_segmented_sample_fn_moe) — the MoE
                # path for trajectories too long for one program
                from .fused_sampler import (auto_segment_steps,
                                            make_segmented_sample_fn_moe)
                L_tok = Tl * (Hl // ph) * (Wl // pw)
                seg_env = _os.environ.get("VIDEOCOF_SEG_STEPS")
                seg_n = max(1, int(seg_env)) if seg_env else (
                    auto_segment_steps(L_tok, do_cfg, dit_cfg=self.dit_cfg))
                skey = ("seg22", sampler, num_inference_steps, float(shift),
                        do_cfg, float(guidance_scale), float(g2), split_idx,
                        condition_count, self._backend_for(do_cfg),
                        skip_mask, cfg_off, seg_n, solver_order)
                if skey not in self._jit_cache:
                    sp = self._sp_for(do_cfg)
                    self._jit_cache[skey] = make_segmented_sample_fn_moe(
                        self.dit_cfg, sampler, sched.plan_arrays(),
                        split_idx, do_cfg, guidance_scale, g2,
                        condition_count, self.dtype,
                        attn_backend=self._backend_for(do_cfg),
                        sp=sp, skip_mask=skip_mask, cfg_off_after=cfg_off,
                        segment_steps=seg_n)
                params_2 = (self.dit_params_2
                            if self.dit_params_2 is not None
                            else self.dit_params)
                latents = self._jit_cache[skey](self.dit_params, params_2,
                                                latents, context, cos, sin)
            else:
                sched_key = ("sched", sampler, num_inference_steps,
                             float(shift), solver_order)
                if sched_key not in self._jit_cache:
                    self._jit_cache[sched_key] = jax.jit(
                        sched.step, static_argnums=(1,))
                sched_step = self._jit_cache[sched_key]
                skips = (list(skip_mask) if skip_mask is not None
                         else [False] * num_inference_steps)
                residual = None
                for i in range(num_inference_steps):
                    t_i = float(sched.timesteps[i])
                    high = i < split_idx
                    expert = self.dit_params_2 if high else self.dit_params
                    g = g2 if high else guidance_scale
                    step_cfg = do_cfg and (cfg_off is None or i < cfg_off)
                    ctx_i = context
                    if do_cfg and not step_cfg:
                        ctx_i = context[context.shape[0] // 2:]  # cond rows
                    res_in = None
                    if skips[i]:
                        res_in = residual
                        need = latents.shape[0] * (2 if step_cfg else 1)
                        if res_in.shape[0] != need:
                            res_in = res_in[-need:]  # cond rows (ref [-B:])
                    step = self._step_fn(step_cfg, g, condition_count,
                                         skip_blocks=skips[i])
                    v, res = step(expert, latents, t_i, ctx_i, cos, sin,
                                  res_in)
                    if not skips[i]:
                        residual = res
                    latents, state = sched_step(v, i, latents, state)

        # segment-wise decode shared with the base pipeline (single-fetch
        # device-u8 path by default)
        out = self._decode_outputs(latents, cot, condition_count,
                                   ground_latent_count)
        if output_latents:
            out.latents = np.asarray(latents)
        return out
