"""Fully-fused denoise loop: all sampler steps in ONE compiled XLA program.

The per-step python loop costs one device dispatch per step plus sampler
round-trips — negligible on a local host, real money over remote transports
and at 50 steps. Here the whole trajectory is a `lax.scan` whose xs are the
sampler's precomputed per-step coefficient arrays (`plan_arrays()`): the UniPC
corrector becomes a `where`-blend (its coefficients are zero-passing when
unused), so one scan body serves every step with no retraces and XLA overlaps
everything.

Covers the UniPC/Euler/DPM++ paths with or without CFG. A precomputed
TeaCache schedule (`skip_mask`) also fuses: the skip decision is
data-independent (it depends only on the timestep schedule — see
models/teacache.py), so the scan body carries the token-stream residual and
`lax.cond`s between the block stack and the cached-residual path; only the
taken branch executes on TPU. cfg-skip fuses too, as a STATIC two-phase
split (CFG steps, then cond-only steps — `cfg_off_after`); only
TeaCache + cfg-skip COMBINED stays stepwise, because their residual batch
shapes disagree across the phase boundary. (Note the reference's 4-step
fast config never actually skips: num_skip_start_steps=5 >= 4 steps —
`fast_infer.py:158-160`.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanDiTConfig
from ..models import wan_dit


def fused_cache_key(kind: str, *, sampler: str, num_inference_steps: int,
                    shift: float, do_cfg: bool, guidance_scale: float,
                    condition_count: int, backend, latents_shape,
                    context_shape, skip_mask=None, cfg_off=None,
                    solver_order=None, guidance_scale_2=None,
                    split_idx=None) -> tuple:
    """THE single source of truth for fused-trajectory `_jit_cache` keys.

    Both the AOT precompile paths (`WanPipeline.precompile_fused`,
    `Wan22Pipeline.precompile_fused`) and the `__call__`-side dispatch build
    their keys here, so they agree BY CONSTRUCTION — including the trailing
    skip_mask / cfg_off / solver_order slots the precompile path leaves at
    None. A mismatch silently bypasses the shipped-weights AOT runner and
    relayout-copies the whole param tree at dispatch (OOM-fatal for the
    fp8 14B on a 16 GB chip; see utils/layouts.py). tests/test_fp8.py pins
    the reuse for both families.

    ``kind``: "fused" (WanPipeline) or "fused22" (Wan22Pipeline; pass
    ``guidance_scale_2`` + ``split_idx``).
    """
    return (kind, sampler, int(num_inference_steps), float(shift),
            bool(do_cfg), float(guidance_scale),
            None if guidance_scale_2 is None else float(guidance_scale_2),
            None if split_idx is None else int(split_idx),
            int(condition_count), backend, skip_mask, cfg_off,
            tuple(latents_shape), tuple(context_shape), solver_order)


def _sampler_defs(sampler_name: str):
    """(latents_of, update, init_carry, final) for one sampler — pure update
    rules over the sampler carry; the scan body owns the DiT call."""

    if sampler_name == "euler":
        def latents_of(carry):
            return carry

        def update(carry, x_t, v):
            return carry + x_t["dt"] * v

        def init_carry(latents):
            return latents

        def final(carry):
            return carry

    elif sampler_name == "unipc":
        def latents_of(carry):
            return carry[0]

        def update(carry, x_t, v):
            # third-order terms carry zero coefficients (c_d2s/p_d2 = 0,
            # finite r1inv = 0) on order-<=2 plans, so they vanish exactly
            latents, m0, m1, m2, last = carry
            model_t = latents - x_t["sigma"] * v
            corrected = (x_t["c_ratio"] * last + x_t["c_m0"] * m0
                         + x_t["c_d1t"] * (model_t - m0)
                         + x_t["c_d1s"] * ((m1 - m0) * x_t["c_r0inv"])
                         + x_t["c_d2s"] * ((m2 - m0) * x_t["c_r1inv"]))
            sample = jnp.where(x_t["use_corrector"], corrected, latents)
            m2n, m1n, m0n = m1, m0, model_t
            nxt = (x_t["p_ratio"] * sample + x_t["p_m0"] * m0n
                   + jnp.where(x_t["p_order2"],
                               x_t["p_d1"] * ((m1n - m0n) * x_t["p_r0inv"]),
                               0.0)
                   + x_t["p_d2"] * ((m2n - m0n) * x_t["p_r1inv"]))
            return (nxt, m0n, m1n, m2n, sample)

        def init_carry(latents):
            z = jnp.zeros_like(latents)
            return (latents, z, z, z, z)

        def final(carry):
            return carry[0]

    elif sampler_name == "dpm++":
        def latents_of(carry):
            return carry[0]

        def update(carry, x_t, v):
            latents, m_prev, m_prev2 = carry
            m0 = latents - x_t["sigma"] * v
            d1_0 = (m0 - m_prev) * x_t["r0inv"]
            nxt = (x_t["ratio"] * latents + x_t["c_m0"] * m0
                   + jnp.where(x_t["order2"], x_t["c_d1"] * d1_0, 0.0)
                   + x_t["c_diff"] * (d1_0 - (m_prev - m_prev2)
                                      * x_t["r1inv"]))
            return (nxt, m0, m_prev)

        def init_carry(latents):
            z = jnp.zeros_like(latents)
            return (latents, z, z)

        def final(carry):
            return carry[0]
    else:
        raise ValueError(f"fused sampler: unsupported {sampler_name!r}")

    return latents_of, update, init_carry, final


def _make_dit_v(dit_cfg: WanDiTConfig, do_cfg: bool, condition_count: int,
                dtype, attn_backend, sp):
    """(dit_params, gscale, latents, t, context, cos, sin, residual, skip)
    -> (frozen-source velocity, residual). ``residual``/``skip`` may be
    None (no TeaCache threading) or a carried array + traced flag."""

    def dit_v(dit_params, gscale, latents, t_scalar, context, cos, sin,
              residual=None, skip=None, clip_fea=None, y=None):
        if do_cfg:
            x = jnp.concatenate([latents, latents], axis=0)
            if clip_fea is not None:
                clip_fea = jnp.concatenate([clip_fea, clip_fea], axis=0)
            if y is not None:
                y = jnp.concatenate([y, y], axis=0)
            if sp is not None and sp.cfg_parallel:
                x = sp.shard_batch(x)
                context = sp.shard_batch(context)
        else:
            x = latents
        t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
        v, res = wan_dit.wan_dit_forward_with_residual(
            dit_params, dit_cfg, x.astype(dtype), t, context, cos, sin,
            attn_backend=attn_backend, sp=sp, residual=residual,
            skip_blocks=(False if skip is None else skip),
            clip_fea=clip_fea, y=y)
        if do_cfg:
            vu, vc = jnp.split(v, 2, axis=0)
            v = vu + gscale * (vc - vu)
        if condition_count:
            v = v.at[:, :, :condition_count].set(0.0)
        return v, res

    return dit_v


def make_fused_sample_fn(dit_cfg: WanDiTConfig, sampler_name: str,
                         plan: dict, do_cfg: bool, guidance_scale: float,
                         condition_count: int, dtype,
                         attn_backend=None, sp=None,
                         skip_mask=None, cfg_off_after: Optional[int] = None,
                         scan_unroll: int = 1):
    """Returns jitted fn(dit_params, latents, context, rope_cos, rope_sin)
    -> final latents. ``plan`` is scheduler.plan_arrays().

    ``skip_mask`` (optional bool array, one per step, first False): a
    precomputed TeaCache schedule; skip steps replay the carried block-stack
    residual instead of running the blocks (in-graph `lax.cond`).

    ``cfg_off_after`` (optional, CFG runs only): cfg-skip — steps at index
    >= this run WITHOUT the uncond branch (cond half of the context, single
    batch), the reference's `@cfg_skip` (`utils/cfg_optimization.py:7-37`).
    The sampler carry keeps its shape across the split, so both phases ride
    the same compiled program as two scans."""
    xs = {k: jnp.asarray(v) for k, v in plan.items()}
    n_steps = len(next(iter(plan.values())))
    split = n_steps
    if do_cfg and cfg_off_after is not None:
        split = max(0, min(int(cfg_off_after), n_steps))
    thread_residual = skip_mask is not None
    if thread_residual:
        if split < n_steps:
            raise ValueError("TeaCache + cfg-skip: residual shapes differ "
                             "across the cfg split; use the stepwise path")
        skip_mask = np.asarray(skip_mask, bool)
        if skip_mask[0]:
            raise ValueError("skip_mask[0] must be False: the first step "
                             "has no residual to replay")
        xs["skip"] = jnp.asarray(skip_mask)
    latents_of, update, init_carry, final = _sampler_defs(sampler_name)
    dit_v = _make_dit_v(dit_cfg, do_cfg, condition_count, dtype,
                        attn_backend, sp)
    dit_v_plain = _make_dit_v(dit_cfg, False, condition_count, dtype,
                              attn_backend, sp)

    @jax.jit
    def run(dit_params, latents, context, rope_cos, rope_sin,
            clip_fea=None, y=None):
        # ``clip_fea``/``y``: step-invariant i2v conditioning (CLIP image
        # tokens + channel-concat conditioning video — the reference's
        # `wan_transformer3d.py:866-867,944-946`); None on the t2v path
        if thread_residual:
            res_abs = jax.eval_shape(
                lambda l: dit_v(dit_params, guidance_scale, l, 999.0,
                                context, rope_cos, rope_sin,
                                clip_fea=clip_fea, y=y)[1], latents)
            res0 = jnp.zeros(res_abs.shape, res_abs.dtype)

            def sbody(carry, x_t):
                samp, res = carry
                v, res = dit_v(dit_params, guidance_scale, latents_of(samp),
                               x_t["timestep"], context, rope_cos, rope_sin,
                               residual=res, skip=x_t["skip"],
                               clip_fea=clip_fea, y=y)
                return (update(samp, x_t, v), res), None

            (carry, _), _ = jax.lax.scan(sbody, (init_carry(latents), res0),
                                         xs, unroll=scan_unroll)
            return final(carry)

        def phase(carry, pxs, dv, ctx):
            def sbody(c, x_t):
                v, _ = dv(dit_params, guidance_scale, latents_of(c),
                          x_t["timestep"], ctx, rope_cos, rope_sin,
                          clip_fea=clip_fea, y=y)
                return update(c, x_t, v), None
            carry, _ = jax.lax.scan(sbody, carry, pxs, unroll=scan_unroll)
            return carry

        carry = init_carry(latents)
        if split == n_steps:
            carry = phase(carry, xs, dit_v, context)
        else:
            xs_a = {k: v[:split] for k, v in xs.items()}
            xs_b = {k: v[split:] for k, v in xs.items()}
            ctx_cond = context[context.shape[0] // 2:]  # cond rows
            if split > 0:
                carry = phase(carry, xs_a, dit_v, context)
            carry = phase(carry, xs_b, dit_v_plain, ctx_cond)
        return final(carry)

    return run


# wall-model calibration: Wan2.1-1.3B at 29,640 tokens = 1.8 s/step with
# ~70% of the time in attention (BASELINE.md); the 14B fp8 measures
# 9.97 s/step at the same geometry and this model predicts ~11 s — close
# enough for segment sizing, and over-estimating is the safe direction.
_BASE_TOKENS = 29640
_BASE_LIN_S = 0.54          # 30% of 1.8
_BASE_ATTN_S = 1.26         # 70% of 1.8
_BASE_LIN_UNITS = 30 * (8 * 1536 ** 2 + 2 * 1536 * 8960)
_BASE_ATTN_UNITS = 30 * 1536


def estimate_step_seconds(n_tokens: int, do_cfg: bool,
                          dit_cfg=None) -> float:
    """Per-step wall model on one v5e: a linear-in-tokens term for the
    projections/FFN and a quadratic term for attention, both scaled by the
    model's size (layers x dims) relative to the calibrated 1.3B — without
    the size term a 14B trajectory would be sized like a 1.3B one and the
    resulting multi-minute XLA program would hit the remote worker's
    program-kill window. Used only to pick a safe segment length."""
    r = n_tokens / _BASE_TOKENS
    if dit_cfg is not None:
        d, f, L = dit_cfg.dim, dit_cfg.ffn_dim, dit_cfg.num_layers
        lin_scale = L * (8 * d ** 2 + 2 * d * f) / _BASE_LIN_UNITS
        attn_scale = L * d / _BASE_ATTN_UNITS
    else:
        lin_scale = attn_scale = 1.0
    est = _BASE_LIN_S * lin_scale * r + _BASE_ATTN_S * attn_scale * r * r
    return est * (2 if do_cfg else 1)


def auto_segment_steps(n_tokens: int, do_cfg: bool,
                       max_segment_seconds: float = 45.0,
                       dit_cfg=None) -> int:
    """Steps per segmented-trajectory dispatch: as many as fit under
    ``max_segment_seconds`` of estimated wall (the axon remote worker kills
    single XLA programs running multi-minute; segments must stay well
    clear), at least 1, at most 8 (diminishing returns past that)."""
    est = estimate_step_seconds(n_tokens, do_cfg, dit_cfg=dit_cfg)
    return max(1, min(8, int(max_segment_seconds / max(est, 1e-6))))


def _drive_segments(step_seg, xs_host, lo, hi, segment_steps, carry):
    """Dispatch ``step_seg(carry, xs_seg)`` over plan steps [lo, hi) in
    chunks of ``segment_steps`` (host-side numpy slices of the precomputed
    plan — each segment is one device dispatch)."""
    i = lo
    while i < hi:
        k = min(segment_steps, hi - i)
        carry = step_seg(carry, {k2: v[i:i + k]
                                 for k2, v in xs_host.items()})
        i += k
    return carry


def make_segmented_sample_fn(dit_cfg: WanDiTConfig, sampler_name: str,
                             plan: dict, do_cfg: bool, guidance_scale: float,
                             condition_count: int, dtype,
                             attn_backend=None, sp=None,
                             skip_mask=None,
                             cfg_off_after: Optional[int] = None,
                             segment_steps: int = 4):
    """Segmented fused trajectory: the same scan body as
    :func:`make_fused_sample_fn`, but dispatched as ceil(n/K)-step segments
    so no single XLA program runs long enough to trip the remote worker's
    watchdog, while the per-step Python loop's two-dispatches-per-step
    overhead (DiT step + sampler update, ~0.2 s/step over the axon tunnel)
    collapses into one dispatch per K steps.

    All segments of the same (phase, length) share ONE executable: the
    per-step coefficient arrays are traced arguments sliced per segment, not
    baked constants. The sampler carry (and the TeaCache residual, when
    ``skip_mask`` is given) threads across segments as device arrays — no
    host round-trips. Unlike the one-program fused path, TeaCache composes
    with cfg-skip here: the residual's batch slice at the phase boundary
    happens between segments (reference `utils/cfg_optimization.py:7-37`
    keeps the cond rows, `[-B:]`).

    Returns fn(dit_params, latents, context, rope_cos, rope_sin) -> latents.
    """
    # Host-side (numpy) plan: per-segment slices must NOT be device-array
    # slices — each would be its own tunnel dispatch. Numpy slices are free
    # and the per-segment coefficients (a few floats per step) ride the
    # segment dispatch as tiny uploads.
    segment_steps = max(1, int(segment_steps))
    xs_host = {k: np.asarray(v) for k, v in plan.items()}
    n_steps = len(next(iter(plan.values())))
    split = n_steps
    if do_cfg and cfg_off_after is not None:
        split = max(0, min(int(cfg_off_after), n_steps))
    thread_residual = skip_mask is not None
    if thread_residual:
        skip_mask = np.asarray(skip_mask, bool)
        if skip_mask[0]:
            raise ValueError("skip_mask[0] must be False: the first step "
                             "has no residual to replay")
        xs_host["skip"] = skip_mask
    latents_of, update, init_carry, final = _sampler_defs(sampler_name)
    dit_v_cfg = _make_dit_v(dit_cfg, do_cfg, condition_count, dtype,
                            attn_backend, sp)
    dit_v_plain = _make_dit_v(dit_cfg, False, condition_count, dtype,
                              attn_backend, sp)

    def make_seg(dv, gscale):
        if thread_residual:
            @jax.jit
            def seg(dit_params, carry, res, xs_seg, context, cos, sin):
                def sbody(c, x_t):
                    samp, r = c
                    v, r = dv(dit_params, gscale, latents_of(samp),
                              x_t["timestep"], context, cos, sin,
                              residual=r, skip=x_t["skip"])
                    return (update(samp, x_t, v), r), None
                (carry, res), _ = jax.lax.scan(sbody, (carry, res), xs_seg)
                return carry, res
            return seg

        @jax.jit
        def seg(dit_params, carry, res, xs_seg, context, cos, sin):
            def sbody(c, x_t):
                v, _ = dv(dit_params, gscale, latents_of(c),
                          x_t["timestep"], context, cos, sin)
                return update(c, x_t, v), None
            carry, _ = jax.lax.scan(sbody, carry, xs_seg)
            return carry, res
        return seg

    seg_cfg = make_seg(dit_v_cfg, guidance_scale)
    seg_plain = make_seg(dit_v_plain, guidance_scale) if split < n_steps \
        else None

    def run(dit_params, latents, context, rope_cos, rope_sin):
        carry = init_carry(latents)
        res = None
        if thread_residual:
            res_abs = jax.eval_shape(
                lambda l: dit_v_cfg(dit_params, guidance_scale, l, 999.0,
                                    context, rope_cos, rope_sin)[1], latents)
            res = jnp.zeros(res_abs.shape, res_abs.dtype)

        if split > 0:
            carry, res = _drive_segments(
                lambda cr, xs: seg_cfg(dit_params, cr[0], cr[1], xs,
                                       context, rope_cos, rope_sin),
                xs_host, 0, split, segment_steps, (carry, res))
        if split < n_steps:
            ctx_cond = context[context.shape[0] // 2:]
            if thread_residual and res is not None:
                res = res[-latents.shape[0]:]  # keep cond rows (ref [-B:])
            carry, res = _drive_segments(
                lambda cr, xs: seg_plain(dit_params, cr[0], cr[1], xs,
                                         ctx_cond, rope_cos, rope_sin),
                xs_host, split, n_steps, segment_steps, (carry, res))
        return final(carry)

    # introspection for benchmarking: dispatch one segment directly
    run.seg_cfg = seg_cfg
    run.seg_plain = seg_plain
    run.segment_steps = segment_steps
    run.xs_host = xs_host
    run.n_steps = n_steps
    run.split = split
    run.thread_residual = thread_residual
    run.init_carry = init_carry
    return run


def make_segmented_sample_fn_moe(dit_cfg: WanDiTConfig, sampler_name: str,
                                 plan: dict, split_idx: int, do_cfg: bool,
                                 guidance_scale: float,
                                 guidance_scale_2: float,
                                 condition_count: int, dtype,
                                 attn_backend=None, sp=None,
                                 skip_mask=None,
                                 cfg_off_after: Optional[int] = None,
                                 segment_steps: int = 4):
    """Segmented dual-expert (Wan2.2 MoE) trajectory: the MoE analogue of
    :func:`make_segmented_sample_fn` for trajectories too long to run as
    one program on watchdog-limited workers. ONE compiled segment
    executable serves BOTH experts — the expert params and its guidance
    scale are traced arguments, and both experts share the pytree
    structure (`wan_transformer3d.py:1302-1399`: same architecture).

    ``skip_mask``/``cfg_off_after``: TeaCache schedule and cfg-skip split,
    same contracts as :func:`make_fused_sample_fn_moe`; unlike the
    one-program path the two COMPOSE here (the residual's cond-row slice at
    the cfg boundary happens between segments).

    Returns fn(dit_params, dit_params_2, latents, context, cos, sin).
    """
    segment_steps = max(1, int(segment_steps))
    xs_host = {k: np.asarray(v) for k, v in plan.items()}
    n_steps = len(next(iter(plan.values())))
    if not 0 <= split_idx <= n_steps:
        raise ValueError(f"split_idx {split_idx} outside [0, {n_steps}]")
    phases = _moe_phase_table(n_steps, split_idx, do_cfg, cfg_off_after)
    thread_residual = skip_mask is not None
    if thread_residual:
        skip_mask = np.asarray(skip_mask, bool)
        if n_steps and skip_mask[0]:
            raise ValueError("skip_mask[0] must be False: the first step "
                             "has no residual to replay")
        if 0 < split_idx < n_steps and skip_mask[split_idx]:
            raise ValueError("skip_mask[split_idx] must be False: the "
                             "carried residual belongs to the other expert")
        xs_host["skip"] = skip_mask
    latents_of, update, init_carry, final = _sampler_defs(sampler_name)
    dit_v_cfg = _make_dit_v(dit_cfg, do_cfg, condition_count, dtype,
                            attn_backend, sp)
    dit_v_plain = _make_dit_v(dit_cfg, False, condition_count, dtype,
                              attn_backend, sp)

    def make_seg(dv):
        # expert params + guidance are TRACED arguments: one executable per
        # (cfg phase kind), shared by both experts (same pytree structure —
        # `wan_transformer3d.py:1302-1399`: same architecture)
        if thread_residual:
            @jax.jit
            def seg(params, gscale, carry, res, xs_seg, context, cos, sin):
                def sbody(c, x_t):
                    samp, r = c
                    v, r = dv(params, gscale, latents_of(samp),
                              x_t["timestep"], context, cos, sin,
                              residual=r, skip=x_t["skip"])
                    return (update(samp, x_t, v), r), None
                (carry, res), _ = jax.lax.scan(sbody, (carry, res), xs_seg)
                return carry, res
            return seg

        @jax.jit
        def seg(params, gscale, carry, res, xs_seg, context, cos, sin):
            def sbody(c, x_t):
                v, _ = dv(params, gscale, latents_of(c), x_t["timestep"],
                          context, cos, sin)
                return update(c, x_t, v), None
            carry, _ = jax.lax.scan(sbody, carry, xs_seg)
            return carry, res
        return seg

    seg_cfg = make_seg(dit_v_cfg)
    seg_plain = (make_seg(dit_v_plain)
                 if do_cfg and any(not cfg_on for *_, cfg_on in phases)
                 else None)

    def run(dit_params, dit_params_2, latents, context, cos, sin):
        carry = init_carry(latents)
        res = None
        if thread_residual:
            res_abs = jax.eval_shape(
                lambda l: dit_v_cfg(dit_params, guidance_scale, l, 999.0,
                                    context, cos, sin)[1], latents)
            res = jnp.zeros(res_abs.shape, res_abs.dtype)

        for lo, hi, hi_expert, cfg_on in phases:
            params = dit_params_2 if hi_expert else dit_params
            g = jnp.float32(guidance_scale_2 if hi_expert
                            else guidance_scale)
            if do_cfg and not cfg_on:
                seg_f, ctx = seg_plain, context[context.shape[0] // 2:]
                if (thread_residual and res is not None
                        and res.shape[0] != latents.shape[0]):
                    res = res[-latents.shape[0]:]  # cond rows (ref [-B:])
            else:
                seg_f, ctx = seg_cfg, context
            carry, res = _drive_segments(
                lambda cr, xs, s=seg_f, p=params, g=g, c=ctx: s(
                    p, g, cr[0], cr[1], xs, c, cos, sin),
                xs_host, lo, hi, segment_steps, (carry, res))
        return final(carry)

    run.seg = seg_cfg
    run.seg_plain = seg_plain
    run.segment_steps = segment_steps
    run.xs_host = xs_host
    run.n_steps = n_steps
    run.split_idx = split_idx
    run.phases = phases
    run.thread_residual = thread_residual
    run.init_carry = init_carry
    return run


def _moe_phase_table(n_steps: int, split_idx: int, do_cfg: bool,
                     cfg_off_after: Optional[int]):
    """Static phase table for a dual-expert trajectory: (lo, hi,
    use_expert_2, cfg_on) spans. Boundaries are the expert split (leading
    ``split_idx`` steps on the high-noise expert) and the cfg-skip split
    (steps at index >= ``cfg_off_after`` drop the uncond branch). Both are
    data-independent, so the trajectory is a fixed sequence of scans."""
    cfg_off = n_steps
    if do_cfg and cfg_off_after is not None:
        cfg_off = max(0, min(int(cfg_off_after), n_steps))
    cuts = sorted({0, split_idx, cfg_off, n_steps})
    phases = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        if lo == hi:
            continue
        phases.append((lo, hi, lo < split_idx, do_cfg and lo < cfg_off))
    return phases


def make_fused_sample_fn_moe(dit_cfg: WanDiTConfig, sampler_name: str,
                             plan: dict, split_idx: int, do_cfg: bool,
                             guidance_scale: float, guidance_scale_2: float,
                             condition_count: int, dtype,
                             attn_backend=None, sp=None,
                             skip_mask=None,
                             cfg_off_after: Optional[int] = None):
    """Dual-expert (Wan2.2 MoE) fused trajectory: the expert boundary is
    data-INdependent (t >= boundary * num_train_timesteps with a monotone
    timestep schedule — reference `pipeline_wan2_2.py:533-535`), so the
    trajectory statically splits into a high-noise prefix handled by
    ``dit_params_2`` (with ``guidance_scale_2``) and a low-noise suffix
    handled by the base expert: per-phase `lax.scan`s threading one sampler
    carry, still a single compiled XLA program.

    ``skip_mask`` (optional, one bool per step): a precomputed TeaCache
    schedule — planned PER EXPERT by the caller (each expert has its own
    timestep modulations); the first step of each expert phase must compute
    (the carried residual belongs to the other expert). ``cfg_off_after``:
    cfg-skip as a further static phase split. TeaCache + cfg-skip combined
    is rejected, same rule as :func:`make_fused_sample_fn`.

    ``split_idx``: number of leading steps routed to the high-noise expert.
    Returns jitted fn(dit_params, dit_params_2, latents, context, cos, sin).
    """
    n_steps = len(next(iter(plan.values())))
    if not 0 <= split_idx <= n_steps:
        raise ValueError(f"split_idx {split_idx} outside [0, {n_steps}]")
    phases = _moe_phase_table(n_steps, split_idx, do_cfg, cfg_off_after)
    thread_residual = skip_mask is not None
    xs_all = {k: np.asarray(v) for k, v in plan.items()}
    if thread_residual:
        if any(cfg_on != phases[0][3] for _, _, _, cfg_on in phases):
            raise ValueError("TeaCache + cfg-skip: residual shapes differ "
                             "across the cfg split; use the stepwise path")
        skip_mask = np.asarray(skip_mask, bool)
        if n_steps and skip_mask[0]:
            raise ValueError("skip_mask[0] must be False: the first step "
                             "has no residual to replay")
        if 0 < split_idx < n_steps and skip_mask[split_idx]:
            raise ValueError("skip_mask[split_idx] must be False: the "
                             "carried residual belongs to the other expert")
        xs_all["skip"] = skip_mask
    latents_of, update, init_carry, final = _sampler_defs(sampler_name)
    dit_v = _make_dit_v(dit_cfg, do_cfg, condition_count, dtype,
                        attn_backend, sp)
    dit_v_plain = _make_dit_v(dit_cfg, False, condition_count, dtype,
                              attn_backend, sp)

    @jax.jit
    def run(dit_params, dit_params_2, latents, context, rope_cos, rope_sin):
        res = None
        if thread_residual:
            res_abs = jax.eval_shape(
                lambda l: dit_v(dit_params, guidance_scale, l, 999.0,
                                context, rope_cos, rope_sin)[1], latents)
            res = jnp.zeros(res_abs.shape, res_abs.dtype)

        def phase(carry, res, lo, hi, params, gscale, cfg_on):
            dv = dit_v if cfg_on else dit_v_plain
            ctx = context if cfg_on or not do_cfg \
                else context[context.shape[0] // 2:]  # cond rows
            xs = {k: jnp.asarray(v[lo:hi]) for k, v in xs_all.items()}
            if thread_residual:
                def sbody(c, x_t):
                    samp, r = c
                    v, r = dv(params, gscale, latents_of(samp),
                              x_t["timestep"], ctx, rope_cos, rope_sin,
                              residual=r, skip=x_t["skip"])
                    return (update(samp, x_t, v), r), None
                (carry, res), _ = jax.lax.scan(sbody, (carry, res), xs)
                return carry, res

            def sbody(c, x_t):
                v, _ = dv(params, gscale, latents_of(c), x_t["timestep"],
                          ctx, rope_cos, rope_sin)
                return update(c, x_t, v), None
            carry, _ = jax.lax.scan(sbody, carry, xs)
            return carry, res

        carry = init_carry(latents)
        for lo, hi, hi_expert, cfg_on in phases:
            carry, res = phase(carry, res, lo, hi,
                               dit_params_2 if hi_expert else dit_params,
                               guidance_scale_2 if hi_expert
                               else guidance_scale, cfg_on)
        return final(carry)

    return run
