"""Wan2.2 MoE pipeline, i2v DiT branch, CLIP vision tower tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import clip_vision, t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import Wan22Pipeline

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


def test_wan22_expert_routing():
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    p2 = wan_dit.init_wan_dit(jax.random.PRNGKey(1), DCFG)
    pipe = Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32, dit_params_2=p2, boundary=0.875)
    # routing: high-noise expert above 875, base below
    assert pipe.expert_for_timestep(999.0) is p2
    assert pipe.expert_for_timestep(500.0) is p1
    # no expert 2 -> always base
    pipe2 = Wan22Pipeline(
        p1, DCFG, pipe.vae_params, VCFG, pipe.t5_params, T5_TINY,
        dtype=jnp.float32)
    assert pipe2.expert_for_timestep(999.0) is p1


def test_wan22_pipeline_runs():
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    p2 = wan_dit.init_wan_dit(jax.random.PRNGKey(1), DCFG)
    pipe = Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32, dit_params_2=p2)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    out = pipe(video, "make it snow", source_frames=9,
               num_inference_steps=4, guidance_scale=1.0, cot=False)
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()


def test_wan22_fused_moe_matches_stepwise():
    """The two-phase fused MoE scan (high-noise expert prefix + base expert
    suffix in one program) must reproduce the stepwise expert-routed loop."""
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    p2 = wan_dit.init_wan_dit(jax.random.PRNGKey(1), DCFG)
    pipe = Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32, dit_params_2=p2, boundary=0.9)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    # shift=5, 4 steps -> t = [999, 937, 833, 624] straddles the 0.9 boundary
    kw = dict(source_frames=9, num_inference_steps=4, guidance_scale=5.0,
              guidance_scale_2=3.0, cot=False, seed=3)
    fused = pipe(video, "make it snow", fused_sampling=True, **kw)
    stepwise = pipe(video, "make it snow", fused_sampling=False, **kw)
    # outputs are uint8-quantized; fused-scan float reassociation may flip
    # a boundary pixel by one 1/255 step
    np.testing.assert_allclose(fused.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # both experts actually used at this boundary
    from videocof_tpu.schedulers import get_scheduler
    s = get_scheduler("unipc")
    s.set_timesteps(4, shift=5.0)
    n_hi = sum(float(t) >= 0.9 * 1000 for t in s.timesteps)
    assert 0 < n_hi < 4


def test_wan22_segmented_moe_matches_stepwise(monkeypatch):
    """The segmented dual-expert trajectory (K steps/dispatch, one shared
    segment executable for both experts) must match the stepwise
    expert-routed loop, including a segment length that straddles the
    expert boundary mid-segment... it cannot: phase boundaries are also
    segment boundaries. seg=3 over a 4-step run with split at 2 exercises
    the remainder path in both phases."""
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    p2 = wan_dit.init_wan_dit(jax.random.PRNGKey(1), DCFG)
    pipe = Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32, dit_params_2=p2, boundary=0.9)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    kw = dict(source_frames=9, num_inference_steps=4, guidance_scale=5.0,
              guidance_scale_2=3.0, cot=False, seed=3)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    stepwise = pipe(video, "make it snow", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    for seg in (1, 3):
        monkeypatch.setenv("VIDEOCOF_SEG_STEPS", str(seg))
        got = pipe(video, "make it snow", fused_sampling=False, **kw)
        np.testing.assert_allclose(got.videos, stepwise.videos,
                                   atol=(1.0 / 255.0) + 1e-6)


def test_wan22_uint8_input_matches_float():
    """The Wan2.2 __call__ must honor the base pipeline's uint8 contract
    (ADVICE r1: it used to VAE-encode raw 0..255 values)."""
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    pipe = Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (1, 3, 9, 32, 32), dtype=np.uint8)
    f32 = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    kw = dict(source_frames=9, num_inference_steps=2, guidance_scale=1.0,
              cot=False)
    a = pipe(f32, "make it snow", **kw)
    b = pipe(u8, "make it snow", **kw)
    np.testing.assert_allclose(a.videos, b.videos, atol=2e-2)
    with pytest.raises(ValueError, match="prompts"):
        pipe(f32, ["a", "b"], **kw)


def _moe_pipe(boundary=0.9):
    p1 = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    p2 = wan_dit.init_wan_dit(jax.random.PRNGKey(1), DCFG)
    return Wan22Pipeline(
        p1, DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32, dit_params_2=p2, boundary=boundary)


def test_wan22_teacache_fused_matches_stepwise(monkeypatch):
    """A TeaCache skip plan threads through the dual-expert fused scan
    (per-expert residuals, forced recompute at the expert boundary) and
    must reproduce the stepwise residual-replay loop. A forced plan makes
    the schedule deterministic; the expert split at step 2 means the plan's
    step-2 skip is normalized to compute (the residual belongs to the other
    expert)."""
    pipe = _moe_pipe(boundary=0.9)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    # shift=5, 6 steps: t=[999,...] split at the 0.9 boundary
    plan = [False, True, False, True, False, True]
    kw = dict(source_frames=9, num_inference_steps=6, guidance_scale=5.0,
              guidance_scale_2=3.0, cot=False, seed=3, shift=5.0,
              enable_teacache=True, teacache_forced_plan=plan)
    fused = pipe(video, "make it snow", fused_sampling=True, **kw)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    stepwise = pipe(video, "make it snow", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    np.testing.assert_allclose(fused.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # skipping changed the output vs no-TeaCache (the plan actually bites)
    plain = pipe(video, "make it snow", fused_sampling=True,
                 **{**kw, "enable_teacache": False,
                    "teacache_forced_plan": None})
    assert np.abs(plain.videos - fused.videos).max() > 0
    # segmented path composes too
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", "2")
    seg = pipe(video, "make it snow", fused_sampling=False, **kw)
    np.testing.assert_allclose(seg.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)


def test_wan22_teacache_planned_per_expert():
    """Auto-planned (non-forced) TeaCache on the MoE pipeline: the plan is
    computed per expert; first step of each expert phase computes."""
    from videocof_tpu.models import teacache as tc
    pipe = _moe_pipe(boundary=0.9)
    from videocof_tpu.schedulers import get_scheduler
    s = get_scheduler("unipc")
    s.set_timesteps(6, shift=5.0)
    split = pipe._split_idx(s)
    assert 0 < split < 6
    ts = [float(t) for t in s.timesteps]
    coeffs = tc.TEACACHE_COEFFICIENTS["wan2.1-i2v-14b-720p"]
    hi = tc.plan_teacache_skips(pipe.dit_params_2, DCFG, ts[:split],
                                coeffs, 0.1, 0)
    lo = tc.plan_teacache_skips(pipe.dit_params, DCFG, ts[split:],
                                coeffs, 0.1, 0)
    assert hi[0] is False and lo[0] is False
    # the pipeline runs with the auto plan (finite output, no crash)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    out = pipe(video, "make it snow", source_frames=9,
               num_inference_steps=6, guidance_scale=1.0, cot=False,
               shift=5.0, enable_teacache=True, teacache_threshold=0.1,
               teacache_skip_start_steps=0)
    assert np.isfinite(out.videos).all()


def test_wan22_cfg_skip_matches_stepwise(monkeypatch):
    """cfg-skip on the MoE pipeline: the uncond branch drops for the last
    fraction of steps as one more static phase cut; fused and segmented
    must match the stepwise loop."""
    pipe = _moe_pipe(boundary=0.9)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    kw = dict(source_frames=9, num_inference_steps=4, guidance_scale=5.0,
              guidance_scale_2=3.0, cot=False, seed=3, shift=5.0,
              cfg_skip_ratio=0.5)
    fused = pipe(video, "make it snow", fused_sampling=True, **kw)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    stepwise = pipe(video, "make it snow", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    np.testing.assert_allclose(fused.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", "3")
    seg = pipe(video, "make it snow", fused_sampling=False, **kw)
    np.testing.assert_allclose(seg.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # cfg-skip actually changes the result vs full CFG
    full = pipe(video, "make it snow", fused_sampling=True,
                **{**kw, "cfg_skip_ratio": 0.0})
    assert np.abs(full.videos - fused.videos).max() > 0


def test_wan22_t2v_teacache_cfg_skip_matches_stepwise(monkeypatch):
    """TeaCache + cfg-skip on the t2v surface: the segmented dual-expert
    trajectory (they compose there) and the fused single-knob variants all
    match the stepwise loop."""
    pipe = _moe_pipe(boundary=0.9)
    kw = dict(height=32, width=32, num_frames=5, num_inference_steps=6,
              guidance_scale=5.0, guidance_scale_2=3.0, seed=3, shift=5.0,
              enable_teacache=True,
              teacache_forced_plan=[False, True, False, True, False, True],
              cfg_skip_ratio=0.34)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    stepwise = pipe.text_to_video("make it snow", fused_sampling=False,
                                  **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", "2")
    seg = pipe.text_to_video("make it snow", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_SEG_STEPS")
    np.testing.assert_allclose(seg.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # TeaCache alone fuses in one program
    kw_tc = {**kw, "cfg_skip_ratio": 0.0}
    fused_tc = pipe.text_to_video("make it snow", fused_sampling=True,
                                  **kw_tc)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    step_tc = pipe.text_to_video("make it snow", fused_sampling=False,
                                 **kw_tc)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    np.testing.assert_allclose(fused_tc.videos, step_tc.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # the forced plan actually bites
    plain = pipe.text_to_video("make it snow", fused_sampling=True,
                               **{**kw_tc, "enable_teacache": False,
                                  "teacache_forced_plan": None})
    assert np.abs(plain.videos - fused_tc.videos).max() > 0


def test_i2v_dit_branch():
    cfg = WAN_TINY.replace(model_type="i2v", in_dim=WAN_TINY.in_dim * 2)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg)
    assert "img_emb" in params
    assert "k_img" in params["blocks"]["cross_attn"]

    B, C0 = 1, WAN_TINY.in_dim
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C0, 3, 4, 4))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, C0, 3, 4, 4))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.text_len, cfg.text_dim))
    clip_fea = jax.random.normal(jax.random.PRNGKey(4), (B, 257, 1280))
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (3, 2, 2))
    out, _ = wan_dit.wan_dit_forward_with_residual(
        params, cfg, x, t, ctx, jnp.asarray(cos), jnp.asarray(sin),
        clip_fea=clip_fea, y=y)
    assert out.shape == (B, cfg.out_dim, 3, 4, 4)
    # image features must influence the output
    out2, _ = wan_dit.wan_dit_forward_with_residual(
        params, cfg, x, t, ctx, jnp.asarray(cos), jnp.asarray(sin),
        clip_fea=clip_fea * 0.5, y=y)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_clip_vision_tower():
    cfg = clip_vision.CLIP_TINY
    params = clip_vision.init_clip_vision(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (2, 3, cfg.image_size, cfg.image_size))
    out = clip_vision.clip_vision_forward(params, cfg, imgs)
    assert out.shape == (2, 1 + cfg.num_patches, cfg.dim)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_preprocess():
    cfg = clip_vision.CLIP_TINY
    frames = jnp.zeros((1, 3, 17, 23))  # [-1,1] zero = mid gray
    out = clip_vision.preprocess_frames(frames, cfg)
    assert out.shape == (1, 3, cfg.image_size, cfg.image_size)
    want = (0.5 - np.array(clip_vision.CLIP_MEAN)) / np.array(
        clip_vision.CLIP_STD)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), want, rtol=1e-5)


def test_clip_converter_roundtrip():
    cfg = clip_vision.CLIP_TINY
    params = clip_vision.init_clip_vision(jax.random.PRNGKey(0), cfg)
    # build a torch-layout state dict from our params, convert back
    sd = {
        "visual.patch_embedding.weight":
            np.asarray(params["patch_embed"]["kernel"]),
        "visual.cls_embedding": np.asarray(params["cls"]),
        "visual.pos_embedding": np.asarray(params["pos"]),
        "visual.pre_norm.weight": np.asarray(params["pre_norm"]["scale"]),
        "visual.pre_norm.bias": np.asarray(params["pre_norm"]["bias"]),
    }
    for i, b in enumerate(params["blocks"]):
        pre = f"visual.transformer.{i}."
        sd[pre + "norm1.weight"] = np.asarray(b["norm1"]["scale"])
        sd[pre + "norm1.bias"] = np.asarray(b["norm1"]["bias"])
        sd[pre + "attn.to_qkv.weight"] = np.asarray(b["qkv"]["kernel"]).T
        sd[pre + "attn.to_qkv.bias"] = np.asarray(b["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = np.asarray(b["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = np.asarray(b["proj"]["bias"])
        sd[pre + "norm2.weight"] = np.asarray(b["norm2"]["scale"])
        sd[pre + "norm2.bias"] = np.asarray(b["norm2"]["bias"])
        sd[pre + "mlp.0.weight"] = np.asarray(b["fc1"]["kernel"]).T
        sd[pre + "mlp.0.bias"] = np.asarray(b["fc1"]["bias"])
        sd[pre + "mlp.2.weight"] = np.asarray(b["fc2"]["kernel"]).T
        sd[pre + "mlp.2.bias"] = np.asarray(b["fc2"]["bias"])
    back = clip_vision.convert_clip_state_dict(sd, cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 3, cfg.image_size, cfg.image_size))
    a = clip_vision.clip_vision_forward(params, cfg, imgs)
    b = clip_vision.clip_vision_forward(back, cfg, imgs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_wan22_call_kwarg_passthroughs():
    """The MoE editing __call__ honors noise / output_latents / solver_order
    (these used to vanish into **_ignored) and rejects unknown kwargs."""
    pipe = _moe_pipe(boundary=0.9)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    # 6 steps: lower_order_final clamps order-3 out of existence at <= 4
    kw = dict(source_frames=9, num_inference_steps=6, guidance_scale=1.0,
              cot=False, shift=5.0, output_latents=True)
    mu_shape = tuple(pipe.vae_encode(jnp.asarray(video)).shape)
    rng = np.random.default_rng(1)
    n1 = rng.standard_normal(mu_shape).astype(np.float32)
    n2 = rng.standard_normal(mu_shape).astype(np.float32)
    a = pipe(video, "x", noise=n1, **kw)
    b = pipe(video, "x", noise=n1, **kw)
    c = pipe(video, "x", noise=n2, **kw)
    assert a.latents is not None
    np.testing.assert_array_equal(a.latents, b.latents)
    assert np.abs(a.latents - c.latents).max() > 0   # noise consumed
    # solver_order reaches the multistep solver (order 3 != default 2)
    o3 = pipe(video, "x", noise=n1, solver_order=3, **kw)
    assert np.abs(o3.latents - a.latents).max() > 0
    with pytest.raises(TypeError):
        pipe(video, "x", definitely_not_a_kwarg=1,
             source_frames=9, num_inference_steps=1, cot=False)
