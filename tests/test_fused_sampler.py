"""The fused (single-scan) sampling path must match the stepwise path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def video():
    return np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)


@pytest.mark.parametrize("sampler", ["unipc", "euler", "dpm++"])
def test_fused_matches_stepwise(pipe, video, sampler):
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=4,
              sampler=sampler, seed=5)
    a = pipe(video, "remove the box", fused_sampling=False, **kw)
    b = pipe(video, "remove the box", fused_sampling=True, **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)


@pytest.mark.parametrize("sampler", ["unipc", "dpm++"])
def test_fused_matches_stepwise_order3(pipe, video, sampler, monkeypatch):
    """solver_order=3: the scan carries one extra model output (m2); the
    fused trajectory must still equal the per-step path exactly."""
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=6,
              sampler=sampler, seed=7, solver_order=3)
    a = pipe(video, "remove the box", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    b = pipe(video, "remove the box", fused_sampling=True, **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)


def test_fused_with_cfg(pipe, video):
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=3,
              guidance_scale=4.0, negative_prompt="blurry", seed=2)
    a = pipe(video, "add a hat", fused_sampling=False, **kw)
    b = pipe(video, "add a hat", fused_sampling=True, **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)


def test_uint8_input_matches_float(pipe):
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (1, 3, 9, 32, 32), dtype=np.uint8)
    f32 = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=3)
    a = pipe(f32, "remove the box", **kw)
    b = pipe(u8, "remove the box", **kw)
    np.testing.assert_allclose(a.videos, b.videos, atol=2e-2)


@pytest.mark.parametrize("seg", [1, 2, 3])
def test_segmented_matches_stepwise(pipe, video, seg, monkeypatch):
    """The segmented trajectory (K steps per dispatch, sampler update fused
    into the segment program) must match the per-step loop for every segment
    length, including non-dividing ones (seg=3 over 4 steps)."""
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=4,
              guidance_scale=4.0, negative_prompt="blurry", seed=9)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    a = pipe(video, "add a hat", fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", str(seg))
    b = pipe(video, "add a hat", fused_sampling=False, **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)


def test_segmented_teacache_cfg_skip_matches_stepwise(pipe, video,
                                                      monkeypatch):
    """TeaCache + cfg-skip COMBINED cannot ride the one-program fused path
    (residual batch changes at the split) but the segmented path slices the
    residual between segments, exactly like the stepwise loop."""
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=6,
              guidance_scale=4.0, negative_prompt="blurry", seed=10,
              cfg_skip_ratio=0.5, enable_teacache=True,
              teacache_threshold=1e9,  # force skips after warmup
              teacache_skip_start_steps=2)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    a = pipe(video, "add a hat", **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", "2")
    b = pipe(video, "add a hat", **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)


def test_auto_segment_steps_bounds():
    from videocof_tpu.pipeline.fused_sampler import (auto_segment_steps,
                                                     estimate_step_seconds)
    # headline geometry: ~1.8 s/step -> many steps per segment
    assert auto_segment_steps(29640, False) == 8
    # 4x geometry with CFG: ~37 s/step -> one step per segment
    assert auto_segment_steps(107640, True) == 1
    # the wall model reproduces the measured 4x per-step time
    assert abs(estimate_step_seconds(107640, False) - 18.1) < 1.5


def test_fused_cfg_skip_matches_stepwise(pipe, video):
    """cfg-skip fuses as a static two-phase split (CFG steps then cond-only
    steps); it must match the stepwise cfg-skip loop."""
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=4,
              guidance_scale=4.0, negative_prompt="blurry", seed=6,
              cfg_skip_ratio=0.5)  # steps 0-1 CFG, steps 2-3 cond-only
    a = pipe(video, "add a hat", fused_sampling=False, **kw)
    b = pipe(video, "add a hat", fused_sampling=True, **kw)
    np.testing.assert_allclose(b.videos, a.videos, rtol=2e-3, atol=5e-3)
    # and cfg-skip genuinely changes the trajectory vs full CFG
    full = pipe(video, "add a hat", fused_sampling=True,
                source_frames=9, reasoning_frames=4, num_inference_steps=4,
                guidance_scale=4.0, negative_prompt="blurry", seed=6)
    assert np.abs(b.videos - full.videos).max() > 1e-4


def test_trajectory_auto_select_wall_model():
    """fused_sampling=None picks fused only when the whole trajectory fits
    the remote worker's program-kill window (model-size-aware)."""
    from videocof_tpu.configs import WAN21_T2V_1_3B, WAN21_T2V_14B
    from videocof_tpu.pipeline.fused_sampler import (auto_segment_steps,
                                                     estimate_step_seconds)

    # calibration points (BASELINE.md): 1.3B 1.80 s/step, 14B 9.97 s/step
    # at 29,640 tokens; 1.3B 17.8 s/step at 107,640
    assert abs(estimate_step_seconds(29640, False, WAN21_T2V_1_3B)
               - 1.8) < 0.2
    assert abs(estimate_step_seconds(29640, False, WAN21_T2V_14B)
               - 9.97) < 1.5
    assert abs(estimate_step_seconds(107640, False, WAN21_T2V_1_3B)
               - 17.8) < 1.5
    # 4-step 1.3B fits one program; 50-step CFG must not; the 14B gets
    # fewer steps per segment than the 1.3B
    assert 4 * estimate_step_seconds(29640, False, WAN21_T2V_1_3B) <= 45
    assert 50 * estimate_step_seconds(29640, True, WAN21_T2V_1_3B) > 45
    assert auto_segment_steps(29640, False, dit_cfg=WAN21_T2V_14B) < \
        auto_segment_steps(29640, False, dit_cfg=WAN21_T2V_1_3B)
