"""VACE control-to-video pipeline tests.

The reference snapshot has no VACE pipeline (its UI path is dangling), so
these pin our consumer surface: context layout [inactive | reactive | mask],
zero-init hint branch == plain t2v trajectory, control/context_scale
sensitivity (`videox_fun/models/wan_transformer3d_vace.py` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_dit_vace, wan_vae
from videocof_tpu.pipeline import VacePipeline
from videocof_tpu.pipeline.vace_pipeline import patchify_mask

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)
SC = VCFG.spatial_compression_ratio
VACE_IN = 2 * VCFG.z_dim + SC * SC


@pytest.fixture(scope="module")
def pipe():
    return VacePipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG),
        dit_cfg=DCFG,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG),
        vae_cfg=VCFG,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
        vace_params=wan_dit_vace.init_vace_params(
            jax.random.PRNGKey(3), DCFG, stride=2, vace_in_dim=VACE_IN),
        vace_stride=2,
    )


@pytest.fixture(scope="module")
def control():
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (1, 3, 9, 32, 32)).astype(np.float32)


def test_mask_patchify_layout():
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 2, (1, 1, 9, 32, 32)).astype(np.float32)
    out = np.asarray(patchify_mask(jnp.asarray(mask), SC, 3))
    assert out.shape == (1, SC * SC, 3, 32 // SC, 32 // SC)
    idx = np.clip(np.round((np.arange(3) + 0.5) * (9 / 3) - 0.5),
                  0, 8).astype(int)
    for t in range(3):
        for i in range(SC):
            for j in range(SC):
                np.testing.assert_array_equal(
                    out[0, i * SC + j, t],
                    mask[0, 0, idx[t], i::SC, j::SC])


def test_context_shape_and_mask_default(pipe, control):
    vctx = pipe.prepare_vace_context(control)
    # 3 latent frames, 4x4 latent grid, 2*z + sc^2 channels
    assert vctx.shape == (1, VACE_IN, 3, 32 // SC, 32 // SC)
    # default mask == all-ones: inactive half encodes black frames
    m = np.ones((1, 1, 9, 32, 32), np.float32)
    np.testing.assert_allclose(
        np.asarray(pipe.prepare_vace_context(control, m)),
        np.asarray(vctx), rtol=1e-5, atol=1e-5)


def test_zero_init_matches_t2v(pipe, control):
    """Zero-init before/after projections -> the control branch is a no-op
    (reference `wan_transformer3d_vace.py:36-41`): the VACE trajectory must
    reproduce the plain t2v trajectory for the same noise."""
    noise = jax.random.normal(jax.random.PRNGKey(11), (1, VCFG.z_dim, 3,
                                                       32 // SC, 32 // SC))
    a = pipe.control_to_video("a red cube rotating", control,
                              num_inference_steps=2, guidance_scale=1.0,
                              noise=noise, output_latents=True)
    b = pipe.text_to_video("a red cube rotating", height=32, width=32,
                           num_frames=9, num_inference_steps=2,
                           guidance_scale=1.0, noise=noise,
                           output_latents=True)
    np.testing.assert_allclose(a.latents, b.latents, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a.videos, b.videos, rtol=1e-4, atol=1e-4)


def test_control_and_scale_sensitivity(pipe, control):
    vp = dict(pipe.vace_params)
    vp["after_proj"] = {
        "kernel": 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), vp["after_proj"]["kernel"].shape),
        "bias": vp["after_proj"]["bias"],
    }
    # before_proj must be nonzero too, or the control input never enters
    # the chain (c = before_proj(c) + x)
    vp["before_proj"] = {
        "kernel": jnp.eye(DCFG.dim) * 0.1,
        "bias": vp["before_proj"]["bias"],
    }
    live = VacePipeline(
        dit_params=pipe.dit_params, dit_cfg=DCFG,
        vae_params=pipe.vae_params, vae_cfg=VCFG,
        t5_params=pipe.t5_params, t5_cfg=T5_TINY,
        dtype=jnp.float32, vace_params=vp, vace_stride=2)
    noise = jax.random.normal(jax.random.PRNGKey(12), (1, VCFG.z_dim, 3,
                                                       32 // SC, 32 // SC))
    kw = dict(num_inference_steps=2, guidance_scale=1.0, noise=noise,
              output_latents=True)
    a = live.control_to_video("a cube", control, **kw)
    other = np.roll(control, 5, axis=-1)
    b = live.control_to_video("a cube", other, **kw)
    assert np.abs(a.latents - b.latents).max() > 1e-6
    # context_scale=0 turns the hints off entirely
    z = live.control_to_video("a cube", control, context_scale=0.0, **kw)
    p = pipe.control_to_video("a cube", control, **kw)
    np.testing.assert_allclose(z.latents, p.latents, rtol=1e-5, atol=1e-5)


def test_cli_control_video(pipe, tmp_path, monkeypatch):
    """--control_video routes through VacePipeline.control_to_video."""
    import os
    import sys

    cv2 = pytest.importorskip("cv2")
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli

    path = str(tmp_path / "ctrl.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: pipe)
    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--control_video", path, "--prompt",
        "a dancing robot", "--output_dir", out_dir, "--num_frames", "9",
        "--random_init", "--num_inference_steps", "1"])
    cli.main()
    assert "gen_ctrl.mp4" in os.listdir(out_dir)


def test_cfg_and_mask_path(pipe, control):
    mask = np.zeros((1, 1, 9, 32, 32), np.float32)
    mask[..., 8:24, 8:24] = 1.0
    out = pipe.control_to_video("fill the region with fire", control,
                                mask=mask, num_inference_steps=2,
                                guidance_scale=3.0,
                                negative_prompt="static")
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()
    assert out.videos.min() >= 0.0 and out.videos.max() <= 1.0
