"""Generation pipelines for the non-Wan families: DDIM scheduler semantics
and tiny end-to-end runs (CogVideoX t2v, QwenImage t2i, Flux latents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videocof_tpu.models import cogvideox as cog
from videocof_tpu.models import cogvideox_vae as cvae
from videocof_tpu.models import flux as flux_lib
from videocof_tpu.models import qwenimage as qwen_lib
from videocof_tpu.pipeline import (CogVideoXPipeline, FluxPipeline,
                                   QwenImagePipeline, calculate_mu_shift)
from videocof_tpu.schedulers import DDIMScheduler, get_scheduler


# --------------------------------------------------------------------- DDIM

def test_ddim_schedule_properties():
    s = get_scheduler("ddim")
    ts = s.set_timesteps(50)
    # trailing spacing ends at 999, strictly decreasing, 50 entries
    assert ts[0] == 999 and len(ts) == 50
    assert np.all(np.diff(ts) < 0)
    # zero terminal SNR: alpha_bar at the last train step is exactly 0
    assert s.alphas_cumprod[-1] == 0.0
    # alpha_bar decreasing in t
    assert np.all(np.diff(s.alphas_cumprod) < 0)


def test_ddim_step_vpred_identity():
    """With v = (sqrt_a x - x0)/... the v-prediction inversion must
    reconstruct x0/eps: stepping from a sample built from known (x0, eps)
    lands exactly on sqrt(a_prev) x0 + sqrt(1-a_prev) eps."""
    s = DDIMScheduler()
    s.set_timesteps(4)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
    i = 1  # t=749
    sa, s1a, sap, s1ap = s._coeffs[i]
    sample = float(sa) * x0 + float(s1a) * eps
    v = float(sa) * eps - float(s1a) * x0
    prev, _ = s.step(v, i, sample, s.init_state(sample))
    expect = float(sap) * x0 + float(s1ap) * eps
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expect),
                               atol=1e-5)
    # the fused plan computes the same update as the stepwise form
    plan = s.plan_arrays()
    fused = plan["c_x"][i] * np.asarray(sample) + \
        plan["c_v"][i] * np.asarray(v)
    np.testing.assert_allclose(fused, np.asarray(prev), atol=1e-5)


def test_mu_shift_endpoints():
    assert calculate_mu_shift(256) == pytest.approx(0.5)
    assert calculate_mu_shift(4096) == pytest.approx(1.15)


# ----------------------------------------------------------------- CogVideoX

def test_cogvideox_pipeline_e2e():
    dcfg = cog.COGVIDEOX_TINY.replace(use_rotary_positional_embeddings=True)
    vcfg = cvae.COGVIDEOX_VAE_TINY
    assert dcfg.in_channels == vcfg.latent_channels
    pipe = CogVideoXPipeline(
        cog.init_cogvideox(jax.random.PRNGKey(0), dcfg), dcfg,
        cvae.init_cogvideox_vae(jax.random.PRNGKey(1), vcfg), vcfg)
    rng = np.random.default_rng(2)
    txt = jnp.asarray(rng.standard_normal(
        (1, 8, dcfg.text_embed_dim)), jnp.float32)
    neg = jnp.zeros_like(txt)
    out = pipe(txt, neg, height=16, width=16, num_frames=9,
               num_inference_steps=2, guidance_scale=6.0, seed=3)
    assert out.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
    # seeded determinism
    out2 = pipe(txt, neg, height=16, width=16, num_frames=9,
                num_inference_steps=2, guidance_scale=6.0, seed=3)
    np.testing.assert_array_equal(out, out2)


# ----------------------------------------------------------------- QwenImage

def test_qwenimage_pipeline_latents_and_cfg():
    # out_channels * patch_size^2 must equal in_channels for the sampling
    # loop to close (real config: 16 * 4 == 64); the parity-test tiny
    # config doesn't need that, so adjust here
    cfg = qwen_lib.QWENIMAGE_TINY.replace(out_channels=2)
    pipe = QwenImagePipeline(
        qwen_lib.init_qwenimage(jax.random.PRNGKey(0), cfg), cfg)
    rng = np.random.default_rng(4)
    txt = jnp.asarray(rng.standard_normal(
        (1, 5, cfg.joint_attention_dim)), jnp.float32)
    neg = jnp.zeros_like(txt)
    z = pipe(txt, neg, height=64, width=96, num_inference_steps=2,
             true_cfg_scale=4.0, seed=1)
    assert z.shape == (1, cfg.in_channels // 4, 8, 12)
    assert np.isfinite(z).all()
    # CFG actually changes the trajectory
    z_nocfg = pipe(txt, None, height=64, width=96, num_inference_steps=2,
                   true_cfg_scale=1.0, seed=1)
    assert np.abs(z - z_nocfg).max() > 1e-6


# ---------------------------------------------------------------------- Flux

@pytest.mark.parametrize("guidance_embeds", [False, True])
def test_flux_pipeline_latents(guidance_embeds):
    cfg = flux_lib.FLUX_TINY.replace(guidance_embeds=guidance_embeds)
    pipe = FluxPipeline(flux_lib.init_flux(jax.random.PRNGKey(0), cfg), cfg)
    rng = np.random.default_rng(5)
    txt = jnp.asarray(rng.standard_normal(
        (1, 4, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_projection_dim)), jnp.float32)
    z = pipe(txt, pooled, height=64, width=96, num_inference_steps=2,
             guidance=3.5, seed=2)
    assert z.shape == (1, cfg.in_channels // 4, 8, 12)
    assert np.isfinite(z).all()
    # decode_fn hook
    pipe2 = FluxPipeline(pipe.dit_params, cfg,
                         decode_fn=lambda zz: zz * 2.0)
    z2 = pipe2(txt, pooled, height=64, width=96, num_inference_steps=2,
               guidance=3.5, seed=2)
    np.testing.assert_allclose(z2, z * 2.0, atol=1e-6)


def test_cogvideox_fused_trajectory_equals_stepwise():
    dcfg = cog.COGVIDEOX_TINY.replace(use_rotary_positional_embeddings=True)
    vcfg = cvae.COGVIDEOX_VAE_TINY
    pipe = CogVideoXPipeline(
        cog.init_cogvideox(jax.random.PRNGKey(0), dcfg), dcfg,
        cvae.init_cogvideox_vae(jax.random.PRNGKey(1), vcfg), vcfg)
    rng = np.random.default_rng(6)
    txt = jnp.asarray(rng.standard_normal(
        (1, 8, dcfg.text_embed_dim)), jnp.float32)
    neg = jnp.zeros_like(txt)
    kw = dict(height=16, width=16, num_frames=9, num_inference_steps=3,
              guidance_scale=6.0, seed=7)
    step = pipe(txt, neg, fused=False, **kw)
    fused = pipe(txt, neg, fused=True, **kw)
    np.testing.assert_allclose(fused, step, atol=1e-4, rtol=1e-4)


def test_ddim_non_divisor_step_count_terminates():
    """30 steps (1000 % 30 != 0): float-stride trailing spacing must end
    near t=0 and the final step must land on alpha_bar_prev = 1 (diffusers'
    prev_timestep < 0 branch) — an integer stride would leave timestep-9
    noise in the output."""
    s = DDIMScheduler()
    ts = s.set_timesteps(30)
    assert ts[0] == 999 and ts[-1] <= 33
    sa_prev = s._coeffs[-1][2]
    assert sa_prev == 1.0  # terminal step denoises completely


def test_qwenimage_pipeline_vae_decode_branch():
    """With VAE params attached, the pipeline decodes the unpacked latents
    through the Wan-VAE single-frame path to an image in [0, 1]."""
    from videocof_tpu.configs import VAE_TINY
    from videocof_tpu.models import wan_vae

    cfg = qwen_lib.QWENIMAGE_TINY.replace(in_channels=4 * VAE_TINY.z_dim,
                                          out_channels=VAE_TINY.z_dim)
    pipe = QwenImagePipeline(
        qwen_lib.init_qwenimage(jax.random.PRNGKey(0), cfg), cfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY), VAE_TINY)
    rng = np.random.default_rng(8)
    txt = jnp.asarray(rng.standard_normal(
        (1, 5, cfg.joint_attention_dim)), jnp.float32)
    img = pipe(txt, None, height=32, width=32, num_inference_steps=2,
               true_cfg_scale=1.0, seed=9)
    assert img.shape == (1, 3, 32, 32)
    assert np.isfinite(img).all() and 0.0 <= img.min() and img.max() <= 1.0
