"""Speech-to-video pipeline tests: audio-free trajectory == plain t2v,
audio sensitivity through the injector, CFG carries audio on both branches.
(The reference's own S2V path is broken in the snapshot — this surface is
ours; transformer-level parity lives in tests/test_s2v.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_dit_s2v, wan_vae
from videocof_tpu.pipeline import S2VPipeline

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)
SC = VCFG.spatial_compression_ratio
AUDIO_DIM = 16


@pytest.fixture(scope="module")
def pipe():
    return S2VPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG),
        dit_cfg=DCFG,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG),
        vae_cfg=VCFG,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
        s2v_params=wan_dit_s2v.init_s2v_params(
            jax.random.PRNGKey(3), DCFG, audio_dim=AUDIO_DIM,
            inject_layers=(0,)),
    )


def _noise(seed=11):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (1, VCFG.z_dim, 3, 32 // SC, 32 // SC))


def test_no_audio_matches_t2v(pipe):
    """With no audio (and zero-init injector output proj) the S2V
    trajectory equals the plain t2v trajectory."""
    n = _noise()
    a = pipe.speech_to_video("a person talking", None, height=32, width=32,
                             num_frames=9, num_inference_steps=2,
                             guidance_scale=1.0, noise=n,
                             output_latents=True)
    b = pipe.text_to_video("a person talking", height=32, width=32,
                           num_frames=9, num_inference_steps=2,
                           guidance_scale=1.0, noise=n, output_latents=True)
    np.testing.assert_allclose(a.latents, b.latents, rtol=2e-4, atol=2e-4)


def test_audio_drives_output_and_cfg_path(pipe):
    # wake the zero-init injector so audio has an effect
    s2v = jax.tree.map(lambda a: a, pipe.s2v_params)
    s2v["audio_injector"]["layers"][0]["o"]["kernel"] = \
        0.05 * jax.random.normal(jax.random.PRNGKey(5),
                                 (DCFG.dim, DCFG.dim))
    live = S2VPipeline(
        dit_params=pipe.dit_params, dit_cfg=DCFG,
        vae_params=pipe.vae_params, vae_cfg=VCFG,
        t5_params=pipe.t5_params, t5_cfg=T5_TINY, dtype=jnp.float32,
        s2v_params=s2v, inject_layers=(0,))
    rng = np.random.default_rng(0)
    au1 = rng.standard_normal((1, 3, AUDIO_DIM)).astype(np.float32)
    au2 = au1 + rng.standard_normal((1, 3, AUDIO_DIM)).astype(np.float32)
    n = _noise(12)
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=2,
              guidance_scale=1.0, noise=n, output_latents=True)
    a = live.speech_to_video("singing", au1, **kw)
    b = live.speech_to_video("singing", au2, **kw)
    assert np.abs(a.latents - b.latents).max() > 1e-6
    # CFG path runs and stays finite
    c = live.speech_to_video("singing", au1, height=32, width=32,
                             num_frames=9, num_inference_steps=2,
                             guidance_scale=3.0, negative_prompt="silent",
                             noise=n)
    assert c.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(c.videos).all()


def test_audio_alignment_validated(pipe):
    bad = np.zeros((1, 5, AUDIO_DIM), np.float32)  # 5 != 3 latent frames
    with pytest.raises(ValueError, match="align"):
        pipe.speech_to_video("x", bad, height=32, width=32, num_frames=9,
                             num_inference_steps=1)
