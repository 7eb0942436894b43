"""Image-to-video end-to-end surface (`WanPipeline.image_to_video`).

The i2v DiT branch (channel-concat y + CLIP MLPProj tokens,
`wan_transformer3d.py:339-393,551-563,866-867,944-946`) and the
`get_image_to_video_latent` builder are oracle-matched individually
(test_reference_parity.py); this file pins the surface that CONSUMES them:
conditioning assembly (Wan-i2v mask fold + VAE mode), the fused i2v
trajectory, and determinism/shape contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline

VCFG = VAE_TINY
# i2v channel layout: z (latents) + 4 (mask track) + z (conditioning video)
DCFG = WAN_TINY.replace(model_type="i2v", in_dim=2 * VCFG.z_dim + 4,
                        out_dim=VCFG.z_dim, text_dim=T5_TINY.dim)

H = W = 32
FRAMES = 9


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def start_image():
    return np.random.default_rng(0).integers(
        0, 256, (H, W, 3)).astype(np.uint8)


def test_i2v_conditioning_layout(pipe, start_image):
    """y = [4-ch keep-mask | z-ch VAE mode]: frame-0 keep flag repeated
    through the temporal fold, later frames free."""
    from videocof_tpu.utils import video_io as vio
    video01, mask255, clip_img = vio.get_image_to_video_latent(
        start_image, None, FRAMES, (H, W))
    y = pipe.prepare_i2v_conditioning(video01, mask255)
    Tl = (FRAMES - 1) // 4 + 1
    assert y.shape == (1, 4 + VCFG.z_dim, Tl, H // 8, W // 8)
    msk = np.asarray(y[:, :4])
    # first latent frame: all 4 folded pixel frames conditioned
    np.testing.assert_array_equal(msk[0, :, 0], 1.0)
    # later latent frames: free
    np.testing.assert_array_equal(msk[0, :, 1:], 0.0)
    np.testing.assert_array_equal(np.asarray(clip_img), start_image)


def test_i2v_generates_finite_video(pipe, start_image):
    clip_fea = np.random.default_rng(1).standard_normal(
        (1, 257, 1280)).astype(np.float32)
    out = pipe.image_to_video(
        start_image, "make the scene move", num_frames=FRAMES, height=H,
        width=W, num_inference_steps=2, guidance_scale=1.0,
        max_sequence_length=16, clip_fea=clip_fea, output_latents=True)
    assert out.videos.shape == (1, 3, FRAMES, H, W)
    assert np.isfinite(out.videos).all() and np.isfinite(out.latents).all()
    # the fused i2v trajectory compiled a geometry cache entry
    assert any(isinstance(k, tuple) and k and k[0] == "i2v_fused"
               for k in pipe._jit_cache)


def test_i2v_cfg_and_determinism(pipe, start_image):
    clip_fea = np.random.default_rng(1).standard_normal(
        (1, 257, 1280)).astype(np.float32)
    kw = dict(num_frames=FRAMES, height=H, width=W, num_inference_steps=2,
              guidance_scale=3.0, negative_prompt="blurry",
              max_sequence_length=16, clip_fea=clip_fea, seed=4)
    a = pipe.image_to_video(start_image, "animate", **kw)
    b = pipe.image_to_video(start_image, "animate", **kw)
    np.testing.assert_array_equal(a.videos, b.videos)
    # conditioning matters: a different start image changes the output
    other = np.random.default_rng(9).integers(
        0, 256, (H, W, 3)).astype(np.uint8)
    c = pipe.image_to_video(other, "animate", **kw)
    assert np.abs(c.videos - a.videos).max() > 1e-3


def test_i2v_clip_tokens_change_output(pipe, start_image):
    """CLIP image tokens flow through the dual-K/V cross-attention — a
    different clip_fea must change the result (plumbing proof)."""
    rng = np.random.default_rng(2)
    f1 = rng.standard_normal((1, 257, 1280)).astype(np.float32)
    f2 = rng.standard_normal((1, 257, 1280)).astype(np.float32)
    kw = dict(num_frames=FRAMES, height=H, width=W, num_inference_steps=1,
              guidance_scale=1.0, max_sequence_length=16, seed=5)
    a = pipe.image_to_video(start_image, "animate", clip_fea=f1, **kw)
    b = pipe.image_to_video(start_image, "animate", clip_fea=f2, **kw)
    assert np.abs(a.videos - b.videos).max() > 1e-4


def test_i2v_rejects_multi_prompt(pipe, start_image):
    """image_to_video conditions on ONE start image; a multi-prompt batch
    would mismatch context rows against the latent batch — reject loudly."""
    with pytest.raises(ValueError, match="one prompt"):
        pipe.image_to_video(start_image, ["a", "b"], num_frames=FRAMES,
                            height=H, width=W, num_inference_steps=1,
                            guidance_scale=1.0)
