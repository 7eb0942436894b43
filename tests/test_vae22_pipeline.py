"""Wan2.2 3.8-VAE (TI2V-5B layout) through the pipeline: the pipeline's VAE
dispatch must route encode/decode to `models/wan_vae22*` when vae_cfg is a
`Wan22VAEConfig` (reference `config/wan2.2/wan_civitai_5b.yaml:11-12` pairs
the 5B DiT with AutoencoderKLWan3_8 / Wan2.2_VAE.pth)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, WAN_TINY
from videocof_tpu.factory import is_vae22_dir
from videocof_tpu.models import t5_encoder, wan_dit
from videocof_tpu.models.wan_vae22 import WAN22_VAE_TINY, init_wan22_vae
from videocof_tpu.pipeline import WanPipeline

VCFG = WAN22_VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)
SC = VCFG.spatial_compression_ratio  # 16 (patchify 2 x three 2x stages)


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG),
        dit_cfg=DCFG,
        vae_params=init_wan22_vae(jax.random.PRNGKey(1), VCFG),
        vae_cfg=VCFG,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
    )


def test_t2v_through_vae22(pipe):
    out = pipe.text_to_video("a mountain lake", height=32, width=32,
                             num_frames=9, num_inference_steps=2,
                             guidance_scale=1.0)
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()
    assert out.videos.min() >= 0.0 and out.videos.max() <= 1.0


def test_cot_edit_through_vae22(pipe):
    """The edit path exercises vae_encode (streaming) + segment decode."""
    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    out = pipe(video, "remove the boat", source_frames=9,
               reasoning_frames=4, num_inference_steps=2)
    # condition 3 + ground 1 + target 3 latent frames
    assert out.ground_videos.shape == (1, 3, 1, 32, 32)
    assert out.edit_videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(out.videos).all()


def test_vae22_dir_detection(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    assert not is_vae22_dir(str(d))
    (d / "Wan2.2_VAE.pth").write_bytes(b"")
    assert is_vae22_dir(str(d))
    (d / "Wan2.1_VAE.pth").write_bytes(b"")
    assert not is_vae22_dir(str(d))  # 2.1 VAE present -> not the 5B layout
    assert not is_vae22_dir("")
