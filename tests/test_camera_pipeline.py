"""Camera-control pipeline tests: temporal packing, adapter converter,
and the camera_to_video consumer (the reference wires `control_adapter`
into the DiT but ships no pipeline that feeds it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import camera_adapter as ca
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import CameraPipeline
from videocof_tpu.pipeline.camera_pipeline import (
    convert_camera_adapter_state_dict, pack_camera_frames)

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


def _pose_rows(n=9):
    rows = []
    for i in range(n):
        w2c = np.eye(4)[:3].copy()
        w2c[0, 3] = 0.05 * i  # slow truck right
        rows.append([float(i), 0.8, 0.9, 0.5, 0.5, 0.0, 0.0,
                     *w2c.reshape(-1).tolist()])
    return rows


@pytest.fixture(scope="module")
def pipe():
    return CameraPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG),
        dit_cfg=DCFG,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG),
        vae_cfg=VCFG,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
        camera_params=ca.init_camera_adapter(
            jax.random.PRNGKey(3), in_dim=6 * 4, out_dim=DCFG.dim),
    )


def test_pack_camera_frames_layout():
    rng = np.random.default_rng(0)
    rays = rng.standard_normal((1, 6, 9, 8, 8)).astype(np.float32)
    out = np.asarray(pack_camera_frames(jnp.asarray(rays), 4))
    assert out.shape == (1, 24, 3, 8, 8)
    # latent frame 0 = pixel frame 0 repeated 4x in the channel groups
    for g in range(4):
        np.testing.assert_array_equal(out[0, g * 6:(g + 1) * 6, 0],
                                      rays[0, :, 0])
    # latent frame 1 = pixel frames 1..4 folded into channel groups
    for g in range(4):
        np.testing.assert_array_equal(out[0, g * 6:(g + 1) * 6, 1],
                                      rays[0, :, 1 + g])


def test_converter_roundtrip():
    params = ca.init_camera_adapter(jax.random.PRNGKey(5), in_dim=24,
                                    out_dim=32, num_residual_blocks=2)
    sd = {"control_adapter.conv.weight": np.asarray(params["conv"]["kernel"]),
          "control_adapter.conv.bias": np.asarray(params["conv"]["bias"])}
    for i, rb in enumerate(params["res"]):
        for name in ("conv1", "conv2"):
            sd[f"control_adapter.residual_blocks.{i}.{name}.weight"] = \
                np.asarray(rb[name]["kernel"])
            sd[f"control_adapter.residual_blocks.{i}.{name}.bias"] = \
                np.asarray(rb[name]["bias"])
    got = convert_camera_adapter_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 24, 2, 32, 32))
    np.testing.assert_allclose(
        np.asarray(ca.camera_adapter_forward(got, x)),
        np.asarray(ca.camera_adapter_forward(params, x)),
        rtol=1e-6, atol=1e-6)


def test_camera_to_video_and_sensitivity(pipe):
    noise = jax.random.normal(jax.random.PRNGKey(11),
                              (1, VCFG.z_dim, 3, 4, 4))
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=2,
              guidance_scale=1.0, noise=noise, output_latents=True)
    a = pipe.camera_to_video("a room flythrough", _pose_rows(), **kw)
    assert a.videos.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(a.videos).all()
    # a different trajectory changes the result
    rows2 = _pose_rows()
    for i, r in enumerate(rows2):
        r[10] = 0.2 * i  # 4x faster truck motion
    b = pipe.camera_to_video("a room flythrough", rows2, **kw)
    assert np.abs(a.latents - b.latents).max() > 1e-6
    # zeroed adapter == plain t2v
    zero_cam = jax.tree.map(jnp.zeros_like, pipe.camera_params)
    zp = CameraPipeline(
        dit_params=pipe.dit_params, dit_cfg=DCFG,
        vae_params=pipe.vae_params, vae_cfg=VCFG,
        t5_params=pipe.t5_params, t5_cfg=T5_TINY, dtype=jnp.float32,
        camera_params=zero_cam)
    z = zp.camera_to_video("a room flythrough", _pose_rows(), **kw)
    t = pipe.text_to_video("a room flythrough", height=32, width=32,
                           num_frames=9, num_inference_steps=2,
                           guidance_scale=1.0, noise=noise,
                           output_latents=True)
    np.testing.assert_allclose(z.latents, t.latents, rtol=2e-4, atol=2e-4)


def test_frame_count_validated(pipe):
    with pytest.raises(ValueError, match="latent frames"):
        pipe.camera_to_video("x", _pose_rows(5), height=32, width=32,
                             num_frames=9, num_inference_steps=1,
                             guidance_scale=1.0)


def test_pack_camera_frames_alignment_validated():
    """(F-1) % tc != 0 fails up front with an actionable message instead of
    an opaque reshape error deep inside prepare_camera_features."""
    import jax.numpy as jnp
    from videocof_tpu.pipeline.camera_pipeline import pack_camera_frames
    with pytest.raises(ValueError, match="pose rows"):
        pack_camera_frames(jnp.zeros((1, 6, 80, 4, 4)), tc=4)
    # aligned counts still pack
    out = pack_camera_frames(jnp.zeros((1, 6, 81, 4, 4)), tc=4)
    assert out.shape == (1, 24, 21, 4, 4)
