"""On-device I420 fetch packing (utils/colorspace.py) and its opt-in
pipeline hook (VIDEOCOF_FETCH_YUV420=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline
from videocof_tpu.utils import colorspace


def _smooth_video(B=1, T=2, H=16, W=16):
    """Low-frequency content: 4:2:0 chroma subsampling is near-lossless, so
    a roundtrip tests the coefficient matrices and the plane layout — a
    wrong matrix shifts colors, a wrong packing produces garbage."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r = 127.5 + 90 * np.sin(yy / H * 2.2)
    g = 127.5 + 90 * np.cos(xx / W * 1.7)
    b = 127.5 + 90 * np.sin((xx + yy) / (H + W) * 2.9)
    frame = np.stack([r, g, b])  # [3, H, W]
    vid = np.stack([frame + 5 * t for t in range(T)], axis=1)  # [3, T, H, W]
    return np.clip(np.round(vid), 0, 255).astype(np.uint8)[None]


def test_i420_roundtrip_near_lossless_on_smooth_content():
    u8 = _smooth_video()
    packed = np.asarray(colorspace.rgb_to_i420(jnp.asarray(u8)))
    B, C, T, H, W = u8.shape
    assert packed.shape == (B, T, H * 3 // 2, W)
    back = colorspace.i420_to_rgb01(packed)
    orig = u8.astype(np.float32) / 255.0
    # video-range Y/U/V quantization (220/225 levels) + 2x2 chroma pooling:
    # worst case a few levels on smooth content; garbage if layout/matrix
    # were wrong
    assert np.abs(back - orig).max() <= 10 / 255.0


def test_i420_luma_is_exact_up_to_rounding():
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (1, 3, 2, 16, 16), dtype=np.uint8)
    packed = np.asarray(colorspace.rgb_to_i420(jnp.asarray(u8)))
    x = u8.astype(np.float64)
    y_ref = 16.0 + (65.481 * x[:, 0] + 128.553 * x[:, 1]
                    + 24.966 * x[:, 2]) / 255.0
    np.testing.assert_allclose(packed[:, :, :16].astype(np.float64), y_ref,
                               atol=1.0)


def test_numpy_unpack_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (1, 3, 2, 16, 16), dtype=np.uint8)
    packed = np.asarray(colorspace.rgb_to_i420(jnp.asarray(u8)))
    via_cv2 = np.stack([
        cv2.cvtColor(packed[0, t], cv2.COLOR_YUV2RGB_I420).transpose(2, 0, 1)
        for t in range(packed.shape[1])], axis=1)[None] / 255.0
    # force the numpy fallback branch
    import unittest.mock as mock
    import builtins
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError(name)
        return real_import(name, *a, **k)

    with mock.patch.object(builtins, "__import__", side_effect=no_cv2):
        via_np = colorspace.i420_to_rgb01(packed)
    assert np.abs(via_np - via_cv2).max() <= 4 / 255.0


def test_yuv420_auto_selection_policy():
    """Transport-adaptive fetch (utils/transport.py): env override beats the
    measurement; auto engages below the slow-tunnel threshold; non-TPU
    platforms measure +inf and never auto-enable."""
    from videocof_tpu.utils import transport

    assert transport.should_fetch_yuv420("1", mbps=1000.0)
    assert not transport.should_fetch_yuv420("0", mbps=0.5)
    assert transport.should_fetch_yuv420(env_value="", mbps=5.0)
    assert not transport.should_fetch_yuv420(env_value="", mbps=50.0)
    transport._CACHE.clear()
    assert transport.measured_fetch_mbps() == float("inf")   # CPU here
    assert not transport.should_fetch_yuv420(env_value="")


def test_pipeline_auto_yuv420_on_slow_transport(monkeypatch):
    """With no env override and a (mocked) slow transport measurement, the
    decode fetch auto-selects I420 — output equals the explicit
    VIDEOCOF_FETCH_YUV420=1 path."""
    from videocof_tpu.utils import transport

    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(4), dcfg),
        dit_cfg=dcfg,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(5), vcfg),
        vae_cfg=vcfg,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(6), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
    )
    video = np.random.default_rng(1).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=6)
    monkeypatch.setenv("VIDEOCOF_FETCH_YUV420", "1")
    explicit = pipe(video, "remove the ball", **kw)
    monkeypatch.delenv("VIDEOCOF_FETCH_YUV420")
    monkeypatch.setattr(transport, "measured_fetch_mbps",
                        lambda *a, **k: 5.0)
    auto = pipe(video, "remove the ball", **kw)
    np.testing.assert_allclose(auto.videos, explicit.videos, atol=1e-6)


def test_pipeline_yuv420_fetch_matches_host_twin(monkeypatch):
    """The opt-in fetch path must equal pack+unpack applied to the default
    path's uint8 output (same seed -> identical latents -> identical u8)."""
    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg),
        dit_cfg=dcfg,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg),
        vae_cfg=vcfg,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
    )
    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=5)
    base = pipe(video, "remove the ball", **kw)
    monkeypatch.setenv("VIDEOCOF_FETCH_YUV420", "1")
    yuv = pipe(video, "remove the ball", **kw)
    assert yuv.videos.shape == base.videos.shape
    u8 = np.round(base.videos * 255.0).astype(np.uint8)
    expected = colorspace.i420_to_rgb01(
        np.asarray(colorspace.rgb_to_i420(jnp.asarray(u8))))
    np.testing.assert_allclose(yuv.videos, expected, atol=1e-6)
    # and the chroma loss stays bounded even on noise-like content
    assert np.abs(yuv.videos - base.videos).mean() < 0.08


def test_i420_upload_device_matches_host():
    """The device-side I420 -> RGB[-1,1] (the h2d upload twin) agrees with
    the host reconstruction `i420_to_rgb01` exactly (same BT.601 math)."""
    import jax.numpy as jnp

    from videocof_tpu.utils.colorspace import (i420_to_rgb01,
                                               i420_to_rgbm11_jax)
    rng = np.random.default_rng(0)
    i420 = rng.integers(0, 256, (1, 3, 12, 8), dtype=np.uint8)  # H=8, W=8
    dev = np.asarray(i420_to_rgbm11_jax(jnp.asarray(i420)))
    assert dev.shape == (1, 3, 3, 8, 8)

    # the documented formula twin (the numpy fallback in i420_to_rgb01):
    # nearest-neighbour chroma upsample + studio-swing BT.601
    H = 8
    y = i420[:, :, :H].astype(np.float32)
    u = i420[:, :, H:H + H // 4].reshape(1, 3, H // 2, 4)
    v = i420[:, :, H + H // 4:].reshape(1, 3, H // 2, 4)
    u = u.repeat(2, axis=2).repeat(2, axis=3).astype(np.float32) - 128.0
    v = v.repeat(2, axis=2).repeat(2, axis=3).astype(np.float32) - 128.0
    c = 1.164 * (y - 16.0)
    want = np.clip(np.stack([c + 1.596 * v, c - 0.391 * u - 0.813 * v,
                             c + 2.018 * u], axis=1), 0, 255)
    np.testing.assert_allclose(dev, want / 255.0 * 2.0 - 1.0, atol=1e-5)

    # cv2's fixed-point host path agrees for in-gamut video (saturated
    # random chroma clips differently); smoke-level agreement only
    host01 = i420_to_rgb01(i420)
    assert np.abs(dev - (host01 * 2.0 - 1.0)).mean() < 2e-2


def test_pipeline_accepts_i420_input():
    """A CoT edit fed codec-native I420 planes equals the same edit fed the
    host-reconstructed RGB video (both fused-prep and fallback paths)."""
    import jax
    import jax.numpy as jnp

    from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
    from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.utils.colorspace import i420_to_rgb01

    VCFG = VAE_TINY
    DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)
    rng = np.random.default_rng(3)
    i420 = rng.integers(0, 256, (1, 9, 48, 32), dtype=np.uint8)  # H=32 W=32
    rgb = i420_to_rgb01(i420) * 2.0 - 1.0

    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=5, fused_sampling=False)
    a = pipe(i420, "p", **kw)
    b = pipe(rgb.astype(np.float32), "p", **kw)
    np.testing.assert_allclose(a.videos, b.videos, atol=1.01 / 255)
