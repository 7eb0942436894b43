"""Streaming VAE must match the whole-sequence VAE exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import VAE_TINY
from videocof_tpu.models import wan_vae, wan_vae_streaming

CFG = VAE_TINY


@pytest.fixture(scope="module")
def vae():
    return wan_vae.init_wan_vae(jax.random.PRNGKey(0), CFG)


@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_encode_streaming_matches_full(vae, chunk):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 13, 16, 16))
    mu_f, lv_f = wan_vae.encode(vae, CFG, x)
    mu_s, lv_s = wan_vae_streaming.encode_streaming(vae, CFG, x,
                                                    chunk_latent=chunk)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_f),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk", [1, 3, 4])  # 3 exercises the remainder path
def test_decode_streaming_matches_full(vae, chunk):
    z = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.z_dim, 5, 2, 2))
    full = wan_vae.decode(vae, CFG, z)
    stream = wan_vae_streaming.decode_streaming(vae, CFG, z,
                                                chunk_latent=chunk)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_decode_streaming_chunks_generator_matches(vae):
    """The chunk generator (the overlapped-readback path used by
    WanPipeline.decode_to_numpy01) concatenates to exactly the
    decode_streaming result pre-clip."""
    z = jax.random.normal(jax.random.PRNGKey(7), (1, CFG.z_dim, 5, 2, 2))
    whole = wan_vae_streaming.decode_streaming(vae, CFG, z, chunk_latent=2)
    chunks = list(wan_vae_streaming.decode_streaming_chunks(
        vae, CFG, z, chunk_latent=2))
    assert len(chunks) == 3  # init(1) + step(2) + step(2)
    cat = jnp.clip(jnp.concatenate(chunks, axis=2), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(cat), np.asarray(whole), atol=1e-6)


@pytest.mark.parametrize("T,chunk", [(1, 2), (5, 2), (6, 2), (5, 3)])
def test_fused_decode_matches_streaming_u8(vae, T, chunk):
    """The one-program fused decode (init + scan + remainder + uint8) must
    equal the generator path followed by the pipeline's uint8 conversion
    EXACTLY — same chunking, same math, only fewer dispatches."""
    z = jax.random.normal(jax.random.PRNGKey(11), (1, CFG.z_dim, T, 2, 2))
    ref = wan_vae_streaming.decode_streaming(vae, CFG, z, chunk_latent=chunk)
    ref_u8 = np.asarray(jnp.clip(
        jnp.round(ref.astype(jnp.float32) * 127.5 + 127.5), 0, 255
    ).astype(jnp.uint8))
    fn = wan_vae_streaming.make_fused_decode_fn(CFG, T, chunk_latent=chunk)
    got = np.asarray(jax.jit(fn)(vae, z))
    assert got.dtype == np.uint8 and got.shape == ref_u8.shape
    np.testing.assert_array_equal(got, ref_u8)


def test_fused_decode_pixel_mode_matches_full(vae):
    z = jax.random.normal(jax.random.PRNGKey(12), (1, CFG.z_dim, 5, 2, 2))
    fn = wan_vae_streaming.make_fused_decode_fn(CFG, 5, chunk_latent=2,
                                                to_uint8=False)
    got = jax.jit(fn)(vae, z)
    full = wan_vae.decode(vae, CFG, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_streaming_jit_cache_reused(vae):
    cache = {}
    z = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.z_dim, 3, 2, 2))
    a = wan_vae_streaming.decode_streaming(vae, CFG, z, jit_cache=cache)
    n = len(cache)
    b = wan_vae_streaming.decode_streaming(vae, CFG, z, jit_cache=cache)
    assert len(cache) == n  # same functions reused
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_roundtrip_through_streaming(vae):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 9, 16, 16))
    mu, _ = wan_vae_streaming.encode_streaming(vae, CFG, x)
    y = wan_vae_streaming.decode_streaming(vae, CFG, mu)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("chunk", [2, 4])
def test_encode_streaming_fused_matches(vae, chunk):
    """The one-program fused encode (VIDEOCOF_ENCODE_FUSED, default) is the
    chunked streaming encode traced inline — same math, one dispatch."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 13, 16, 16))
    mu_s, lv_s = wan_vae_streaming.encode_streaming(vae, CFG, x,
                                                    chunk_latent=chunk)
    cache = {}
    mu_f, lv_f = wan_vae_streaming.encode_streaming_fused(
        vae, CFG, x, jit_cache=cache, chunk_latent=chunk)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_s),
                               rtol=1e-5, atol=1e-5)
    # executable cached per geometry
    assert any(k[0] == "enc_fused" for k in cache)
    mu_f2, _ = wan_vae_streaming.encode_streaming_fused(
        vae, CFG, x, jit_cache=cache, chunk_latent=chunk)
    np.testing.assert_array_equal(np.asarray(mu_f2), np.asarray(mu_f))


@pytest.mark.parametrize("T,chunk", [(5, 2), (6, 4), (1, 2)])
def test_decode_streaming_u8_matches(vae, T, chunk):
    """The one-dispatch-per-chunk device-u8 decode (scale/slice/decode/clip/
    uint8 all in-program) equals uint8(clip(decode_streaming)) exactly."""
    z = jax.random.normal(jax.random.PRNGKey(4), (1, CFG.z_dim, T, 2, 2))
    want = np.clip(np.round(np.clip(np.asarray(
        wan_vae_streaming.decode_streaming(vae, CFG, z, chunk_latent=chunk)),
        -1, 1) * 127.5 + 127.5), 0, 255).astype(np.uint8)
    got = np.asarray(wan_vae_streaming.decode_streaming_u8(
        vae, CFG, z, jit_cache={}, chunk_latent=chunk))
    assert got.dtype == np.uint8 and got.shape == want.shape
    # identical math; only rounding-boundary values may flip one u8 step
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
    assert (got != want).mean() < 1e-3


def test_decode_streaming_u8_shared_cache_chunk_switch(vae):
    """A second decode with a different chunk_latent through the SAME
    jit_cache must compile its own step/rem programs (the guard used to key
    on the chunk-independent init entry and KeyError'd)."""
    z = jax.random.normal(jax.random.PRNGKey(5), (1, CFG.z_dim, 5, 2, 2))
    cache = {}
    a = np.asarray(wan_vae_streaming.decode_streaming_u8(
        vae, CFG, z, jit_cache=cache, chunk_latent=2))
    b = np.asarray(wan_vae_streaming.decode_streaming_u8(
        vae, CFG, z, jit_cache=cache, chunk_latent=4))
    np.testing.assert_array_equal(a, b)


def test_decode_streaming_u8_bf16_compute_matches(vae):
    """The PIPELINE calls decode_streaming_u8 with compute_dtype=bf16
    (pipe dtype); pin that path against the fp32 streaming decode with a
    bf16-grade u8 tolerance (advisor round-4: it was previously untested)."""
    import jax.numpy as jnp
    z = jax.random.normal(jax.random.PRNGKey(9), (1, CFG.z_dim, 5, 2, 2))
    want = np.clip(np.round(np.clip(np.asarray(
        wan_vae_streaming.decode_streaming(vae, CFG, z, chunk_latent=2)),
        -1, 1) * 127.5 + 127.5), 0, 255).astype(np.uint8)
    got = np.asarray(wan_vae_streaming.decode_streaming_u8(
        vae, CFG, z, jit_cache={}, chunk_latent=2,
        compute_dtype=jnp.bfloat16))
    assert got.dtype == np.uint8 and got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 12, diff.max()     # bf16 rounding, not a scale bug
    assert diff.mean() < 1.0, diff.mean()
