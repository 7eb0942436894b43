"""CogVideoX causal VAE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import cogvideox_vae as cv

CFG = cv.COGVIDEOX_VAE_TINY


@pytest.fixture(scope="module")
def vae():
    return cv.init_cogvideox_vae(jax.random.PRNGKey(0), CFG)


def test_encode_decode_shapes(vae):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 32, 32))
    mu, lv = cv.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.latent_channels, 3, 4, 4)  # 4x t, 8x s
    assert lv.shape == mu.shape
    y = cv.decode(vae, CFG, mu)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) <= 1.0


def test_single_frame(vae):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 1, 16, 16))
    mu, _ = cv.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.latent_channels, 1, 2, 2)
    y = cv.decode(vae, CFG, mu)
    assert y.shape == x.shape


def test_first_frame_replicate_padding():
    # causal conv with 'first' pad: a temporally-constant input stays
    # temporally constant through the conv (zeros padding would not)
    rng = np.random.default_rng(0)
    kern = rng.standard_normal((4, 3, 3, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    frame = rng.standard_normal((1, 3, 1, 8, 8)).astype(np.float32)
    x = jnp.asarray(np.repeat(frame, 5, axis=2))
    out = cv.causal_conv3d_first(x, {"kernel": jnp.asarray(kern),
                                     "bias": jnp.asarray(bias)})
    out = np.asarray(out)
    for t in range(1, 5):
        np.testing.assert_allclose(out[:, :, t], out[:, :, 0], atol=1e-5)


def test_temporal_downsample_formula():
    x = jnp.asarray(np.arange(9, dtype=np.float32))[None, None, :, None, None]
    x = jnp.broadcast_to(x, (1, 4, 9, 4, 4))
    p = {"kernel": jnp.zeros((4, 4, 3, 3)).at[
        jnp.arange(4), jnp.arange(4), 1, 1].set(1.0),
        "bias": jnp.zeros((4,))}
    out = cv._downsample(x, p, compress_time=True)
    # first frame kept, rest averaged in pairs: [0, 1.5, 3.5, 5.5, 7.5]
    got = np.asarray(out)[0, 0, :, 0, 0]
    np.testing.assert_allclose(got, [0, 1.5, 3.5, 5.5, 7.5], atol=1e-5)


def test_zq_conditioning_in_decoder(vae):
    z = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.latent_channels,
                                                  3, 4, 4))
    a = cv.decode(vae, CFG, z)
    # SpatialNorm conditions every decoder norm on zq; perturbing z changes
    # the output beyond what the conv path alone would (sanity: different z
    # -> different output, finite)
    b = cv.decode(vae, CFG, z * 0.5)
    assert np.abs(np.asarray(a - b)).max() > 1e-4


def test_group_norm_statistics():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 3, 4, 4))
    p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
    out = np.asarray(cv.group_norm(x, p, groups=4, eps=1e-6))
    # per batch & group: zero mean, unit variance over (C/G, T, H, W)
    g = out.reshape(2, 4, 2 * 3 * 4 * 4)
    np.testing.assert_allclose(g.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(g.var(-1), 1.0, atol=1e-4)
