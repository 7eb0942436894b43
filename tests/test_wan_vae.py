"""Causal 3D VAE tests: shapes, causality, torch conv oracle, and
streaming-equivalence of the derived whole-sequence temporal resamples."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import VAE_TINY
from videocof_tpu.models import wan_vae

CFG = VAE_TINY


@pytest.fixture(scope="module")
def vae():
    return wan_vae.init_wan_vae(jax.random.PRNGKey(0), CFG)


def test_encode_decode_shapes(vae):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 32, 24))
    mu, lv = wan_vae.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.z_dim, 3, 4, 3)  # (9-1)/4+1=3, 32/8, 24/8
    assert lv.shape == mu.shape
    y = wan_vae.decode(vae, CFG, mu)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) <= 1.0  # decode clamps


def test_single_frame(vae):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 1, 16, 16))
    mu, _ = wan_vae.encode(vae, CFG, x)
    assert mu.shape == (1, CFG.z_dim, 1, 2, 2)
    y = wan_vae.decode(vae, CFG, mu)
    assert y.shape == x.shape


def test_encoder_causality(vae):
    # perturbing the last input frame must not change earlier latent frames
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 9, 16, 16))
    x2 = x.at[:, :, -1].add(1.0)
    a, _ = wan_vae.encode(vae, CFG, x)
    b, _ = wan_vae.encode(vae, CFG, x2)
    np.testing.assert_allclose(np.asarray(a[:, :, :-1]),
                               np.asarray(b[:, :, :-1]), atol=1e-5)
    assert np.abs(np.asarray(a[:, :, -1]) - np.asarray(b[:, :, -1])).max() > 1e-5


def test_decoder_causality(vae):
    z = jax.random.normal(jax.random.PRNGKey(4), (1, CFG.z_dim, 3, 4, 4))
    z2 = z.at[:, :, -1].add(1.0)
    a = wan_vae.decode(vae, CFG, z)
    b = wan_vae.decode(vae, CFG, z2)
    # first latent frame maps to output frame 0; later frames map to 4x
    np.testing.assert_allclose(np.asarray(a[:, :, :5]),
                               np.asarray(b[:, :, :5]), atol=1e-5)


def test_causal_conv3d_torch_oracle(vae):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 5, 6, 6)).astype(np.float32)
    kern = rng.standard_normal((8, 4, 3, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((8,)).astype(np.float32)
    p = {"kernel": jnp.asarray(kern), "bias": jnp.asarray(bias)}
    got = np.asarray(wan_vae.causal_conv3d(jnp.asarray(x), p))
    import torch.nn.functional as F
    xt = torch.from_numpy(x)
    xt = F.pad(xt, (1, 1, 1, 1, 2, 0))  # W, H, then causal T (left only)
    want = F.conv3d(xt, torch.from_numpy(kern), torch.from_numpy(bias))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


def _stream_downsample3d(x, time_kernel, time_bias):
    """Chunked-cache simulation of the reference 'downsample3d' time conv
    (`wan_vae.py:147-163`): first 1-frame chunk passes through and primes the
    cache; later chunks conv over [cache_last, chunk...] stride 2."""
    B, C, T, H, W = x.shape
    outs = [x[:, :, :1]]
    cache_last = x[:, :, 0:1]
    t = 1
    while t < T:
        chunk = x[:, :, t:t + 2]
        inp = np.concatenate([cache_last, chunk], axis=2)
        o = jax.lax.conv_general_dilated(
            jnp.asarray(inp), jnp.asarray(time_kernel), (2, 1, 1),
            ((0, 0), (0, 0), (0, 0)),
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        o = np.asarray(o) + time_bias[None, :, None, None, None]
        outs.append(o)
        cache_last = chunk[:, :, -1:]
        t += 2
    return np.concatenate(outs, axis=2)


def test_downsample3d_matches_streaming(vae):
    rng = np.random.default_rng(1)
    C = 8
    x = rng.standard_normal((1, C, 9, 4, 4)).astype(np.float32)
    kern = rng.standard_normal((C, C, 3, 1, 1)).astype(np.float32)
    bias = rng.standard_normal((C,)).astype(np.float32)
    # library op without the spatial half (feed identity spatial conv):
    head = x[:, :, :1]
    tail = np.asarray(wan_vae.conv3d(
        jnp.asarray(x), {"kernel": jnp.asarray(kern), "bias": jnp.asarray(bias)},
        stride=(2, 1, 1), padding=((0, 0), (0, 0), (0, 0))))
    got = np.concatenate([head, tail], axis=2)
    want = _stream_downsample3d(x, kern, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _stream_upsample3d(x, time_kernel, time_bias):
    """Frame-by-frame simulation of the reference 'upsample3d' ('Rep'
    sentinel) time conv (`wan_vae.py:107-141`)."""
    B, C, T, H, W = x.shape

    def tconv(inp):
        o = jax.lax.conv_general_dilated(
            jnp.asarray(inp), jnp.asarray(time_kernel), (1, 1, 1),
            ((0, 0), (0, 0), (0, 0)),
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        return np.asarray(o) + time_bias[None, :, None, None, None]

    outs = []
    cache = None  # 'Rep' sentinel: first frame primes it, passes untouched
    outs.append(x[:, :, 0:1])
    for t in range(1, T):
        frame = x[:, :, t:t + 1]
        if cache is None:
            inp = np.concatenate([np.zeros_like(frame), np.zeros_like(frame),
                                  frame], axis=2)
            new_cache = np.concatenate([np.zeros_like(frame), frame], axis=2)
        else:
            inp = np.concatenate([cache, frame], axis=2)
            new_cache = np.concatenate([cache[:, :, -1:], frame], axis=2)
        o = tconv(inp)  # [B, 2C, 1, H, W]
        o = o.reshape(B, 2, C, 1, H, W).transpose(0, 2, 3, 1, 4, 5)
        outs.append(o.reshape(B, C, 2, H, W))
        cache = new_cache
    return np.concatenate(outs, axis=2)


def test_upsample3d_matches_streaming():
    rng = np.random.default_rng(2)
    C = 4
    x = rng.standard_normal((1, C, 4, 3, 3)).astype(np.float32)
    kern = rng.standard_normal((2 * C, C, 3, 1, 1)).astype(np.float32)
    bias = rng.standard_normal((2 * C,)).astype(np.float32)
    # library full-seq op, without the spatial half
    z = jnp.asarray(x)[:, :, 1:]
    y = wan_vae.conv3d(z, {"kernel": jnp.asarray(kern),
                           "bias": jnp.asarray(bias)},
                       padding=((2, 0), (0, 0), (0, 0)))
    B, _, Tm1, H, W = y.shape
    y = np.asarray(y).reshape(B, 2, C, Tm1, H, W).transpose(0, 2, 3, 1, 4, 5)
    got = np.concatenate([x[:, :, :1], y.reshape(B, C, 2 * Tm1, H, W)], axis=2)
    want = _stream_upsample3d(x, kern, bias)
    assert got.shape == want.shape == (1, C, 7, 3, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_latent_normalization_applied(vae):
    # encode subtracts mean and multiplies 1/std; VAE_TINY uses mean 0, std 1,
    # so spot-check the wiring by overriding the config stats
    cfg2 = CFG.replace(latent_mean=(1.0,) * CFG.z_dim,
                       latent_std=(2.0,) * CFG.z_dim)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 5, 16, 16))
    a, _ = wan_vae.encode(vae, CFG, x)
    b, _ = wan_vae.encode(vae, cfg2, x)
    np.testing.assert_allclose(np.asarray((a - 1.0) * 0.5), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    # decode inverts the normalization: denorm(cfg2, b) == denorm(CFG, a) == a
    ya = wan_vae.decode(vae, CFG, a)
    yb = wan_vae.decode(vae, cfg2, b)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)
