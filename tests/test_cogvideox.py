"""CogVideoX transformer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import cogvideox as cg

CFG = cg.COGVIDEOX_TINY


@pytest.fixture(scope="module")
def setup():
    params = cg.init_cogvideox(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, CFG.in_channels,
                                                  8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, CFG.max_text_seq_length,
                             CFG.text_embed_dim))
    t = jnp.array([999.0, 250.0])
    return params, x, ctx, t


def test_forward_shapes_sincos(setup):
    params, x, ctx, t = setup
    out = cg.cogvideox_forward(params, CFG, x, ctx, t)
    assert out.shape == (2, 3, CFG.out_channels, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_rope_variant(setup):
    params, x, ctx, t = setup
    cfg = CFG.replace(use_rotary_positional_embeddings=True)
    out = cg.cogvideox_forward(params, cfg, x, ctx, t)
    assert out.shape == (2, 3, CFG.out_channels, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_independence(setup):
    params, x, ctx, t = setup
    full = cg.cogvideox_forward(params, CFG, x, ctx, t)
    one = cg.cogvideox_forward(params, CFG, x[1:], ctx[1:], t[1:])
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(one[0]),
                               rtol=2e-4, atol=2e-4)


def test_text_conditioning_matters(setup):
    params, x, ctx, t = setup
    a = cg.cogvideox_forward(params, CFG, x, ctx, t)
    b = cg.cogvideox_forward(params, CFG, x, ctx * 0.5, t)
    assert np.abs(np.asarray(a - b)).max() > 1e-5


def test_timestep_matters(setup):
    params, x, ctx, t = setup
    a = cg.cogvideox_forward(params, CFG, x, ctx, t)
    b = cg.cogvideox_forward(params, CFG, x, ctx, t * 0.5)
    assert np.abs(np.asarray(a - b)).max() > 1e-4


def test_sincos_pos_embed_structure():
    pe = cg.get_3d_sincos_pos_embed(16, (2, 3), 4, 1.0, 1.0)
    assert pe.shape == (4, 6, 16)
    # temporal part varies over T only, spatial over HW only
    assert np.allclose(pe[0, 0, 4:], pe[1, 0, 4:])   # spatial same across T
    assert np.allclose(pe[0, 0, :4], pe[0, 1, :4])   # temporal same across HW
    assert not np.allclose(pe[0, 0, :4], pe[1, 0, :4])


def test_15_patch_size_t():
    cfg = CFG.replace(patch_size_t=2, use_rotary_positional_embeddings=True)
    params = cg.init_cogvideox(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.in_channels,
                                                  8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.max_text_seq_length, cfg.text_embed_dim))
    out = cg.cogvideox_forward(params, cfg, x, ctx, jnp.array([500.0]))
    assert out.shape == (1, 4, cfg.out_channels, 8, 8)
