"""Flux MMDiT tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import flux

CFG = flux.FLUX_TINY


@pytest.fixture(scope="module")
def setup():
    params = flux.init_flux(jax.random.PRNGKey(0), CFG)
    B, Li, Lt = 2, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Li, CFG.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, Lt, CFG.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(3),
                               (B, CFG.pooled_projection_dim))
    t = jnp.array([0.9, 0.4])
    img_ids = jnp.stack([jnp.zeros(Li), jnp.arange(Li) // 4,
                         jnp.arange(Li) % 4], axis=1)
    txt_ids = jnp.zeros((Lt, 3))
    return params, x, ctx, pooled, t, img_ids, txt_ids


def test_forward_shape(setup):
    params, x, ctx, pooled, t, img_ids, txt_ids = setup
    out = flux.flux_forward(params, CFG, x, ctx, pooled, t, img_ids, txt_ids)
    assert out.shape == (2, 16, CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_guidance_variant(setup):
    params, x, ctx, pooled, t, img_ids, txt_ids = setup
    cfg = CFG.replace(guidance_embeds=True)
    p2 = flux.init_flux(jax.random.PRNGKey(0), cfg)
    a = flux.flux_forward(p2, cfg, x, ctx, pooled, t, img_ids, txt_ids,
                          guidance=jnp.array([3.5, 3.5]))
    b = flux.flux_forward(p2, cfg, x, ctx, pooled, t, img_ids, txt_ids,
                          guidance=jnp.array([1.0, 1.0]))
    assert np.abs(np.asarray(a - b)).max() > 1e-5


def test_batch_independence(setup):
    params, x, ctx, pooled, t, img_ids, txt_ids = setup
    full = flux.flux_forward(params, CFG, x, ctx, pooled, t, img_ids, txt_ids)
    one = flux.flux_forward(params, CFG, x[1:], ctx[1:], pooled[1:], t[1:],
                            img_ids, txt_ids)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(one[0]),
                               rtol=3e-4, atol=3e-4)


def test_rope_position_sensitivity(setup):
    params, x, ctx, pooled, t, img_ids, txt_ids = setup
    a = flux.flux_forward(params, CFG, x, ctx, pooled, t, img_ids, txt_ids)
    img_ids2 = img_ids.at[:, 1].add(5)
    b = flux.flux_forward(params, CFG, x, ctx, pooled, t, img_ids2, txt_ids)
    assert np.abs(np.asarray(a - b)).max() > 1e-5


def test_rope_tables_shape():
    cos, sin = flux.rope_from_ids(CFG, jnp.zeros((10, 3)))
    assert cos.shape == (10, CFG.attention_head_dim // 2)
