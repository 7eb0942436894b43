"""QwenImage MMDiT tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import qwenimage as qi

CFG = qi.QWENIMAGE_TINY


@pytest.fixture(scope="module")
def setup():
    params = qi.init_qwenimage(jax.random.PRNGKey(0), CFG)
    B, Li, Lt = 2, 16, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Li, CFG.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, Lt, CFG.joint_attention_dim))
    t = jnp.array([0.8, 0.3])
    img_ids = jnp.stack([jnp.zeros(Li), jnp.arange(Li) // 4,
                         jnp.arange(Li) % 4], axis=1)
    txt_ids = jnp.zeros((Lt, 3))
    return params, x, ctx, t, img_ids, txt_ids


def test_forward_shape(setup):
    params, x, ctx, t, img_ids, txt_ids = setup
    out = qi.qwenimage_forward(params, CFG, x, ctx, t, img_ids, txt_ids)
    assert out.shape == (2, 16, CFG.patch_size ** 2 * CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_text_mask_isolates_padding(setup):
    params, x, ctx, t, img_ids, txt_ids = setup
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]] * 2))
    a = qi.qwenimage_forward(params, CFG, x, ctx, t, img_ids, txt_ids,
                             encoder_hidden_states_mask=mask)
    ctx2 = ctx.at[:, 4:].add(3.0)   # change only padded tokens
    b = qi.qwenimage_forward(params, CFG, x, ctx2, t, img_ids, txt_ids,
                             encoder_hidden_states_mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_independence(setup):
    params, x, ctx, t, img_ids, txt_ids = setup
    full = qi.qwenimage_forward(params, CFG, x, ctx, t, img_ids, txt_ids)
    one = qi.qwenimage_forward(params, CFG, x[1:], ctx[1:], t[1:], img_ids,
                               txt_ids)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(one[0]),
                               rtol=3e-4, atol=3e-4)


def test_timestep_sensitivity(setup):
    params, x, ctx, t, img_ids, txt_ids = setup
    a = qi.qwenimage_forward(params, CFG, x, ctx, t, img_ids, txt_ids)
    b = qi.qwenimage_forward(params, CFG, x, ctx, t * 0.1, img_ids, txt_ids)
    assert np.abs(np.asarray(a - b)).max() > 1e-4
