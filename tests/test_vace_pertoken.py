"""VACE control branch + per-token timestep path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit, wan_dit_vace

CFG = WAN_TINY
GRID = (3, 2, 2)
SHAPE = (1, CFG.in_dim, 3, 4, 4)


@pytest.fixture(scope="module")
def setup():
    base = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    vace = wan_dit_vace.init_vace_params(jax.random.PRNGKey(1), CFG, stride=2)
    x = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    c = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (1, CFG.text_len, CFG.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID)
    return base, vace, x, c, t, ctx, jnp.asarray(cos), jnp.asarray(sin)


def test_vace_zero_init_is_identity(setup):
    # before/after projections are zero-initialized -> control branch is a
    # no-op at init (reference `wan_transformer3d_vace.py:36-41`)
    base, vace, x, c, t, ctx, cos, sin = setup
    plain = wan_dit.wan_dit_forward(base, CFG, x, t, ctx, cos, sin)
    vout = wan_dit_vace.vace_forward(base, vace, CFG, x, c, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(vout),
                               rtol=1e-5, atol=1e-5)


def test_vace_hints_take_effect(setup):
    base, vace, x, c, t, ctx, cos, sin = setup
    # make the projections nonzero. NOTE: a feature-constant kernel (e.g.
    # all-ones) would produce hints that the downstream LayerNorms cancel
    # exactly — use a random projection.
    vace = jax.tree.map(lambda a: a, vace)
    vace["after_proj"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), vace["after_proj"]["kernel"].shape)
    vace["before_proj"]["kernel"] = jnp.eye(CFG.dim) * 0.1
    a = wan_dit_vace.vace_forward(base, vace, CFG, x, c, t, ctx, cos, sin)
    b = wan_dit_vace.vace_forward(base, vace, CFG, x, c * 2.0, t, ctx,
                                  cos, sin)
    assert np.abs(np.asarray(a - b)).max() > 1e-6
    # context_scale scales the effect
    z = wan_dit_vace.vace_forward(base, vace, CFG, x, c, t, ctx, cos, sin,
                                  context_scale=0.0)
    plain = wan_dit.wan_dit_forward(base, CFG, x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(z), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_per_token_timesteps(setup):
    base, _, x, _, _, ctx, cos, sin = setup
    L = GRID[0] * GRID[1] * GRID[2]
    t_tok = jnp.full((1, L), 500.0)
    out_tok = wan_dit.wan_dit_forward(base, CFG, x, t_tok, ctx, cos, sin)
    out_scalar = wan_dit.wan_dit_forward(base, CFG, x, jnp.array([500.0]),
                                         ctx, cos, sin)
    # uniform per-token timesteps == scalar timestep
    np.testing.assert_allclose(np.asarray(out_tok), np.asarray(out_scalar),
                               rtol=1e-4, atol=1e-4)
    # non-uniform: first half at t=999, second at t=1 -> differs
    t_mix = t_tok.at[:, : L // 2].set(999.0).at[:, L // 2:].set(1.0)
    out_mix = wan_dit.wan_dit_forward(base, CFG, x, t_mix, ctx, cos, sin)
    assert np.abs(np.asarray(out_mix - out_scalar)).max() > 1e-4
