"""S2V variant tests: segment AdaLN, per-sample rope, audio injection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import rope, wan_dit, wan_dit_s2v

CFG = WAN_TINY.replace(cross_attn_norm=True)
GRID = (3, 2, 2)
L = 12


@pytest.fixture(scope="module")
def setup():
    base = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    s2v = wan_dit_s2v.init_s2v_params(jax.random.PRNGKey(1), CFG,
                                      audio_dim=32, inject_layers=(0,))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.in_dim, 3, 4, 4))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (1, CFG.text_len, CFG.text_dim))
    cos, sin = rope.build_rope_cos_sin(GRID, CFG.head_dim)
    cos = jnp.asarray(cos)[None]
    sin = jnp.asarray(sin)[None]
    return base, s2v, x, t, ctx, cos, sin


def test_uniform_segment_matches_base(setup):
    # all tokens in segment 0 with shared modulation == the plain DiT
    base, s2v, x, t, ctx, cos, sin = setup
    seg = jnp.zeros((L,), jnp.int32)
    out = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos, sin,
                                      seg)
    plain = wan_dit.wan_dit_forward(base, CFG, x, t, ctx, cos[0], sin[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_audio_injection_zero_init_noop_then_effective(setup):
    base, s2v, x, t, ctx, cos, sin = setup
    seg = jnp.zeros((L,), jnp.int32)
    audio = jax.random.normal(jax.random.PRNGKey(4), (1, GRID[0], 32))
    out_no = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos, sin,
                                         seg)
    out_a = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos, sin,
                                        seg, audio_feats=audio)
    # zero-init output proj: audio is a no-op at init
    np.testing.assert_allclose(np.asarray(out_no), np.asarray(out_a),
                               atol=1e-5)
    # wake the injector and the audio must matter
    s2v2 = jax.tree.map(lambda a: a, s2v)
    s2v2["audio_injector"]["layers"][0]["o"]["kernel"] = \
        0.05 * jax.random.normal(jax.random.PRNGKey(5), (CFG.dim, CFG.dim))
    a1 = wan_dit_s2v.wan_s2v_forward(base, s2v2, CFG, x, t, ctx, cos, sin,
                                     seg, audio_feats=audio)
    # note: a *uniform* scale is invisible to the encoder's RMS norm — the
    # probe must change the feature direction
    audio2 = audio + jax.random.normal(jax.random.PRNGKey(6), audio.shape)
    a2 = wan_dit_s2v.wan_s2v_forward(base, s2v2, CFG, x, t, ctx, cos, sin,
                                     seg, audio_feats=audio2)
    assert np.abs(np.asarray(a1 - a2)).max() > 1e-6


def test_per_sample_rope_tables(setup):
    base, s2v, x, t, ctx, cos, sin = setup
    seg = jnp.zeros((L,), jnp.int32)
    # different per-sample tables change the output
    cos2 = jnp.roll(cos, 1, axis=1)
    sin2 = jnp.roll(sin, 1, axis=1)
    a = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos, sin, seg)
    b = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos2, sin2,
                                    seg)
    assert np.abs(np.asarray(a - b)).max() > 1e-5


def test_segment_modulation_differs(setup):
    base, s2v, x, t, ctx, cos, sin = setup
    seg0 = jnp.zeros((L,), jnp.int32)
    seg_mix = seg0.at[L // 2:].set(1)
    # make segment-1 modulation distinct by perturbing e0 — easiest via a
    # custom forward; here just verify that a mixed segment map still runs
    # and produces finite output (the per-segment gather path)
    out = wan_dit_s2v.wan_s2v_forward(base, s2v, CFG, x, t, ctx, cos, sin,
                                      seg_mix)
    assert np.isfinite(np.asarray(out)).all()
