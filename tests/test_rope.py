"""CoF 3D RoPE unit tests against an independent numpy complex oracle
(reference semantics: `wan_transformer3d.py:135-205`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from videocof_tpu.models import rope


def oracle_rope(x, grid, f_src=None, f_ground=0, theta=10000.0):
    """Independent complex-arithmetic oracle: rotate pairs by
    exp(i * pos * invfreq) per (t,h,w) section."""
    f, h, w = grid
    L = f * h * w
    B, _, N, D = x.shape
    c = D // 2
    ct, ch, cw = c - 2 * (c // 3), c // 3, c // 3

    def invf(section):
        dim = 2 * section
        return 1.0 / theta ** (np.arange(0, dim, 2) / dim)

    # temporal positions
    if f_src is None:
        tp = np.arange(f)
    elif f_ground > 0:
        tp = np.concatenate([1 + np.arange(f_src), np.zeros(f_ground, int),
                             1 + np.arange(f - f_src - f_ground)])
    else:
        tp = np.concatenate([np.arange(f_src), np.arange(f - f_src)])

    ang = np.zeros((f, h, w, c))
    ang[..., :ct] = tp[:, None, None, None] * invf(ct)[None, None, None, :]
    ang[..., ct:ct + ch] = np.arange(h)[None, :, None, None] * invf(ch)
    ang[..., ct + ch:] = np.arange(w)[None, None, :, None] * invf(cw)
    rot = np.exp(1j * ang.reshape(L, 1, c))

    xc = x.astype(np.float64).reshape(B, L, N, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * rot[None]
    res = np.stack([out.real, out.imag], axis=-1).reshape(B, L, N, D)
    return res


@pytest.mark.parametrize("f_src,f_ground", [(None, 0), (3, 0), (3, 1)])
def test_apply_rope_matches_complex_oracle(f_src, f_ground):
    rng = np.random.default_rng(0)
    grid = (7, 2, 3)
    B, N, D = 2, 2, 24
    L = grid[0] * grid[1] * grid[2]
    x = rng.standard_normal((B, L, N, D)).astype(np.float32)

    cos, sin = rope.build_rope_cos_sin(grid, D, f_src=f_src, f_ground=f_ground)
    got = np.asarray(rope.apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                     jnp.asarray(sin)))
    want = oracle_rope(x, grid, f_src, f_ground)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cof_positions_modes():
    # default contiguous
    np.testing.assert_array_equal(rope.cof_temporal_positions(5),
                                  [0, 1, 2, 3, 4])
    # paired restart at 0 (reference `wan_transformer3d.py:182-188`)
    np.testing.assert_array_equal(rope.cof_temporal_positions(5, f_src=3),
                                  [0, 1, 2, 0, 1])
    # CoF: src 1..f_src, ground pinned 0, tgt 1..f_tgt (`:153-179`)
    np.testing.assert_array_equal(
        rope.cof_temporal_positions(7, f_src=3, f_ground=1),
        [1, 2, 3, 0, 1, 2, 3])


def test_section_dims_headdim_128():
    # Wan head_dim is 128 across 1.3B/14B: sections (22, 21, 21) complex slots
    assert rope.rope_section_dims(128) == (22, 21, 21)


def test_rope_preserves_norm():
    # rotation must preserve per-pair L2 norms
    rng = np.random.default_rng(1)
    grid = (4, 3, 3)
    L = 36
    x = rng.standard_normal((1, L, 2, 16)).astype(np.float32)
    cos, sin = rope.build_rope_cos_sin(grid, 16, f_src=2, f_ground=1)
    y = np.asarray(rope.apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                   jnp.asarray(sin)))
    np.testing.assert_allclose(
        np.linalg.norm(y.reshape(1, L, 2, 8, 2), axis=-1),
        np.linalg.norm(x.reshape(1, L, 2, 8, 2), axis=-1),
        rtol=1e-5, atol=1e-5)


def test_riflex_table_shrinks_intrinsic_freq():
    tab = rope.riflex_angle_table(128, k=6, L_test=66, L_test_scale=4.886)
    base_t, _, _ = rope.rope_angle_tables(128)
    # column k-1 replaced, all others untouched
    np.testing.assert_allclose(tab[:, :5], base_t[:, :5])
    expected = 0.9 * 2 * np.pi / 66 / 4.886
    np.testing.assert_allclose(tab[1, 5], expected, rtol=1e-12)
