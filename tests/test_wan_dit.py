"""Wan DiT structural tests (tiny config; SURVEY.md §4 level (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.ops import attention


CFG = WAN_TINY
GRID = (5, 2, 3)   # latent frames x h x w patches
SHAPE = (2, CFG.in_dim, GRID[0] * 1, GRID[1] * 2, GRID[2] * 2)  # patch (1,2,2)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = wan_dit.init_wan_dit(key, CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    t = jnp.array([999.0, 499.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, CFG.text_len, CFG.text_dim), jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID, f_src=2, f_ground=1)
    return params, x, t, ctx, jnp.asarray(cos), jnp.asarray(sin)


def test_forward_shape_dtype(setup):
    params, x, t, ctx, cos, sin = setup
    out = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    assert out.shape == (2, CFG.out_dim) + SHAPE[2:]
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("nch", [2, 5])
def test_ffn_chunks_exact(setup, nch):
    """ffn_chunks splits the FFN matmuls over token rows — identical math
    (L=30 tokens here; nch=2 divides, nch=5 divides too). The 14B needs
    this to fit its trajectory beside 13.83 GiB of weights."""
    params, x, t, ctx, cos, sin = setup
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    cfg_n = CFG.replace(ffn_chunks=nch)
    b = wan_dit.wan_dit_forward(params, cfg_n, x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_ffn_chunks_nondividing_falls_back(setup):
    """Non-dividing ffn_chunks must NOT silently drop to the unchunked path
    (that discards the memory bound the caller configured): it falls to the
    largest divisor of the token count, with a loud warning."""
    import warnings

    params, x, t, ctx, cos, sin = setup
    cfg_n = CFG.replace(ffn_chunks=7)  # 30 % 7 != 0 -> 6 chunks + warning
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        b = wan_dit.wan_dit_forward(params, cfg_n, x, t, ctx, cos, sin)
    assert any("ffn_chunks" in str(w.message) for w in rec)
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                               rtol=1e-5)


def test_batch_independence(setup):
    # row b of a batched forward == forward of that row alone
    params, x, t, ctx, cos, sin = setup
    full = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    one = wan_dit.wan_dit_forward(params, CFG, x[1:], t[1:], ctx[1:], cos, sin)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(one[0]),
                               rtol=2e-4, atol=2e-4)


def test_scan_matches_python_loop(setup):
    # the lax.scan over stacked blocks must equal an explicit per-block loop
    params, x, t, ctx, cos, sin = setup
    out_scan = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)

    # manual recompute with unstacked blocks
    tokens, grid = wan_dit.patchify(x, CFG.patch_size)
    h = wan_dit._linear(tokens, params["patch_embed"])
    e = wan_dit.sinusoidal_embedding_1d(CFG.freq_dim, t)
    e = wan_dit._linear(e, params["time_mlp"]["fc1"], jnp.float32)
    e = jax.nn.silu(e)
    e = wan_dit._linear(e, params["time_mlp"]["fc2"], jnp.float32)
    e0 = wan_dit._linear(jax.nn.silu(e), params["time_proj"]["fc"],
                         jnp.float32).reshape(2, 6, CFG.dim)
    c = wan_dit._linear(ctx, params["text_mlp"]["fc1"])
    c = wan_dit._gelu_tanh(c)
    c = wan_dit._linear(c, params["text_mlp"]["fc2"])
    stream = h.astype(jnp.float32)
    for i in range(CFG.num_layers):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        stream = wan_dit.wan_block_apply(bp, CFG, stream, e0, c, (cos, sin))
    hm = params["head"]["modulation"][None] + e[:, None, :]
    out = wan_dit._layer_norm(stream, CFG.eps) * (1 + hm[:, 1][:, None]) \
        + hm[:, 0][:, None]
    out = wan_dit._linear(out, params["head"]["fc"])
    out_loop = wan_dit.unpatchify(out, grid, CFG.patch_size, CFG.out_dim)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=1e-5, atol=1e-5)


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 6, 8, 10))
    tokens, grid = wan_dit.patchify(x, (2, 2, 2))
    assert tokens.shape == (1, 3 * 4 * 5, 4 * 8)
    # invert: tokens features are (c, dt, dh, dw); unpatchify expects
    # (dt, dh, dw, c) so permute before inverting
    t2 = tokens.reshape(1, 60, 4, 2, 2, 2).transpose(0, 1, 3, 4, 5, 2)
    back = wan_dit.unpatchify(t2.reshape(1, 60, 32), grid, (2, 2, 2), 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_remat_matches(setup):
    params, x, t, ctx, cos, sin = setup
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    b = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                remat_blocks=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_attention_backends_agree():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (2, 16, 4, 8))
               for i in range(3))
    mask = jnp.arange(16)[None, :] < jnp.array([16, 9])[:, None]
    a = attention(q, k, v, mask=mask, backend="naive")
    b = attention(q, k, v, mask=mask, backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_sinusoidal_embedding_formula():
    t = jnp.array([7.0])
    dim = 8
    got = np.asarray(wan_dit.sinusoidal_embedding_1d(dim, t))[0]
    w = 10000.0 ** (-np.arange(4) / 4)
    want = np.concatenate([np.cos(7 * w), np.sin(7 * w)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_timestep_sensitivity(setup):
    # AdaLN must make the output depend on t
    params, x, t, ctx, cos, sin = setup
    o1 = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    o2 = wan_dit.wan_dit_forward(params, CFG, x, t * 0.5, ctx, cos, sin)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-3


def test_grad_flows(setup):
    params, x, t, ctx, cos, sin = setup

    def loss(p):
        out = wan_dit.wan_dit_forward(p, CFG, x, t, ctx, cos, sin,
                                      remat_blocks=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    norms = jax.tree.map(lambda a: float(jnp.abs(a).max()), g)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(v) for v in flat)
    assert max(flat) > 0


def test_bf16_stream_dtype_close_to_fp32():
    """cfg.stream_dtype='bfloat16' halves stream HBM (the 14B-on-16GB
    enabler); output must stay close to the fp32-stream default."""
    import jax
    import jax.numpy as jnp
    from videocof_tpu.configs import WAN_TINY
    from videocof_tpu.models import wan_dit
    cfg32 = WAN_TINY
    cfg16 = WAN_TINY.replace(stream_dtype="bfloat16")
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg32)
    f, h, w = 3, 4, 4
    pt, ph, pw = cfg32.patch_size
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg32.in_dim, f * pt, h * ph, w * pw))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg32.text_len, cfg32.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(cfg32, (f, h, w))
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    a = np.asarray(wan_dit.wan_dit_forward(params, cfg32, x, t, ctx, cos,
                                           sin))
    b = np.asarray(wan_dit.wan_dit_forward(params, cfg16, x, t, ctx, cos,
                                           sin))
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 0.02 * np.abs(a).mean() + 0.02


def test_token_pad_multiple_matches_unpadded():
    """cfg.token_pad_multiple pads tokens after patch embed with in-kernel
    key masking; output must equal the unpadded forward."""
    import jax
    import jax.numpy as jnp
    from videocof_tpu.configs import WAN_TINY
    from videocof_tpu.models import wan_dit
    cfg0 = WAN_TINY
    cfgp = WAN_TINY.replace(token_pad_multiple=32)   # L=45 -> pad to 64
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg0)
    f, h, w = 5, 3, 3
    pt, ph, pw = cfg0.patch_size
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg0.in_dim, f * pt, h * ph, w * pw))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg0.text_len, cfg0.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(cfg0, (f, h, w), f_src=2,
                                              f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    a = np.asarray(wan_dit.wan_dit_forward(params, cfg0, x, t, ctx, cos,
                                           sin))
    b = np.asarray(wan_dit.wan_dit_forward(params, cfgp, x, t, ctx, cos,
                                           sin))
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=2e-5)


def test_varlen_batch_matches_per_item(setup):
    """VERDICT r3 #8: ragged (mixed-length) batches. Two samples with
    different frame counts run BATCHED — the shorter one zero-padded along
    T, carrying its own rope table (per-sample rope as data) and its valid
    token count in ``seq_lens`` — and each sample's valid region equals its
    own unbatched run (reference semantics: per-sample q_lens/k_lens varlen
    packing, `attention_utils.py:113-146`)."""
    params, x, t, ctx, cos, sin = setup
    F_long, F_short = GRID[0], GRID[0] - 2     # 5 vs 3 latent frames
    hw = GRID[1] * GRID[2]
    L_long, L_short = F_long * hw, F_short * hw

    x_short = x[1:, :, :F_short]
    cos_s, sin_s = wan_dit.make_rope_for_geometry(
        CFG, (F_short, GRID[1], GRID[2]), f_src=1, f_ground=1)

    # per-item (unbatched) references
    out_long = wan_dit.wan_dit_forward(params, CFG, x[:1], t[:1], ctx[:1],
                                       cos, sin)
    out_short = wan_dit.wan_dit_forward(params, CFG, x_short, t[1:],
                                        ctx[1:], jnp.asarray(cos_s),
                                        jnp.asarray(sin_s))

    # ragged batch: pad the short sample's latents with garbage (NOT zeros —
    # proves padded tokens are inert), stack per-sample rope tables padded
    # with the identity rotation
    junk = jnp.full((1, CFG.in_dim, F_long - F_short) + x.shape[3:], 7.7)
    x_b = jnp.concatenate([x[:1], jnp.concatenate([x_short, junk], axis=2)])
    pad = L_long - L_short
    cos_b = jnp.stack([jnp.asarray(cos),
                       jnp.pad(jnp.asarray(cos_s), ((0, pad), (0, 0)),
                               constant_values=1.0)])
    sin_b = jnp.stack([jnp.asarray(sin),
                       jnp.pad(jnp.asarray(sin_s), ((0, pad), (0, 0)))])
    out_b = wan_dit.wan_dit_forward(
        params, CFG, x_b, t, ctx, cos_b, sin_b,
        seq_lens=jnp.array([L_long, L_short]))

    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_long[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_b[1, :, :F_short]),
                               np.asarray(out_short[0]),
                               rtol=2e-5, atol=2e-5)


def test_rope_bf16_close(setup):
    """rope_dtype='bfloat16' (the 14B lever; bench default as of r5 — buys
    ~1.2% step time on the 1.3B, probe_mfu_gap.py) stays close to the fp32
    rope tables."""
    params, x, t, ctx, cos, sin = setup
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    b = wan_dit.wan_dit_forward(params, CFG.replace(rope_dtype="bfloat16"),
                                x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=0.05, rtol=0.05)
    # and it must not be a silent no-op: the tables really are cast
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_remat_policy_matches(setup):
    """Named checkpoint policies (and the tagged-attention save_names form)
    are numerically identical to the unremat forward."""
    params, x, t, ctx, cos, sin = setup
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    tag_cfg = CFG.replace(remat_tag_names=True)  # names exist only when on
    for pol, cfg in (("dots_with_no_batch_dims_saveable", CFG),
                     ("save_names:attn_out,xattn_out", tag_cfg)):
        b = wan_dit.wan_dit_forward(params, cfg, x, t, ctx, cos, sin,
                                    remat_blocks=pol)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                remat_blocks="not_a_policy")
