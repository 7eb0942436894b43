"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4 level (d)):
Ulysses all-to-all attention vs single-device reference, FSDP sharding rules,
and the sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.ops import attention
from videocof_tpu.parallel import (fsdp_param_sharding, make_mesh,
                                   make_ulysses_attention, pad_tokens_for_sp)
from videocof_tpu.training import make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = WAN_TINY
GRID = (4, 2, 4)  # L = 32, divisible by sp=4
SHAPE = (2, CFG.in_dim, 4, 4, 8)


def test_mesh_axes():
    mesh = make_mesh(data=2, seq=4)
    assert mesh.shape == {"data": 2, "seq": 4, "model": 1}


def test_pad_tokens():
    assert pad_tokens_for_sp(30, 4) == 32
    assert pad_tokens_for_sp(32, 4) == 32


def test_ulysses_matches_single_device():
    mesh = make_mesh(data=1, seq=4)
    ua = make_ulysses_attention(mesh)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (2, 32, 4, 16),
                                 jnp.float32) for i in range(3))
    got = np.asarray(ua(q, k, v))
    want = np.asarray(attention(q, k, v, backend="naive"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_matches_single_device():
    from videocof_tpu.parallel import make_ring_attention
    mesh = make_mesh(data=1, seq=4)
    ra = make_ring_attention(mesh)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(10 + i), (2, 32, 4, 16),
                                 jnp.float32) for i in range(3))
    got = np.asarray(ra(q, k, v))
    want = np.asarray(attention(q, k, v, backend="naive"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_in_dit_forward():
    from videocof_tpu.parallel import make_ring_attention
    mesh = make_mesh(data=1, seq=4)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    t = jnp.array([999.0, 499.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, CFG.text_len, CFG.text_dim), jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID, f_src=2, f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    base = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    ring = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                   attn_backend=make_ring_attention(mesh))
    np.testing.assert_allclose(np.asarray(base), np.asarray(ring),
                               rtol=5e-4, atol=5e-4)


def test_sharded_dit_forward_matches():
    mesh = make_mesh(data=1, seq=4)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    t = jnp.array([999.0, 499.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, CFG.text_len, CFG.text_dim), jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID, f_src=2, f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    base = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    ua = make_ulysses_attention(mesh)
    sharded = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                      attn_backend=ua)
    np.testing.assert_allclose(np.asarray(base), np.asarray(sharded),
                               rtol=5e-4, atol=5e-4)


def test_fsdp_sharding_rule():
    mesh = make_mesh(data=2, seq=4)
    params = {"big": jnp.zeros((512, 256)), "small": jnp.zeros((8,))}
    sh = fsdp_param_sharding(mesh, params, min_size=1024)
    assert "data" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_train_step_runs_sharded():
    mesh = make_mesh(data=2, seq=4)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    init_fn, step_fn = make_train_step(
        mesh, CFG, optax.adamw(1e-4), use_ulysses=True, fsdp_min_size=1024)
    state = init_fn(params)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID, f_src=2, f_ground=1)
    batch = {
        "x0": jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32),
        "context": jax.random.normal(
            jax.random.PRNGKey(2), (2, CFG.text_len, CFG.text_dim),
            jnp.float32),
        "rope_cos": jnp.asarray(cos), "rope_sin": jnp.asarray(sin),
        "timesteps": jnp.array([250, 750], jnp.int32),
    }
    state, loss1 = step_fn(state, batch, jax.random.PRNGKey(3))
    state, loss2 = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # same batch: one adam step helps
    assert int(state.step) == 2
    # params actually sharded over the data axis
    flat = jax.tree.leaves(state.params)
    assert any("data" in str(l.sharding.spec) for l in flat)


def test_train_init_never_aliases_caller_buffers():
    """Regression: `init_fn` used jax.device_put, which ALIASES the caller's
    buffer for leaves whose sharding is already right (replicated leaves
    reuse the source buffer even with may_alias=False) — so the donated
    step_fn deleted the caller's own params. init_fn now reshards through a
    jitted identity (always fresh buffers); the caller's pytree must stay
    alive and usable after a donated step."""
    mesh = make_mesh(data=2, seq=4)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)
    init_fn, step_fn = make_train_step(
        mesh, CFG, optax.adamw(1e-4), use_ulysses=True, fsdp_min_size=1024)
    state = init_fn(params)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, GRID, f_src=2, f_ground=1)
    batch = {
        "x0": jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32),
        "context": jax.random.normal(
            jax.random.PRNGKey(2), (2, CFG.text_len, CFG.text_dim),
            jnp.float32),
        "rope_cos": jnp.asarray(cos), "rope_sin": jnp.asarray(sin),
        "timesteps": jnp.array([250, 750], jnp.int32),
    }
    state, loss = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # the donated step must not have deleted the CALLER's buffers
    assert not any(l.is_deleted() for l in jax.tree.leaves(params))
    # and they must still be readable (a deleted buffer raises here)
    _ = float(jax.tree.leaves(params)[0].sum())


def test_timestep_band_sampler():
    from videocof_tpu.training import DiscreteSampling
    ds = DiscreteSampling(group_num=4, num_train_timesteps=1000)
    for rank in range(4):
        t = np.asarray(ds.sample(jax.random.PRNGKey(rank), 64, dp_rank=rank))
        assert t.min() >= rank * 250 and t.max() < (rank + 1) * 250


def test_ring_v2_kernel_path_matches_naive():
    """head_dim 128 takes the Pallas flash + LSE-combine path (VERDICT r1:
    ring used to materialize full [*, Lk] fp32 logits via einsum)."""
    from videocof_tpu.parallel import make_mesh, make_ring_attention
    mesh = make_mesh(data=1, seq=4)
    B, L, N, D = 1, 64, 2, 128
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, L, N, D),
                                 jnp.float32) for i in range(3))
    want = np.asarray(attention(q, k, v, backend="naive"))
    got = np.asarray(jax.jit(make_ring_attention(mesh))(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_ring_v2_kernel_path_with_mask():
    from videocof_tpu.parallel import make_mesh, make_ring_attention
    mesh = make_mesh(data=1, seq=4)
    B, L, N, D = 1, 64, 2, 128
    q, k, v = (jax.random.normal(jax.random.PRNGKey(10 + i), (B, L, N, D),
                                 jnp.float32) for i in range(3))
    mask = jnp.arange(L) < 50          # last 14 keys masked (SP padding)
    mask = jnp.broadcast_to(mask[None], (B, L))
    want = np.asarray(attention(q, k, v, mask=mask, backend="naive"))
    got = np.asarray(jax.jit(make_ring_attention(mesh))(q, k, v, mask))
    # padded-query rows (>=50) attend real keys too and stay finite; only
    # compare real rows
    np.testing.assert_allclose(got[:, :50], want[:, :50], atol=2e-3,
                               rtol=2e-3)
    assert np.isfinite(got).all()


def test_ring_v2_long_sequence_4x():
    """4x-extrapolation-scale geometry through the kernel path."""
    from videocof_tpu.parallel import make_mesh, make_ring_attention
    mesh = make_mesh(data=1, seq=8)
    B, L, N, D = 1, 1024, 1, 128
    q, k, v = (0.3 * jax.random.normal(jax.random.PRNGKey(20 + i),
                                       (B, L, N, D), jnp.float32)
               for i in range(3))
    want = np.asarray(attention(q, k, v, backend="naive"))
    got = np.asarray(jax.jit(make_ring_attention(mesh))(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
