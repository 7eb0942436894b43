"""Pallas flash attention vs naive softmax attention (interpret mode on CPU —
SURVEY.md §4 level (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.ops import attention
from videocof_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("L", [128, 256, 300])  # 300 exercises padding
def test_matches_naive(L):
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, L, 2, 128),
                                 jnp.float32) for i in range(3))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    want = np.asarray(attention(q, k, v, backend="naive"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bf16_inputs():
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (2, 128, 2, 128),
                                 jnp.bfloat16) for i in range(3))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True).astype(jnp.float32))
    want = np.asarray(attention(q, k, v, backend="naive")
                      .astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_cross_attention_shapes():
    # Lq != Lk (e.g. decode-time cross attention)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 130, 2, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 130, 2, 128))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    want = np.asarray(attention(q, k, v, backend="naive"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unsupported_shapes_raise():
    q = jnp.zeros((1, 64, 2, 96))  # head_dim not 64 / %128
    with pytest.raises(NotImplementedError):
        flash_attention(q, q, q, interpret=True)
    with pytest.raises(NotImplementedError):
        flash_attention(jnp.zeros((1, 64, 2, 128)),
                        jnp.zeros((1, 64, 2, 128)),
                        jnp.zeros((1, 64, 2, 128)),
                        bias=jnp.zeros((1,)), interpret=True)


@pytest.mark.parametrize("L", [128, 300])  # 300 exercises padding
def test_head_dim_64(L):
    """head_dim 64 (CogVideoX) is first-class in the kernel: forward,
    gradients, and the masked path all match the naive reference."""
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, L, 2, 64),
                                 jnp.float32) for i in range(3))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    want = np.asarray(attention(q, k, v, backend="naive"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    g = jax.random.normal(jax.random.PRNGKey(9), (1, L, 2, 64), jnp.float32)
    gf = jax.grad(lambda a: jnp.sum(flash_attention(
        a, k, v, block_q=128, block_k=128, interpret=True) * g))(q)
    gn = jax.grad(lambda a: jnp.sum(
        attention(a, k, v, backend="naive") * g))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gn),
                               rtol=2e-3, atol=2e-3)

    mask = jnp.arange(L)[None, :] < (L - 17)
    gotm = np.asarray(flash_attention(q, k, v, kv_mask=mask, block_q=128,
                                      block_k=128, interpret=True))
    wantm = np.asarray(attention(q, k, v, mask=mask, backend="naive"))
    np.testing.assert_allclose(gotm, wantm, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("L", [128, 200])  # 200 exercises padded backward
def test_gradients_match_naive(L):
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, L, 2, 128),
                                 jnp.float32) for i in range(3))
    g = jax.random.normal(jax.random.PRNGKey(9), (1, L, 2, 128), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128,
                                       interpret=True) * g)

    def loss_naive(q, k, v):
        return jnp.sum(attention(q, k, v, backend="naive") * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gn, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_dispatcher_falls_back():
    # pallas backend on unsupported head_dim silently falls back to xla
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 24))
    out = attention(q, q, q, backend="pallas")
    want = attention(q, q, q, backend="naive")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_masked_path_is_differentiable():
    """The kv_mask path must support jax.grad (training with SP padding
    reaches it): backward recomputes through XLA reference attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videocof_tpu.ops.attention import attention
    from videocof_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 2, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 2, 128))
    mask = jnp.arange(16)[None, :] < jnp.array([16, 11])[:, None]

    gf = jax.grad(lambda a: jnp.sum(
        flash_attention(a, k, v, kv_mask=mask) ** 2))(q)
    gr = jax.grad(lambda a: jnp.sum(
        attention(a, k, v, mask=mask, backend="naive") ** 2))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4,
                               rtol=2e-4)
