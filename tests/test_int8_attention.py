"""Int8 (Sage-style) attention vs full-precision reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.ops import attention
from videocof_tpu.ops.int8_attention import int8_flash_attention


def _cos_sim(a, b):
    a, b = a.ravel(), b.ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.parametrize("L", [128, 200])
def test_int8_close_to_fp(L):
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, L, 2, 128),
                                 jnp.float32) for i in range(3))
    got = np.asarray(int8_flash_attention(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
    want = np.asarray(attention(q, k, v, backend="naive"))
    # int8 QK introduces ~1% error; outputs must stay highly correlated
    assert _cos_sim(got, want) > 0.999
    assert np.abs(got - want).max() < 0.15


def test_k_centering_softmax_invariance():
    # adding a constant vector to every key must not change the output
    q, k, v = (jax.random.normal(jax.random.PRNGKey(10 + i), (1, 128, 1, 128),
                                 jnp.float32) for i in range(3))
    shift = jnp.ones((1, 1, 1, 128)) * 3.0
    a = np.asarray(int8_flash_attention(q, k, v, block_q=128, block_k=128,
                                        interpret=True))
    b = np.asarray(int8_flash_attention(q, k + shift, v, block_q=128,
                                        block_k=128, interpret=True))
    np.testing.assert_allclose(a, b, atol=5e-2)


def test_dispatcher_int8_backend():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 2, 128))
    out = attention(q, q, q, backend="int8")
    ref = attention(q, q, q, backend="naive")
    assert _cos_sim(np.asarray(out), np.asarray(ref)) > 0.999


def test_int8_kv_mask_in_kernel():
    """The boolean key mask is applied inside the int8 kernel (previously
    fell back to xla)."""
    import jax
    import jax.numpy as jnp
    from videocof_tpu.ops.int8_attention import int8_flash_attention
    B, L, N, D = 1, 64, 2, 128
    q, k, v = (0.5 * jax.random.normal(jax.random.PRNGKey(i), (B, L, N, D))
               for i in range(3))
    mask = jnp.arange(L) < 48
    mask = jnp.broadcast_to(mask[None], (B, L))
    got = np.asarray(int8_flash_attention(q, k, v, kv_mask=mask))
    want = np.asarray(attention(q, k, v, mask=mask, backend="naive"))
    assert np.abs(got[:, :48] - want[:, :48]).mean() < 0.03  # int8 tolerance
