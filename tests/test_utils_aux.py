"""fp8 storage, profiling, checkpoint round-trip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.utils import fp8
from videocof_tpu.utils.checkpoint import (export_dit_state_dict,
                                           save_train_state,
                                           restore_train_state)
from videocof_tpu.models.weights import convert_dit_state_dict

CFG = WAN_TINY


@pytest.fixture(scope="module")
def params():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)


def test_fp8_quantize_dequantize_error(params):
    q = fp8.quantize_params_fp8(params)
    deq = fp8.dequantize_params(q, dtype=jnp.float32)
    # big matmul weights quantized, modulation/norms untouched
    assert fp8.is_fp8_leaf(q["blocks"]["self_attn"]["q"]["kernel"])
    assert not isinstance(q["blocks"]["modulation"], dict)
    w0 = np.asarray(params["blocks"]["self_attn"]["q"]["kernel"])
    w1 = np.asarray(deq["blocks"]["self_attn"]["q"]["kernel"])
    rel = np.abs(w0 - w1).max() / np.abs(w0).max()
    assert rel < 0.08  # e4m3 relative resolution
    # storage actually shrinks
    assert fp8.fp8_bytes(q) < 0.45 * fp8.fp8_bytes(params)


def test_fp8_forward_close(params):
    q = fp8.quantize_params_fp8(params)
    deq = fp8.dequantize_params(q, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.in_dim, 3, 4, 4))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, CFG.text_len, CFG.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (3, 2, 2))
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, jnp.asarray(cos),
                                jnp.asarray(sin))
    b = wan_dit.wan_dit_forward(deq, CFG, x, t, ctx, jnp.asarray(cos),
                                jnp.asarray(sin))
    # quantization noise propagates but stays bounded on a tiny model
    assert np.abs(np.asarray(a - b)).max() < 0.6
    assert np.abs(np.asarray(a - b)).max() > 0  # actually quantized


def test_dit_export_roundtrip(params):
    sd = export_dit_state_dict(params, CFG)
    back = convert_dit_state_dict({k: np.asarray(v, np.float32)
                                   for k, v in sd.items()}, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_orbax_train_state_roundtrip(tmp_path, params):
    import optax
    from videocof_tpu.parallel import make_mesh
    from videocof_tpu.training import make_train_step

    mesh = make_mesh(data=1, seq=1)
    init_fn, _ = make_train_step(mesh, CFG, optax.adamw(1e-4),
                                 use_ulysses=False)
    state = init_fn(params)
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = restore_train_state(path, abstract)
    assert int(jax.device_get(restored.step)) == 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timer_records():
    from videocof_tpu.utils import profiling
    profiling.reset_records()

    @profiling.timer(name="toy")
    def f(x):
        return x * 2

    f(jnp.ones((4,)))
    recs = profiling.records()
    assert len(recs) == 1 and recs[0]["name"] == "toy"
    assert recs[0]["seconds"] >= 0


def test_layout_targeting_roundtrip():
    """consumer_input_formats + ship_tree_into: host tree lands in the
    consumer's expected formats and the consumer runs on it directly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videocof_tpu.utils.layouts import (consumer_input_formats,
                                            ship_tree_into)

    def consumer(p, x):
        return p["w"] @ x + p["b"][:, None]

    p_abs = {"w": jax.ShapeDtypeStruct((16, 8), jnp.float32),
             "b": jax.ShapeDtypeStruct((16,), jnp.float32)}
    x = jnp.ones((8, 4))
    compiled, fmts = consumer_input_formats(consumer, p_abs, x)
    host = {"w": np.arange(128, dtype=np.float32).reshape(16, 8),
            "b": np.ones(16, np.float32)}
    want = host["w"] @ np.ones((8, 4), np.float32) + 1.0
    dev = ship_tree_into(host, fmts)
    # the source tree is detached leaf-by-leaf (host RAM actually freed)
    assert host["w"] is None and host["b"] is None
    out = compiled(dev, x)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_device_put_into_relayout_fallback():
    """device_put_into lands the leaf in the requested format even when a
    plain device_put would miss it (on TPU, AUTO-layout executables can
    request transposed kernel layouts that device_put-from-numpy silently
    drops — the fallback relayouts on device). On CPU formats are trivial,
    so this covers the verify-then-passthrough path plus value equality."""
    import jax
    import numpy as np
    from videocof_tpu.utils.layouts import (consumer_input_formats,
                                            device_put_into)

    p_abs = {"w": jax.ShapeDtypeStruct((4, 6), "float32")}
    compiled, fmts = consumer_input_formats(
        lambda p: p["w"].T.sum(axis=1), p_abs)
    host = np.arange(24, dtype=np.float32).reshape(4, 6)
    arr = device_put_into(host, jax.tree.leaves(fmts)[0])
    np.testing.assert_allclose(np.asarray(arr), host)
    np.testing.assert_allclose(np.asarray(compiled({"w": arr})),
                               host.T.sum(axis=1))


def test_i2v_export_convert_roundtrip():
    """i2v weights (cross_attn k_img/v_img/norm_k_img + the CLIP MLPProj
    img_emb) survive the export -> convert roundtrip — they used to be
    silently dropped, leaving an i2v checkpoint running plain t2v."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videocof_tpu.configs import WAN_TINY
    from videocof_tpu.models import wan_dit, weights

    cfg = WAN_TINY.replace(model_type="i2v", in_dim=WAN_TINY.in_dim * 2)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert "k_img" in params["blocks"]["cross_attn"]
    assert "img_emb" in params
    sd = export_dit_state_dict(params, cfg)
    assert "blocks.0.cross_attn.k_img.weight" in sd
    assert "img_emb.proj.1.weight" in sd
    back = weights.convert_dit_state_dict(sd, cfg, dtype=np.float32)
    assert "k_img" in back["blocks"]["cross_attn"]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        params, back)


def test_size_from_base_resolution():
    """AR-aware sizing rule matches the reference formula
    (`videox_fun/utils/utils.py:23-29`) and preserves aspect/pixel budget."""
    from videocof_tpu.utils.video_io import size_from_base_resolution
    h, w = size_from_base_resolution(480, 832, 512)
    assert (h, w) == (389, 674)
    assert abs(h * w - 512 * 512) / (512 * 512) < 0.01
    assert abs(h / w - 480 / 832) < 0.01
    assert size_from_base_resolution(512, 512, 512) == (512, 512)
