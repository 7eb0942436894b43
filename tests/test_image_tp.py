"""Tensor parallelism for the image families (Flux / QwenImage).

The reference's distributed support for these models is SP-only
(`videox_fun/dist/qwen_xfuser.py:1-175`, `flux_xfuser.py:1-167`); TP is a
capability beyond it — and the only path to the 20B QwenImage, which does
not fit one 16 GB v5e even at fp8 (BASELINE.md). These tests pin, on the
8-device virtual CPU mesh:

  * TP forward == single-device forward for both families (flux covers the
    single_blocks stack and its 5d->d proj_out row shard)
  * per-device param shards really shrink: attention/FFN column/row dims AND
    the AdaLN `.lin` matmuls (27-34% of the big image models' params)
  * per-head-dim rms weights stay replicated (they span head_dim, shared by
    every head — sharding them would be a layout pessimization)
  * TP x Ulysses-SP composition (heads x tokens sharded in one shard_map)
  * fp8-quantized trees get the same specs ({fp8, scale} leaves)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videocof_tpu.models import flux as flux_lib
from videocof_tpu.models import qwenimage as qwen_lib
from videocof_tpu.parallel import (SPContext, make_mesh, make_tp_attention,
                                   tp_param_shardings, validate_tp)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _shard_shape(leaf):
    return leaf.addressable_shards[0].data.shape


# ------------------------------------------------------------------ QwenImage

def _qwen_inputs(cfg, Li=16, Lt=8, batch=1):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, Li, cfg.in_channels)),
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal(
        (batch, Lt, cfg.joint_attention_dim)), jnp.float32)
    t = jnp.full((batch,), 0.6, jnp.float32)
    yy, xx = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    img_ids = jnp.asarray(np.stack([np.zeros_like(yy), yy, xx],
                                   axis=-1).reshape(36, 3), jnp.float32)[:Li]
    txt_ids = jnp.zeros((Lt, 3), jnp.float32)
    return img, txt, t, img_ids, txt_ids


@pytest.fixture(scope="module")
def qwen_setup():
    cfg = qwen_lib.QWENIMAGE_TINY
    params = qwen_lib.init_qwenimage(jax.random.PRNGKey(0), cfg)
    img, txt, t, img_ids, txt_ids = _qwen_inputs(cfg)
    base = np.asarray(qwen_lib.qwenimage_forward(
        params, cfg, img, txt, t, img_ids, txt_ids))
    return cfg, params, (img, txt, t, img_ids, txt_ids), base


def test_qwen_tp_forward_exact(qwen_setup):
    cfg, params, (img, txt, t, img_ids, txt_ids), base = qwen_setup
    mesh = make_mesh(model=4)
    validate_tp(cfg, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh)

    @jax.jit
    def fwd(p, i_, t_):
        return qwen_lib.qwenimage_forward(p, cfg, i_, t_, t, img_ids,
                                          txt_ids, attn_backend=attn)

    out = np.asarray(fwd(sharded, img, txt))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)


def test_qwen_tp_param_shards_are_fractional(qwen_setup):
    cfg, params = qwen_setup[0], qwen_setup[1]
    mesh = make_mesh(model=4)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    b = sharded["blocks"]
    d, hd, L = cfg.inner_dim, cfg.attention_head_dim, cfg.num_layers
    # column: out/4 (incl. the txt-stream add_* projections)
    assert _shard_shape(b["attn"]["q"]["kernel"]) == (L, d, d // 4)
    assert _shard_shape(b["attn"]["add_q"]["kernel"]) == (L, d, d // 4)
    assert _shard_shape(b["img_mlp"]["fc1"]["kernel"]) == (L, d, d)  # 4d/4
    # row: in/4, bias replicated
    assert _shard_shape(b["attn"]["o"]["kernel"]) == (L, d // 4, d)
    assert _shard_shape(b["attn"]["add_o"]["kernel"]) == (L, d // 4, d)
    assert _shard_shape(b["txt_mlp"]["fc2"]["kernel"]) == (L, d, d)  # 4d/4
    assert _shard_shape(b["attn"]["o"]["bias"]) == (L, d)
    # AdaLN linears column-shard (the 27-34%-of-params lever on big models)
    assert _shard_shape(b["img_mod"]["lin"]["kernel"]) == (L, d, 6 * d // 4)
    assert _shard_shape(b["txt_mod"]["lin"]["bias"]) == (L, 6 * d // 4)
    # per-head-dim rms weights replicate (shared across heads)
    assert _shard_shape(b["attn"]["norm_q"]["weight"]) == (L, hd)
    assert _shard_shape(b["attn"]["norm_added_k"]["weight"]) == (L, hd)


def test_qwen_tp_sp_composition_exact(qwen_setup):
    cfg, params = qwen_setup[0], qwen_setup[1]
    # Li=18, Lt=7: neither stream divides sp=2 -> exercises pad + key mask
    img, txt, t, img_ids, txt_ids = _qwen_inputs(cfg, Li=18, Lt=7)
    base = np.asarray(qwen_lib.qwenimage_forward(
        params, cfg, img, txt, t, img_ids, txt_ids))

    mesh = make_mesh(data=2, seq=2, model=2)
    validate_tp(cfg, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh, seq_axis="seq")
    sp = SPContext(mesh)

    @jax.jit
    def fwd(p, i_, t_):
        return qwen_lib.qwenimage_forward(p, cfg, i_, t_, t, img_ids,
                                          txt_ids, attn_backend=attn, sp=sp)

    out = np.asarray(fwd(sharded, img, txt))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)


# ----------------------------------------------------------------------- Flux

def _flux_inputs(cfg, Li=16, Lt=8, batch=1):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((batch, Li, cfg.in_channels)),
                      jnp.float32)
    txt = jnp.asarray(rng.standard_normal(
        (batch, Lt, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal(
        (batch, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((batch,), 0.7, jnp.float32)
    yy, xx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    img_ids = jnp.asarray(np.stack([np.zeros_like(yy), yy, xx],
                                   axis=-1).reshape(16, 3), jnp.float32)[:Li]
    txt_ids = jnp.zeros((Lt, 3), jnp.float32)
    return img, txt, pooled, t, img_ids, txt_ids


@pytest.fixture(scope="module")
def flux_setup():
    cfg = flux_lib.FLUX_TINY
    params = flux_lib.init_flux(jax.random.PRNGKey(1), cfg)
    args = _flux_inputs(cfg)
    base = np.asarray(flux_lib.flux_forward(params, cfg, *args))
    return cfg, params, args, base


def test_flux_tp_forward_exact(flux_setup):
    cfg, params, (img, txt, pooled, t, img_ids, txt_ids), base = flux_setup
    mesh = make_mesh(model=4)
    validate_tp(cfg, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh)

    @jax.jit
    def fwd(p, i_, t_, pp):
        return flux_lib.flux_forward(p, cfg, i_, t_, pp, t, img_ids,
                                     txt_ids, attn_backend=attn)

    out = np.asarray(fwd(sharded, img, txt, pooled))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)


def test_flux_tp_param_shards_are_fractional(flux_setup):
    cfg, params = flux_setup[0], flux_setup[1]
    mesh = make_mesh(model=4)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    d = cfg.inner_dim
    dual, single = sharded["blocks"], sharded["single_blocks"]
    Ld, Ls = cfg.num_layers, cfg.num_single_layers
    assert _shard_shape(dual["attn"]["add_v"]["kernel"]) == (Ld, d, d // 4)
    assert _shard_shape(dual["ff_context"]["fc1"]["kernel"]) == (Ld, d, d)
    assert _shard_shape(dual["norm1"]["lin"]["kernel"]) == (Ld, d, 6 * d // 4)
    # single stack: proj_mlp column, 5d->d proj_out row, AdaLN column
    assert _shard_shape(single["proj_mlp"]["kernel"]) == (Ls, d, d)  # 4d/4
    assert _shard_shape(single["proj_out"]["kernel"]) == (Ls, 5 * d // 4, d)
    assert _shard_shape(single["proj_out"]["bias"]) == (Ls, d)
    assert _shard_shape(single["norm"]["lin"]["kernel"]) == (Ls, d,
                                                             3 * d // 4)
    # top-level head / embedders replicated
    assert _shard_shape(sharded["proj_out"]["kernel"]) == \
        params["proj_out"]["kernel"].shape


def test_flux_tp_sp_composition_exact(flux_setup):
    cfg, params = flux_setup[0], flux_setup[1]
    img, txt, pooled, t, img_ids, txt_ids = _flux_inputs(cfg, Li=14, Lt=7)
    base = np.asarray(flux_lib.flux_forward(
        params, cfg, img, txt, pooled, t, img_ids, txt_ids))

    mesh = make_mesh(data=2, seq=2, model=2)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh, seq_axis="seq")
    sp = SPContext(mesh)

    @jax.jit
    def fwd(p, i_, t_, pp):
        return flux_lib.flux_forward(p, cfg, i_, t_, pp, t, img_ids,
                                     txt_ids, attn_backend=attn, sp=sp)

    out = np.asarray(fwd(sharded, img, txt, pooled))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)


# ------------------------------------------------------------------ fp8 trees

def test_flux_fp8_tree_gets_tp_specs():
    """Quantized {fp8, scale} storage shards like the kernels it replaces
    (fp8 column/row, scales replicated) — the layout the 20B TP fit table
    in docs/SCALING.md assumes."""
    from videocof_tpu.utils.fp8 import quantize_params_fp8
    cfg = flux_lib.FLUX_TINY
    params = flux_lib.init_flux(jax.random.PRNGKey(2), cfg)
    qparams = quantize_params_fp8(params, exclude=flux_lib.FLUX_FP8_EXCLUDE)
    mesh = make_mesh(model=4)
    sharded = jax.device_put(qparams, tp_param_shardings(mesh, qparams))
    d, Ld = cfg.inner_dim, cfg.num_layers
    qk = sharded["blocks"]["attn"]["q"]["kernel"]
    assert _shard_shape(qk["fp8"]) == (Ld, d, d // 4)
    assert _shard_shape(qk["scale"]) == qparams[
        "blocks"]["attn"]["q"]["kernel"]["scale"].shape
    ok = sharded["blocks"]["attn"]["o"]["kernel"]
    assert _shard_shape(ok["fp8"]) == (Ld, d // 4, d)


# ------------------------------------------------------------------ CogVideoX

def test_cogvideox_tp_forward_exact():
    """The name rules cover CogVideoX too: q/k/v/o + ff column/row, the
    norm1/norm2 AdaLN .lin matmuls column, per-head-dim qk LayerNorms
    replicated — TP forward == single-device."""
    from videocof_tpu.models import cogvideox as cog

    cfg = cog.COGVIDEOX_TINY
    params = cog.init_cogvideox(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, cfg.in_channels, 6, 6)),
                    jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 7, cfg.text_embed_dim)),
                      jnp.float32)
    t = jnp.asarray([500.0])
    base = np.asarray(cog.cogvideox_forward(params, cfg, x, txt, t))

    mesh = make_mesh(model=4)
    validate_tp(cfg, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    d = cfg.inner_dim
    b = sharded["blocks"]
    assert _shard_shape(b["attn"]["q"]["kernel"])[-1] == d // 4
    assert _shard_shape(b["ff"]["fc2"]["kernel"])[-2] == d  # 4d/4
    assert _shard_shape(b["norm1"]["lin"]["kernel"])[-1] == 6 * d // 4
    assert _shard_shape(b["attn"]["norm_q"]["scale"])[-1] == \
        cfg.attention_head_dim                      # replicated
    attn = make_tp_attention(mesh)

    @jax.jit
    def fwd(p, xx, tt):
        return cog.cogvideox_forward(p, cfg, xx, tt, t, attn_backend=attn)

    out = np.asarray(fwd(sharded, x, txt))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)
