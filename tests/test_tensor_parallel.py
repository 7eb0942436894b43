"""Tensor parallelism: exactness, memory sharding, and SP composition.

The TP design is GSPMD-native (parallel/tp.py): column/row NamedShardings on
the block params, unchanged forward. These tests run on the 8-device virtual
CPU mesh (conftest) and check

  * TP forward == single-device forward (bit-level tolerance, fp32)
  * per-device parameter shards are actually 1/tp of the column/row dims
  * the compiled module contains the Megatron all-reduce pattern
  * TP x Ulysses-SP composition inside one shard_map attention
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videocof_tpu.configs import WanDiTConfig
from videocof_tpu.models import wan_dit
from videocof_tpu.parallel import (make_mesh, make_tp_attention,
                                   tp_param_shardings, validate_tp)

CFG = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                   text_dim=32, text_len=16, freq_dim=32)
GRID = (3, 2, 2)


def _inputs(cfg=CFG, grid=GRID, batch=1):
    rng = np.random.default_rng(0)
    f, h, w = grid
    pt, ph, pw = cfg.patch_size
    x = rng.standard_normal((batch, cfg.in_dim, f * pt, h * ph, w * pw)
                            ).astype(np.float32)
    t = np.full((batch,), 500.0, np.float32)
    ctx = rng.standard_normal((batch, cfg.text_len, cfg.text_dim)
                              ).astype(np.float32)
    cos, sin = wan_dit.make_rope_for_geometry(cfg, grid)
    return (jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            jnp.asarray(cos), jnp.asarray(sin))


@pytest.fixture(scope="module")
def params():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(1), CFG, jnp.float32)


@pytest.fixture(scope="module")
def ref_out(params):
    args = _inputs()
    return np.asarray(wan_dit.wan_dit_forward(params, CFG, *args))


def test_tp_forward_exact(params, ref_out):
    mesh = make_mesh(model=4)
    validate_tp(CFG, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh)
    args = _inputs()

    @jax.jit
    def fwd(p, *a):
        return wan_dit.wan_dit_forward(p, CFG, *a, attn_backend=attn)

    out = np.asarray(fwd(sharded, *args))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_tp_param_shards_are_fractional(params):
    mesh = make_mesh(model=4)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    blocks = sharded["blocks"]

    def shard_shape(leaf):
        return leaf.addressable_shards[0].data.shape

    d, f = CFG.dim, CFG.ffn_dim
    L = CFG.num_layers
    # column-parallel: out dim / 4
    assert shard_shape(blocks["self_attn"]["q"]["kernel"]) == (L, d, d // 4)
    assert shard_shape(blocks["self_attn"]["q"]["bias"]) == (L, d // 4)
    assert shard_shape(blocks["self_attn"]["norm_q"]["weight"]) == (L, d // 4)
    assert shard_shape(blocks["ffn"]["fc1"]["kernel"]) == (L, d, f // 4)
    # row-parallel: in dim / 4, bias replicated
    assert shard_shape(blocks["self_attn"]["o"]["kernel"]) == (L, d // 4, d)
    assert shard_shape(blocks["self_attn"]["o"]["bias"]) == (L, d)
    assert shard_shape(blocks["ffn"]["fc2"]["kernel"]) == (L, f // 4, d)
    # AdaLN modulation replicated
    assert shard_shape(blocks["modulation"]) == (L, 6, d)


def test_tp_compiled_has_all_reduce(params):
    mesh = make_mesh(model=4)
    shardings = tp_param_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)
    attn = make_tp_attention(mesh)
    args = _inputs()

    lowered = jax.jit(
        lambda p, *a: wan_dit.wan_dit_forward(p, CFG, *a, attn_backend=attn)
    ).lower(sharded, *args)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt, "expected Megatron o-proj/fc2 all-reduces"


def test_tp_sp_composition_exact(params, ref_out):
    """TP=2 x SP=2 x data=2: heads and tokens sharded together; the full
    whole-forward SP constraints plus TP params still reproduce the
    single-device forward."""
    from videocof_tpu.parallel import SPContext

    mesh = make_mesh(data=2, seq=2, model=2)
    validate_tp(CFG, mesh)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_tp_attention(mesh, seq_axis="seq")
    sp = SPContext(mesh)
    args = _inputs(batch=2)

    @jax.jit
    def fwd(p, *a):
        return wan_dit.wan_dit_forward(p, CFG, *a, attn_backend=attn,
                                       sp=sp)

    out = np.asarray(fwd(sharded, *args))
    ref2 = np.asarray(wan_dit.wan_dit_forward(params, CFG, *args))
    np.testing.assert_allclose(out, ref2, atol=1e-4, rtol=1e-4)


def test_validate_tp_rejects_indivisible():
    mesh = make_mesh(model=8)
    bad = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=1,
                       text_dim=32, text_len=16, freq_dim=32)
    with pytest.raises(ValueError):
        validate_tp(bad, mesh)


def test_tp_pipeline_matches_single_device():
    """End-to-end pipeline with TP=2 x SP=2 reproduces single-device output
    (enable_sequence_parallel(model=2) re-places the DiT params with
    column/row shardings and swaps in the heads-local attention)."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg), dcfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg), vcfg,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)

    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=11)
    base = pipe(video, "remove the red ball", **kw)
    pipe.enable_sequence_parallel(data=1, seq=2, model=2)
    try:
        tp = pipe(video, "remove the red ball", **kw)
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(tp.videos, base.videos, atol=2e-2)
    np.testing.assert_allclose(tp.ground_videos, base.ground_videos,
                               atol=2e-2)


def test_tp_ring_composition_exact(params, ref_out):
    """TP=2 x ring-SP=2: heads sharded on 'model' while K/V blocks rotate
    tokens around the 'seq' ring inside each head group."""
    from videocof_tpu.parallel import make_ring_attention

    mesh = make_mesh(data=1, seq=2, model=2)
    sharded = jax.device_put(params, tp_param_shardings(mesh, params))
    attn = make_ring_attention(mesh, model_axis="model")
    args = _inputs()

    out = np.asarray(jax.jit(
        lambda p, *a: wan_dit.wan_dit_forward(p, CFG, *a,
                                              attn_backend=attn))(
        sharded, *args))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_tp_wan22_moe_pipeline_matches_single_device():
    """enable_sequence_parallel(model=2) on the dual-expert MoE re-places
    BOTH experts with TP shardings; the boundary-routed trajectory still
    reproduces single-device outputs."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import Wan22Pipeline

    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = Wan22Pipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg), dcfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(2), vcfg), vcfg,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(3), T5_TINY), T5_TINY,
        dtype=jnp.float32,
        dit_params_2=wan_dit.init_wan_dit(jax.random.PRNGKey(1), dcfg),
        boundary=0.875)
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    kw = dict(source_frames=9, num_inference_steps=4, guidance_scale=1.0,
              cot=False, seed=5)
    base = pipe(video, "make it snow", **kw)
    pipe.enable_sequence_parallel(data=1, seq=2, model=2)
    try:
        tp = pipe(video, "make it snow", **kw)
        # both experts' weights are column/row sharded
        q1 = pipe.dit_params["blocks"]["self_attn"]["q"]["kernel"]
        q2 = pipe.dit_params_2["blocks"]["self_attn"]["q"]["kernel"]
        for q in (q1, q2):
            assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 2
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(tp.videos, base.videos, atol=2e-2)


def test_tp_shardings_handle_fp8_storage(params):
    """The 14B multi-chip path: fp8-quantized {"fp8","scale"} kernel leaves
    get the same column/row shards as the bf16 kernels; per-layer scales
    replicate."""
    from videocof_tpu.utils.fp8 import quantize_params_fp8

    qparams = quantize_params_fp8(params)
    q = qparams["blocks"]["self_attn"]["q"]["kernel"]
    assert "fp8" in q and "scale" in q
    mesh = make_mesh(model=4)
    sharded = jax.device_put(qparams, tp_param_shardings(mesh, qparams))
    d = CFG.dim
    L = CFG.num_layers
    blk = sharded["blocks"]
    assert blk["self_attn"]["q"]["kernel"]["fp8"].addressable_shards[
        0].data.shape == (L, d, d // 4)
    assert blk["ffn"]["fc2"]["kernel"]["fp8"].addressable_shards[
        0].data.shape == (L, CFG.ffn_dim // 4, d)
    # scales replicate (full shape on every device)
    sc = blk["self_attn"]["q"]["kernel"]["scale"]
    assert sc.addressable_shards[0].data.shape == sc.shape

    # end-to-end: the TP-sharded fp8 forward matches the unsharded fp8
    # forward (dequant-inside-the-scan under column/row sharding)
    attn = make_tp_attention(mesh)
    args = _inputs()
    ref_q = np.asarray(wan_dit.wan_dit_forward(qparams, CFG, *args))
    out_q = np.asarray(jax.jit(
        lambda p, *a: wan_dit.wan_dit_forward(p, CFG, *a,
                                              attn_backend=attn))(
        sharded, *args))
    # fp8 dequant computes in bf16; splitting the o-proj/fc2 contractions
    # across 4 shards reassociates bf16 partial sums -> bf16-ULP-level
    # differences, not exactness
    np.testing.assert_allclose(out_q, ref_q, atol=3e-2, rtol=3e-2)


def test_tp_fsdp_training_step():
    """3D training layout (dp x sp x tp): the train step runs with TP x
    FSDP param/optimizer shardings and matches the single-device loss."""
    import optax
    from videocof_tpu.training import make_train_step

    cfg = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                       text_dim=32, text_len=16, freq_dim=32)
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg, jnp.float32)
    f, h, w = 4, 2, 2
    pt, ph, pw = cfg.patch_size
    B = 2
    rng = np.random.default_rng(3)
    batch = {
        "x0": jnp.asarray(rng.standard_normal(
            (B, cfg.in_dim, f * pt, h * ph, w * pw)), jnp.float32),
        "context": jnp.asarray(rng.standard_normal(
            (B, cfg.text_len, cfg.text_dim)), jnp.float32),
        "timesteps": jnp.asarray([200, 700], jnp.int32),
    }
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w))
    batch["rope_cos"], batch["rope_sin"] = jnp.asarray(cos), jnp.asarray(sin)

    def one_step(mesh):
        init_fn, step_fn = make_train_step(
            mesh, cfg, optax.adamw(1e-4), use_ulysses=True,
            fsdp_min_size=1024)
        state = init_fn(params)
        state, loss = step_fn(state, dict(batch), jax.random.PRNGKey(7))
        return state, float(loss)

    state3d, loss3d = one_step(make_mesh(data=2, seq=2, model=2))
    _, loss1d = one_step(make_mesh(data=1, seq=1, model=1))
    assert np.isfinite(loss3d)
    np.testing.assert_allclose(loss3d, loss1d, rtol=1e-4, atol=1e-4)
    # TP column shard AND an FSDP shard both land on the kernels
    # ([L, d, d]: model on the out dim, data on the biggest free dim)
    qk = state3d.params["blocks"]["self_attn"]["q"]["kernel"]
    assert qk.addressable_shards[0].data.shape == (
        cfg.num_layers, cfg.dim // 2, cfg.dim // 2)
    # optimizer state (adam mu) carries the same 2D layout
    mu_q = jax.tree.leaves(jax.tree_util.tree_map_with_path(
        lambda p, x: x, state3d.opt_state))  # smoke: tree is sharded+finite
    assert all(np.isfinite(np.asarray(l)).all() for l in mu_q
               if hasattr(l, 'shape') and l.size)
