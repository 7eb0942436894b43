"""LoRA fusion algebra + TeaCache planning + cfg-skip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.models.lora import merge_lora, unmerge_lora
from videocof_tpu.models.teacache import (get_teacache_coefficients,
                                          plan_teacache_skips)

CFG = WAN_TINY


@pytest.fixture(scope="module")
def params():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)


def _rand_lora(rng, dout, din, rank=4):
    return (rng.standard_normal((rank, din)).astype(np.float32),
            rng.standard_normal((dout, rank)).astype(np.float32))


def test_merge_lora_kohya_format(params):
    rng = np.random.default_rng(0)
    down, up = _rand_lora(rng, CFG.dim, CFG.dim)
    sd = {
        "lora_unet_blocks_1_self_attn_q.lora_down.weight": down,
        "lora_unet_blocks_1_self_attn_q.lora_up.weight": up,
        "lora_unet_blocks_1_self_attn_q.alpha": np.float32(2.0),
    }
    merged = merge_lora(params, CFG, sd, multiplier=1.0)
    old = params["blocks"]["self_attn"]["q"]["kernel"]
    new = merged["blocks"]["self_attn"]["q"]["kernel"]
    want_delta = (2.0 / 4) * (up @ down).T
    np.testing.assert_allclose(np.asarray(new[1] - old[1]), want_delta,
                               rtol=1e-4, atol=1e-5)
    # untouched layer and modules
    np.testing.assert_array_equal(np.asarray(new[0]), np.asarray(old[0]))
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["self_attn"]["k"]["kernel"]),
        np.asarray(params["blocks"]["self_attn"]["k"]["kernel"]))


def test_merge_lora_peft_format(params):
    rng = np.random.default_rng(1)
    down, up = _rand_lora(rng, CFG.ffn_dim, CFG.dim)
    sd = {
        "diffusion_model.blocks.0.ffn.0.lora_A.weight": down,
        "diffusion_model.blocks.0.ffn.0.lora_B.weight": up,
    }
    merged = merge_lora(params, CFG, sd)
    delta = np.asarray(merged["blocks"]["ffn"]["fc1"]["kernel"][0] -
                       params["blocks"]["ffn"]["fc1"]["kernel"][0])
    np.testing.assert_allclose(delta, (up @ down).T, rtol=1e-4, atol=1e-5)


def test_merge_unmerge_roundtrip(params):
    rng = np.random.default_rng(2)
    down, up = _rand_lora(rng, CFG.dim, CFG.dim)
    sd = {
        "lora_unet_head_head.lora_down.weight":
            rng.standard_normal((4, CFG.dim)).astype(np.float32),
        "lora_unet_head_head.lora_up.weight":
            rng.standard_normal((CFG.patch_size[0] * 4 * CFG.out_dim, 4)
                                ).astype(np.float32),
        "diffusion_model.blocks.1.cross_attn.v.lora_A.weight": down,
        "diffusion_model.blocks.1.cross_attn.v.lora_B.weight": up,
    }
    merged = merge_lora(params, CFG, sd, multiplier=0.7)
    restored = unmerge_lora(merged, CFG, sd, multiplier=0.7)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lora_changes_forward(params):
    rng = np.random.default_rng(3)
    down, up = _rand_lora(rng, CFG.dim, CFG.dim)
    sd = {"diffusion_model.blocks.0.self_attn.o.lora_A.weight": down * 0.1,
          "diffusion_model.blocks.0.self_attn.o.lora_B.weight": up * 0.1}
    merged = merge_lora(params, CFG, sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.in_dim, 3, 4, 4))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, CFG.text_len, CFG.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (3, 2, 2))
    a = wan_dit.wan_dit_forward(params, CFG, x, t, ctx, jnp.asarray(cos),
                                jnp.asarray(sin))
    b = wan_dit.wan_dit_forward(merged, CFG, x, t, ctx, jnp.asarray(cos),
                                jnp.asarray(sin))
    assert np.abs(np.asarray(a - b)).max() > 1e-6


def test_teacache_coefficients_lookup():
    assert get_teacache_coefficients("/models/Wan2.1-T2V-14B") is not None
    assert get_teacache_coefficients("wan2.1-t2v-1.3B-something") is not None
    assert get_teacache_coefficients("unknown-model") is None


def test_teacache_alias_table_matches_reference():
    """Every checkpoint-name alias the reference maps
    (`videox_fun/models/cache_utils.py:5-15`) resolves to the same
    coefficient set here — including the Fun/VACE/Wan2.2 names that
    previously fell through to the wrong size-based fallback."""
    from videocof_tpu.models.teacache import TEACACHE_COEFFICIENTS as C
    cases = {
        "models/Wan2.1-Fun-1.3B-InP": "wan2.1-t2v-1.3b",
        "Wan2.1-Fun-V1.1-1.3B-Control": "wan2.1-t2v-1.3b",
        "wan2.1-vace-1.3b": "wan2.1-t2v-1.3b",
        "Wan2.1-T2V-14B": "wan2.1-t2v-14b",
        "Wan2.1-I2V-14B-480P": "wan2.1-i2v-14b-480p",
        "Wan2.1-I2V-14B-720P": "wan2.1-i2v-14b-720p",
        # the 720p set covers the whole Fun-14B / Wan2.2 family
        "Wan2.1-Fun-14B-InP": "wan2.1-i2v-14b-720p",
        "Wan2.2-Fun-A14B-Control": "wan2.1-i2v-14b-720p",
        "Wan2.2-I2V-A14B": "wan2.1-i2v-14b-720p",
        "Wan2.2-T2V-A14B": "wan2.1-i2v-14b-720p",
        "Wan2.2-TI2V-5B": "wan2.1-i2v-14b-720p",
        "Wan2.2-S2V-14B": "wan2.1-i2v-14b-720p",
        "Wan2.1-VACE-14B": "wan2.1-i2v-14b-720p",
        "Wan2.2-VACE-Fun-A14B": "wan2.1-i2v-14b-720p",
    }
    for name, key in cases.items():
        assert get_teacache_coefficients(name) == C[key], name

    # oracle: the reference function itself (standalone file, torch+numpy
    # imports only) must agree on every alias above
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_cache_utils", "/root/reference/videox_fun/models/cache_utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    for name in cases:
        assert get_teacache_coefficients(name) == \
            ref.get_teacache_coefficients(name), name


def test_teacache_plan_structure(params):
    ts = np.array([999, 900, 800, 700, 600, 500, 400, 300], np.float32)
    skips = plan_teacache_skips(params, CFG, ts,
                                get_teacache_coefficients("wan2.1-t2v-14b"),
                                rel_l1_thresh=1e9, num_skip_start_steps=2)
    # huge threshold: everything skippable except forced-compute start steps
    assert skips[:2] == [False, False]
    assert all(skips[2:])
    skips2 = plan_teacache_skips(params, CFG, ts,
                                 get_teacache_coefficients("wan2.1-t2v-14b"),
                                 rel_l1_thresh=-1e9, num_skip_start_steps=0)
    assert not any(skips2)  # unreachably low threshold: never skip


def test_teacache_skip_reuses_residual(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.in_dim, 3, 4, 4))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, CFG.text_len, CFG.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (3, 2, 2))
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    full, res = wan_dit.wan_dit_forward_with_residual(
        params, CFG, x, t, ctx, cos, sin)
    skipped, _ = wan_dit.wan_dit_forward_with_residual(
        params, CFG, x, t, ctx, cos, sin, residual=res, skip_blocks=True)
    # same x and same residual => identical output (cache exactness)
    np.testing.assert_allclose(np.asarray(full), np.asarray(skipped),
                               rtol=1e-5, atol=1e-5)


def test_fused_teacache_matches_stepwise():
    """A precomputed TeaCache schedule riding the fused scan (traced
    skip + carried residual) must match the stepwise TeaCache loop."""
    import jax.numpy as jnp
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
    video = np.random.default_rng(0).uniform(-1, 1, (1, 3, 9, 32, 32)
                                             ).astype(np.float32)
    # huge threshold + start=2 -> steps [F, F, T, T]: both branches exercised
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=4,
              seed=9, enable_teacache=True, teacache_threshold=1e9,
              teacache_skip_start_steps=2)
    stepwise = pipe(video, "remove the bird", fused_sampling=False, **kw)
    fused = pipe(video, "remove the bird", fused_sampling=True, **kw)
    np.testing.assert_allclose(fused.videos, stepwise.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    # and the schedule actually skipped: fused differs from the no-teacache
    # trajectory
    plain = pipe(video, "remove the bird", fused_sampling=True,
                 source_frames=9, reasoning_frames=4, num_inference_steps=4,
                 seed=9)
    assert np.abs(fused.videos - plain.videos).max() > 1e-4
