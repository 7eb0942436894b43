"""Sequence-parallel pipeline inference on the virtual mesh must reproduce
single-device outputs (the reference cannot do this: its USP forward drops
the CoF indices — SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)


@pytest.mark.parametrize("mode", ["ulysses", "ring"])
def test_sp_pipeline_matches_single_device(pipe, mode):
    # 9 src frames at 32x32 -> latents 7x4x4 -> 112 tokens, divisible by 4
    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=11)
    pipe.disable_sequence_parallel()
    base = pipe(video, "remove the red ball", **kw)
    pipe.enable_sequence_parallel(data=1, seq=4, mode=mode)
    try:
        sp = pipe(video, "remove the red ball", **kw)
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(sp.videos, base.videos, atol=2e-2)
    # CoF repeat-RoPE was active the whole time (segment positions flow as
    # data) — outputs agree including the grounding segment
    np.testing.assert_allclose(sp.ground_videos, base.ground_videos,
                               atol=2e-2)


@pytest.mark.parametrize("mode", ["ulysses", "ring"])
def test_sp_forward_non_dividing_tokens(mode):
    """Token counts that do NOT divide the seq axis get padded + key-masked
    (VERDICT r1: pad_tokens_for_sp used to be dead code)."""
    from videocof_tpu.parallel import (SPContext, make_mesh,
                                       make_ring_attention,
                                       make_ulysses_attention)
    cfg = DCFG
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(3), cfg)
    f, h, w = 5, 3, 3                     # L = 45: does not divide 4
    pt, ph, pw = cfg.patch_size
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (1, cfg.in_dim, f * pt, h * ph, w * pw))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(5),
                            (1, cfg.text_len, cfg.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w), f_src=2,
                                              f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    base = np.asarray(wan_dit.wan_dit_forward(params, cfg, x, t, ctx,
                                              cos, sin))
    mesh = make_mesh(data=1, seq=4)
    maker = {"ulysses": make_ulysses_attention,
             "ring": make_ring_attention}[mode]
    out = np.asarray(jax.jit(
        lambda *a: wan_dit.wan_dit_forward(
            *a, attn_backend=maker(mesh), sp=SPContext(mesh)),
        static_argnums=(1,))(params, cfg, x, t, ctx, cos, sin))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=1e-4)


def test_sp_pipeline_non_dividing_geometry(pipe):
    """End-to-end pipeline at a geometry whose token count doesn't divide
    the mesh (5 src frames at 32x48 -> CoT latents 5x2x3 = 30 tokens)."""
    video = np.random.default_rng(2).uniform(
        -1, 1, (1, 3, 5, 32, 48)).astype(np.float32)
    kw = dict(source_frames=5, reasoning_frames=4, num_inference_steps=2,
              seed=7)
    pipe.disable_sequence_parallel()
    base = pipe(video, "add a hat", **kw)
    pipe.enable_sequence_parallel(data=1, seq=4, mode="ring")
    try:
        sp = pipe(video, "add a hat", **kw)
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(sp.videos, base.videos, atol=2e-2)


def test_sp_token_stream_actually_sharded():
    """The residual stream's device-local shard is L/sp — the whole block
    stack (FFN included) runs token-sharded, not replicated."""
    from videocof_tpu.parallel import SPContext, make_mesh
    mesh = make_mesh(data=1, seq=4)
    spc = SPContext(mesh)
    x = jnp.zeros((2, 112, 64))

    out = jax.jit(lambda v: spc.shard_tokens(v) * 2.0)(x)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 28, 64)}, shard_shapes

    gathered = jax.jit(lambda v: spc.gather(spc.shard_tokens(v)))(x)
    assert {s.data.shape for s in gathered.addressable_shards} == {
        (2, 112, 64)}


def test_cfg_parallel_matches_single_device(pipe):
    """CFG parallelism (ref dist/fuser.py:35-49): cond/uncond split over the
    data axis must reproduce single-device CFG output exactly."""
    video = np.random.default_rng(3).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              guidance_scale=5.0, negative_prompt="blurry", seed=13)
    pipe.disable_sequence_parallel()
    base = pipe(video, "swap the cup with a vase", **kw)
    pipe.enable_sequence_parallel(data=2, seq=2, mode="ulysses",
                                  cfg_parallel=True)
    try:
        par = pipe(video, "swap the cup with a vase", **kw)
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(par.videos, base.videos, atol=2e-2)


def test_cfg_parallel_requires_data_axis(pipe):
    with pytest.raises(ValueError, match="data axis"):
        pipe.enable_sequence_parallel(data=1, seq=4, cfg_parallel=True)
    pipe.disable_sequence_parallel()
