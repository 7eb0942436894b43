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
