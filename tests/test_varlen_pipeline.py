"""Ragged (mixed-length) batch editing equals per-item runs (VERDICT r3 #8).

Two videos with different frame counts run as ONE denoise batch through
`pipeline.varlen.batch_edit` (per-sample rope-as-data + seq_lens key masks +
per-sample freeze boundaries); every item's latents and decoded videos must
EXACTLY match its own per-item `pipe(...)` run. Reference semantics:
per-sample q_lens/k_lens varlen packing (`attention_utils.py:113-146`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline, batch_edit

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        dit_params=wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG),
        dit_cfg=DCFG,
        vae_params=wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG),
        vae_cfg=VCFG,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY),
        t5_cfg=T5_TINY,
        dtype=jnp.float32,
    )


def _mk(seed, frames):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (3, frames, 32, 32)).astype(np.float32)


@pytest.mark.parametrize("guidance", [1.0, 4.5])
def test_batch_edit_matches_per_item(pipe, guidance):
    videos = [_mk(0, 9), _mk(1, 17)]           # 3 vs 5 latent cond frames
    src = [9, 17]
    rng = np.random.default_rng(7)
    embeds = [rng.standard_normal((DCFG.text_len, DCFG.text_dim))
              .astype(np.float32) for _ in range(2)]
    negs = [rng.standard_normal((DCFG.text_len, DCFG.text_dim))
            .astype(np.float32) for _ in range(2)]

    outs = batch_edit(
        pipe, videos, src, embeds, reasoning_frames=4,
        num_inference_steps=2, guidance_scale=guidance,
        negative_prompt_embeds=negs if guidance > 1.0 else None,
        seeds=[0, 1], output_latents=True)

    for i in range(2):
        ref = pipe(videos[i][None], "p", source_frames=src[i],
                   reasoning_frames=4, num_inference_steps=2,
                   guidance_scale=guidance,
                   prompt_embeds=jnp.asarray(embeds[i][None]),
                   negative_prompt_embeds=(jnp.asarray(negs[i][None])
                                           if guidance > 1.0 else None),
                   negative_prompt="n" if guidance > 1.0 else "",
                   seed=i, fused_sampling=False, output_latents=True)
        np.testing.assert_allclose(outs[i].latents, ref.latents,
                                   rtol=5e-5, atol=5e-5, err_msg=f"item {i}")
        # decoded frames are u8-quantized: float-epsilon latent deltas can
        # flip a value sitting ON a rounding boundary by one step (1/255)
        np.testing.assert_allclose(outs[i].videos, ref.videos,
                                   atol=1.01 / 255, err_msg=f"item {i}")
        assert outs[i].edit_videos.shape == ref.edit_videos.shape


def test_batch_edit_rejects_sp_pipelines(pipe):
    """batch_edit never threads sp= through the DiT, so SP/TP/cfg-parallel
    backends would mis-partition the unsharded tokens — it must refuse
    loudly instead of silently mis-computing."""
    pipe.sp_mesh = object()
    try:
        with pytest.raises(NotImplementedError, match="sequence/tensor"):
            batch_edit(pipe, [_mk(0, 9)], [9],
                       [np.zeros((DCFG.text_len, DCFG.text_dim), np.float32)],
                       reasoning_frames=4, num_inference_steps=1,
                       guidance_scale=1.0, seeds=[0])
    finally:
        pipe.sp_mesh = None
