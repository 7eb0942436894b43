"""End-to-end CoF training loop test (tiny configs, synthetic triplets)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.data.tokenizer import WanTokenizer
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.training.trainer import CoFTrainer, TrainerConfig
from videocof_tpu.training.train_step import flow_matching_loss

VCFG = VAE_TINY
DCFG = WAN_TINY.replace(in_dim=VCFG.z_dim, out_dim=VCFG.z_dim,
                        text_dim=T5_TINY.dim)


def _fake_samples():
    rng = np.random.default_rng(0)
    while True:
        yield {
            "pixel_src": rng.uniform(-1, 1, (3, 9, 32, 32)).astype(np.float32),
            "pixel_ground": rng.uniform(-1, 1, (3, 4, 32, 32)
                                        ).astype(np.float32),
            "pixel_tgt": rng.uniform(-1, 1, (3, 9, 32, 32)).astype(np.float32),
            "text": "A video sequence showing three parts: ...",
        }


def test_trainer_end_to_end_loss_decreases():
    tcfg = TrainerConfig(height=32, width=32, source_frames=9,
                         target_frames=9, reasoning_frames=4, batch_size=1,
                         total_steps=4, learning_rate=5e-4, log_every=1)
    trainer = CoFTrainer(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VCFG), VCFG,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        WanTokenizer(vocab_size=T5_TINY.vocab), tcfg)
    # CoF geometry: 3 src + 1 ground + 3 tgt
    assert (trainer.f_src, trainer.f_ground, trainer.f_tgt) == (3, 1, 3)
    state = trainer.train(_fake_samples(), total_steps=4)
    assert int(jax.device_get(state.step)) == 4


def test_frame_mask_keeps_source_clean():
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG)
    B, C, F, H, W = 1, DCFG.in_dim, 7, 4, 4
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, C, F, H, W))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (B, DCFG.text_len, DCFG.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(DCFG, (F, 2, 2), f_src=3,
                                              f_ground=1)
    mask = jnp.asarray(np.array([0, 0, 0, 1, 1, 1, 1], np.float32))
    t = jnp.array([700], jnp.int32)

    # loss must be invariant to noise values on masked-out (source) frames
    noise2 = noise.at[:, :, :3].set(0.0)
    l1 = flow_matching_loss(params, DCFG, x0, ctx, jnp.asarray(cos),
                            jnp.asarray(sin), t, noise, frame_mask=mask,
                            remat=False)
    l2 = flow_matching_loss(params, DCFG, x0, ctx, jnp.asarray(cos),
                            jnp.asarray(sin), t, noise2, frame_mask=mask,
                            remat=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
