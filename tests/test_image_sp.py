"""Sequence parallelism for the non-Wan families (CogVideoX / Flux /
QwenImage), matching the reference's per-family xfuser adapters
(`videox_fun/dist/cogvideox_xfuser.py:13-105`, `flux_xfuser.py:1-167`,
`qwen_xfuser.py:1-175`): the joint text+image sequence is token-sharded over
the mesh's seq axis (per-stream padding + key masking for non-dividing
lengths) and attention runs Ulysses all-to-all over ICI.

Each family asserts (a) exactness vs the single-device forward, including
NON-dividing per-stream lengths, and (b) that the compiled program really
contains the Ulysses all-to-all — i.e. the token stream is actually sharded,
not silently replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.models import cogvideox as cog
from videocof_tpu.models import flux as flux_lib
from videocof_tpu.models import qwenimage as qwen_lib
from videocof_tpu.parallel import (SPContext, make_mesh,
                                   make_ulysses_attention)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


def _sp_pair(seq=4):
    mesh = make_mesh(data=1, seq=seq)
    return make_ulysses_attention(mesh), SPContext(mesh)


def _assert_all_to_all(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    assert "all-to-all" in txt, "no all-to-all: tokens were not SP-sharded"


# ------------------------------------------------------------------ CogVideoX

@pytest.mark.parametrize("rope", [False, True])
def test_cogvideox_sp_exact(rope):
    cfg = cog.COGVIDEOX_TINY.replace(use_rotary_positional_embeddings=rope)
    params = cog.init_cogvideox(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # F=2, H=W=6 -> 2*3*3 = 18 video tokens; Lt=7 text tokens — NEITHER
    # divides the 4-way seq axis
    x = rng.standard_normal((1, 2, cfg.in_channels, 6, 6)).astype(np.float32)
    txt = rng.standard_normal((1, 7, cfg.text_embed_dim)).astype(np.float32)
    t = jnp.asarray([500.0])

    base = np.asarray(cog.cogvideox_forward(params, cfg, jnp.asarray(x),
                                            jnp.asarray(txt), t))
    backend, sp = _sp_pair()

    def fwd(p, xx, tt):
        return cog.cogvideox_forward(p, cfg, xx, tt, t,
                                     attn_backend=backend, sp=sp)

    out = np.asarray(jax.jit(fwd)(params, jnp.asarray(x), jnp.asarray(txt)))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)
    _assert_all_to_all(fwd, params, jnp.asarray(x), jnp.asarray(txt))


# ----------------------------------------------------------------------- Flux

def test_flux_sp_exact():
    cfg = flux_lib.FLUX_TINY
    params = flux_lib.init_flux(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    Li, Lt = 18, 7                     # neither divides 4
    img = rng.standard_normal((1, Li, cfg.in_channels)).astype(np.float32)
    txt = rng.standard_normal((1, Lt, cfg.joint_attention_dim)).astype(
        np.float32)
    pooled = rng.standard_normal((1, cfg.pooled_projection_dim)).astype(
        np.float32)
    t = jnp.asarray([0.7])
    yy, xx = np.meshgrid(np.arange(3), np.arange(6), indexing="ij")
    img_ids = jnp.asarray(np.stack([np.zeros_like(yy), yy, xx],
                                   axis=-1).reshape(Li, 3), jnp.float32)
    txt_ids = jnp.zeros((Lt, 3), jnp.float32)

    base = np.asarray(flux_lib.flux_forward(
        params, cfg, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(pooled),
        t, img_ids, txt_ids))
    backend, sp = _sp_pair()

    def fwd(p, i_, t_, pp):
        return flux_lib.flux_forward(p, cfg, i_, t_, pp, t, img_ids, txt_ids,
                                     attn_backend=backend, sp=sp)

    out = np.asarray(jax.jit(fwd)(params, jnp.asarray(img), jnp.asarray(txt),
                                  jnp.asarray(pooled)))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)
    _assert_all_to_all(fwd, params, jnp.asarray(img), jnp.asarray(txt),
                       jnp.asarray(pooled))


# ------------------------------------------------------------------ QwenImage

def test_qwenimage_sp_exact_with_ragged_text():
    cfg = qwen_lib.QWENIMAGE_TINY
    params = qwen_lib.init_qwenimage(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    Li, Lt = 18, 7
    img = rng.standard_normal((1, Li, cfg.in_channels)).astype(np.float32)
    txt = rng.standard_normal((1, Lt, cfg.joint_attention_dim)).astype(
        np.float32)
    mask = np.ones((1, Lt), np.int32)
    mask[0, 5:] = 0                     # ragged text length
    t = jnp.asarray([0.4])
    img_ids, txt_ids = qwen_lib.qwen_position_ids((2, 3, 3), Lt)

    base = np.asarray(qwen_lib.qwenimage_forward(
        params, cfg, jnp.asarray(img), jnp.asarray(txt), t, img_ids, txt_ids,
        encoder_hidden_states_mask=jnp.asarray(mask)))
    backend, sp = _sp_pair()

    def fwd(p, i_, t_, m_):
        return qwen_lib.qwenimage_forward(
            p, cfg, i_, t_, t, img_ids, txt_ids,
            encoder_hidden_states_mask=m_, attn_backend=backend, sp=sp)

    out = np.asarray(jax.jit(fwd)(params, jnp.asarray(img), jnp.asarray(txt),
                                  jnp.asarray(mask)))
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)
    _assert_all_to_all(fwd, params, jnp.asarray(img), jnp.asarray(txt),
                       jnp.asarray(mask))


# ------------------------------------------------------- pipeline-level wire

def test_qwen_pipeline_sequence_parallel_matches():
    from videocof_tpu.pipeline.image_pipelines import QwenImagePipeline
    # out_channels=2 so proj_out's p^2 * out == the packed latent width
    cfg = qwen_lib.QWENIMAGE_TINY.replace(out_channels=2)
    params = qwen_lib.init_qwenimage(jax.random.PRNGKey(3), cfg)
    pipe = QwenImagePipeline(params, cfg)
    rng = np.random.default_rng(3)
    txt = rng.standard_normal((1, 6, cfg.joint_attention_dim)).astype(
        np.float32)
    kw = dict(height=48, width=48, num_inference_steps=2,
              true_cfg_scale=1.0, seed=0)
    base = pipe(jnp.asarray(txt), **kw)
    pipe.enable_sequence_parallel(data=1, seq=4)
    try:
        out = pipe(jnp.asarray(txt), **kw)
    finally:
        pipe.disable_sequence_parallel()
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=2e-4)
