"""End-to-end CoF editing pipeline on tiny configs — the weight-free analogue
of the reference's teaser smoke run (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline

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


@pytest.fixture(scope="module")
def video():
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (1, 3, 9, 32, 32)).astype(np.float32)


def test_cot_edit_shapes(pipe, video):
    out = pipe(video, "remove the red ball from the table",
               source_frames=9, reasoning_frames=4, num_inference_steps=2)
    # condition 3 + ground 1 + target 3 latent frames; decode(1)=1 frame,
    # decode(3)=9 frames
    assert out.ground_videos.shape == (1, 3, 1, 32, 32)
    assert out.edit_videos.shape == (1, 3, 9, 32, 32)
    assert out.videos.shape == (1, 3, 10, 32, 32)
    assert out.videos.min() >= 0.0 and out.videos.max() <= 1.0
    assert np.isfinite(out.videos).all()


def test_deterministic_given_seed(pipe, video):
    a = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=7)
    b = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(a.videos, b.videos)
    c = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=8)
    assert np.abs(a.videos - c.videos).max() > 1e-6


def test_cfg_path(pipe, video):
    out = pipe(video, "add a hat", source_frames=9, reasoning_frames=4,
               num_inference_steps=2, guidance_scale=5.0,
               negative_prompt="blurry, low quality")
    assert out.videos.shape == (1, 3, 10, 32, 32)
    assert np.isfinite(out.videos).all()


def test_cfg_sequential_matches_batched(pipe, video):
    """Sequential CFG (two batch-1 dispatches; the 16 GB-chip 14B-CFG mode)
    must reproduce the batched-CFG trajectory — including through a TeaCache
    skip step (residual split/concat) and a cfg-skip phase cut."""
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=3,
              guidance_scale=5.0, negative_prompt="blurry", seed=5,
              output_latents=True, enable_teacache=True,
              teacache_forced_plan=[False, True, False],
              cfg_skip_ratio=0.34)
    a = pipe(video, "add a hat", **kw)
    pipe.cfg_sequential = True
    try:
        b = pipe(video, "add a hat", **kw)
    finally:
        pipe.cfg_sequential = False
    np.testing.assert_allclose(a.latents, b.latents, rtol=5e-5, atol=5e-5)
    # decoded frames quantize to uint8 on device: a latent ulp can flip a
    # pixel by one 1/255 step at the rounding boundary
    assert np.abs(a.videos - b.videos).max() <= 1.01 / 255.0


def test_non_cot_paired_path(pipe, video):
    out = pipe(video, "make the sky purple", source_frames=9,
               num_inference_steps=2, cot=False)
    # paired: [src 3 | noise 3] latents; edit decode -> 9 frames
    assert out.videos.shape == (1, 3, 9, 32, 32)
    assert out.ground_videos is None


def test_prompt_sensitivity(pipe, video):
    a = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=3)
    b = pipe(video, "turn the car into a boat", source_frames=9,
             reasoning_frames=4, num_inference_steps=2, seed=3)
    assert np.abs(a.videos - b.videos).max() > 1e-6


def test_jit_cache_reuse(pipe, video):
    # same geometry twice -> the jitted step is reused, not recompiled
    pipe(video, "remove the cat", source_frames=9, reasoning_frames=4,
         num_inference_steps=2)
    n = len(pipe._jit_cache)
    pipe(video, "remove the hat", source_frames=9, reasoning_frames=4,
         num_inference_steps=2)
    assert len(pipe._jit_cache) == n


def test_decode_outputs_fused_matches_generator(pipe, video, monkeypatch):
    """The opt-in one-program fused decode (`_decode_outputs_fused`,
    VIDEOCOF_DECODE_FUSED=1) must match the default per-chunk generator
    path for both CoT (ground+edit) and non-CoT outputs. Same math, but
    XLA fuses the scanned vs unrolled programs differently, so allow one
    uint8 quantization step at rounding boundaries (like the
    streaming-vs-whole test below)."""
    step = 1.0 / 255.0 + 1e-6
    monkeypatch.setenv("VIDEOCOF_DECODE_FUSED", "1")
    a = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=3)
    monkeypatch.setenv("VIDEOCOF_DECODE_FUSED", "0")
    b = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=3)
    assert a.videos.shape == b.videos.shape
    assert np.abs(a.videos - b.videos).max() <= step
    assert np.abs(a.ground_videos - b.ground_videos).max() <= step
    assert np.abs(a.edit_videos - b.edit_videos).max() <= step
    monkeypatch.setenv("VIDEOCOF_DECODE_FUSED", "1")
    c = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=3, cot=False)
    monkeypatch.setenv("VIDEOCOF_DECODE_FUSED", "0")
    d = pipe(video, "remove the dog", source_frames=9, reasoning_frames=4,
             num_inference_steps=2, seed=3, cot=False)
    assert np.abs(c.videos - d.videos).max() <= step
    assert c.ground_videos is None


def test_decode_to_numpy01_streaming_matches_whole(pipe, monkeypatch):
    """The overlapped per-chunk uint8 readback path (VIDEOCOF_DECODE_OVERLAP)
    must produce the same pixels as decoding the whole latent in one pass."""
    monkeypatch.setenv("VIDEOCOF_DECODE_OVERLAP", "1")
    z = np.asarray(jax.random.normal(
        jax.random.PRNGKey(11), (1, VCFG.z_dim, 5, 4, 4), jnp.float32))
    streamed = pipe.decode_to_numpy01(jnp.asarray(z))  # 5 > threshold 2
    thresh = pipe.vae_streaming_threshold_frames
    pipe.vae_streaming_threshold_frames = 99  # force whole-seq decode
    try:
        whole = pipe.decode_to_numpy01(jnp.asarray(z))
    finally:
        pipe.vae_streaming_threshold_frames = thresh
    assert streamed.shape == whole.shape
    assert streamed.dtype == np.float32
    # uint8 quantization is part of both paths; decode math matches to
    # streaming-vs-whole tolerance, so allow at most one 1/255 step
    assert np.abs(streamed - whole).max() <= (1.0 / 255.0) + 1e-6


def test_decode_single_fetch_matches_two_fetch(pipe, monkeypatch):
    """The default single-fetch decode (segments -> device u8 -> one host
    copy, per-chunk work fused in-program) must match the per-segment
    two-fetch path to within one u8 quantization step (the in-program
    scale/clip fuses differently, so values sitting ON a rounding boundary
    may flip by 1/255), cot and non-cot, split points identical."""
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(1, VAE_TINY.z_dim, 7, 4, 4))
                    .astype(np.float32))
    for cot, cc, glc in ((True, 3, 1), (True, 3, 0), (False, 3, 0)):
        monkeypatch.setenv("VIDEOCOF_DECODE_SINGLE_FETCH", "0")
        ref = pipe._decode_outputs(z, cot, cc, glc)
        monkeypatch.setenv("VIDEOCOF_DECODE_SINGLE_FETCH", "1")
        got = pipe._decode_outputs(z, cot, cc, glc)

        def close(a, b):
            np.testing.assert_allclose(a, b, atol=1.01 / 255)
            assert (np.abs(a - b) > 1e-6).mean() < 1e-3

        close(got.videos, ref.videos)
        if ref.ground_videos is None:
            assert got.ground_videos is None
        else:
            close(got.ground_videos, ref.ground_videos)
        close(got.edit_videos, ref.edit_videos)


def test_teacache_forced_plan_step0_sanitized(pipe, video, monkeypatch):
    """A forced plan that (nonsensically) skips step 0 is normalized to
    compute — step 0 has no residual to replay. The stepwise loop used to
    crash on the None residual; all three dispatch tiers must now agree
    with the explicitly sanitized plan."""
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=4,
              guidance_scale=1.0, seed=3, enable_teacache=True)
    bad = [True, True, False, True]
    good = [False, True, False, True]
    want = pipe(video, "remove the dog", teacache_forced_plan=good, **kw)
    fused = pipe(video, "remove the dog", teacache_forced_plan=bad,
                 fused_sampling=True, **kw)
    np.testing.assert_allclose(fused.videos, want.videos,
                               atol=(1.0 / 255.0) + 1e-6)
    monkeypatch.setenv("VIDEOCOF_STEPWISE", "1")
    stepwise = pipe(video, "remove the dog", teacache_forced_plan=bad,
                    fused_sampling=False, **kw)
    monkeypatch.delenv("VIDEOCOF_STEPWISE")
    np.testing.assert_allclose(stepwise.videos, want.videos,
                               atol=(1.0 / 255.0) + 1e-6)


def test_cot_prep_fused_falls_back_past_frame_bound(pipe, monkeypatch):
    """The fused one-program CoT prep OOMs XLA compile at the 4x length
    (41.6 GiB schedule on a 15.75 GiB chip, r5) — past
    VIDEOCOF_ENCODE_FUSED_MAX_FRAMES it must take the chunked path, and
    both paths agree on short inputs."""
    import jax

    rng = np.random.default_rng(0)
    short = jnp.asarray(rng.uniform(-1, 1, (1, 3, 9, 32, 32)),
                        jnp.float32)
    key = jax.random.PRNGKey(3)
    pipe._vae_jit.clear()
    out_fused = pipe.prepare_cot_latents(short, 1, key)
    assert any(isinstance(k, tuple) and k and k[0] == "cot_prep_fused"
               for k in pipe._vae_jit)
    monkeypatch.setenv("VIDEOCOF_ENCODE_FUSED", "0")
    out_chunked = pipe.prepare_cot_latents(short, 1, key)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_chunked), atol=2e-5)
    monkeypatch.delenv("VIDEOCOF_ENCODE_FUSED")

    # past the bound: no new fused entry even with fusion enabled
    monkeypatch.setenv("VIDEOCOF_ENCODE_FUSED_MAX_FRAMES", "8")
    pipe._vae_jit.clear()
    pipe.prepare_cot_latents(short, 1, key)   # 9 frames > bound of 8
    assert not any(isinstance(k, tuple) and k and k[0] == "cot_prep_fused"
                   for k in pipe._vae_jit)
