"""END-TO-END pipeline parity vs the reference `WanPipeline.__call__`.

Module-level parity (test_reference_parity.py) runs each reference module in
isolation; this file runs the reference *pipeline* itself
(`/root/reference/videox_fun/pipeline/pipeline_wan.py:516-799`) end to end on
torch CPU at tiny config — actual tokenizer->T5 encoding with per-sample
truncation (`:140-182`), per-scheduler-class dispatch incl. the shift-vs-mu
quirk (`:611-623`), `condition_count`/`ground_latent_count` derivation
(`:628-637`), CoT latent assembly via `latent_dist.mode()` (`:381-419`), CFG
combine (`:731-733`), source-freeze zeroing (`:735-737`), and segment decode
slicing (`:757-786`) — and asserts our `pipeline/wan_pipeline.py` reproduces
the final latents AND the decoded ground/edit segments.

Determinism: both sides tokenize through the same deterministic fallback
tokenizer, share ported weights, and consume the SAME injected noise (the
reference via a patched `randn_tensor`, ours via the `noise=` hook), so any
divergence is real glue drift, not RNG.
"""

import contextlib
import os
import sys
import unittest.mock

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference/videox_fun"):
    pytest.skip("reference tree not mounted", allow_module_level=True)

from _reference_oracle import load_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY  # noqa: E402
from videocof_tpu.data.tokenizer import (WanTokenizer,  # noqa: E402
                                         _FallbackTokenizer)
from videocof_tpu.models import weights  # noqa: E402
from videocof_tpu.pipeline.wan_pipeline import WanPipeline  # noqa: E402

REF = load_reference()

# tiny geometry: 5 source pixel frames -> 2 latent; 1 reasoning frame -> 1
# ground latent; 32x32 pixels -> 4x4 latent -> 2x2 patch grid
H = W = 32
SRC_FRAMES = 5
REASONING_FRAMES = 1
STEPS = 4
MAX_SEQ = 16  # == DIT_CFG.text_len so both context layouts coincide

DIT_CFG = WAN_TINY.replace(in_dim=4, out_dim=4, text_dim=T5_TINY.dim)
LATENT_MEAN = (0.10, -0.20, 0.30, 0.05)
LATENT_STD = (1.20, 0.80, 1.50, 0.90)
VAE_CFG = VAE_TINY.replace(latent_mean=LATENT_MEAN, latent_std=LATENT_STD)

PROMPT = ("A video sequence showing three parts: first the original scene, "
          "then grounded the red car, and finally the same scene but replace "
          "the red car with a blue truck")


def _sd_to_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class _RefTokenizerAdapter:
    """HF-tokenizer surface over the same deterministic fallback tokenizer
    our pipeline uses, so both sides see identical ids/masks. Supports the
    two call shapes `_get_t5_prompt_embeds` makes (`pipeline_wan.py:151-165`):
    padding='max_length' and the padding='longest' truncation probe."""

    def __init__(self, vocab: int):
        self._tok = _FallbackTokenizer(vocab)

    def __call__(self, texts, padding=None, max_length=None, truncation=True,
                 add_special_tokens=True, return_tensors="pt"):
        import types
        texts = list(texts) if not isinstance(texts, str) else [texts]
        if padding == "longest" or max_length is None:
            ids, mask = self._tok(texts, max_length=4096)
            longest = max(1, int(mask.sum(axis=1).max()))
            ids, mask = ids[:, :longest], mask[:, :longest]
        else:
            ids, mask = self._tok(texts, max_length=max_length)
        return types.SimpleNamespace(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long())

    def batch_decode(self, ids):
        return ["" for _ in ids]


class _NullCudaDevice:
    """torch.cuda.device(cpu) raises on CPU-only torch; the reference wraps
    its denoise loop in it (`pipeline_wan.py:707`). Numerically a no-op."""

    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


@pytest.fixture(scope="module")
def pair():
    """(reference pipeline modules, our pipeline) with shared tiny weights."""
    os.environ.setdefault("VIDEOX_ATTENTION_TYPE", "SDPA")

    torch.manual_seed(0)
    cfg = DIT_CFG
    ref_dit = REF.wan_transformer3d.WanTransformer3DModel(
        model_type="t2v", patch_size=tuple(cfg.patch_size),
        text_len=cfg.text_len, in_dim=cfg.in_dim, dim=cfg.dim,
        ffn_dim=cfg.ffn_dim, freq_dim=cfg.freq_dim, text_dim=cfg.text_dim,
        out_dim=cfg.out_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, qk_norm=cfg.qk_norm,
        cross_attn_norm=cfg.cross_attn_norm, eps=cfg.eps,
        in_channels=cfg.in_dim, hidden_size=cfg.dim).float().eval()
    dit_params = jax.tree.map(jnp.asarray, weights.convert_dit_state_dict(
        _sd_to_numpy(ref_dit), cfg, dtype=np.float32))

    # reference AutoencoderKLWan wrapper around a TINY inner VAE: patch the
    # full-size `_video_vae` factory (wan_vae.py:599-617) for construction,
    # then install tiny per-channel latent stats (the wrapper hardcodes the
    # published 16-channel table — `wan_vae.py:630-640`)
    def _tiny_inner(z_dim=None, **kw):
        return REF.wan_vae.AutoencoderKLWan_(
            dim=VAE_CFG.dim, z_dim=z_dim, dim_mult=list(VAE_CFG.dim_mult),
            num_res_blocks=VAE_CFG.num_res_blocks,
            attn_scales=list(VAE_CFG.attn_scales),
            temperal_downsample=list(VAE_CFG.temporal_downsample),
            dropout=0.0)

    torch.manual_seed(1)
    with unittest.mock.patch.object(REF.wan_vae, "_video_vae", _tiny_inner):
        ref_vae = REF.wan_vae.AutoencoderKLWan(
            latent_channels=VAE_CFG.z_dim,
            temporal_compression_ratio=VAE_CFG.temporal_compression_ratio,
            spatial_compression_ratio=VAE_CFG.spatial_compression_ratio)
    ref_vae = ref_vae.float().eval()
    ref_vae.mean = torch.tensor(LATENT_MEAN, dtype=torch.float32)
    ref_vae.std = torch.tensor(LATENT_STD, dtype=torch.float32)
    ref_vae.scale = [ref_vae.mean, 1.0 / ref_vae.std]
    vae_params = jax.tree.map(jnp.asarray, weights.convert_vae_state_dict(
        _sd_to_numpy(ref_vae.model), VAE_CFG, dtype=np.float32))

    torch.manual_seed(2)
    ref_t5 = REF.wan_text_encoder.WanT5EncoderModel(
        vocab=T5_TINY.vocab, dim=T5_TINY.dim, dim_attn=T5_TINY.dim_attn,
        dim_ffn=T5_TINY.dim_ffn, num_heads=T5_TINY.num_heads,
        num_layers=T5_TINY.num_layers, num_buckets=T5_TINY.num_buckets,
        shared_pos=False, dropout=0.0).float().eval()
    t5_params = jax.tree.map(jnp.asarray, weights.convert_t5_state_dict(
        _sd_to_numpy(ref_t5), T5_TINY))

    ours = WanPipeline(dit_params, cfg, vae_params, VAE_CFG, t5_params,
                       T5_TINY,
                       tokenizer=WanTokenizer(vocab_size=T5_TINY.vocab),
                       dtype=jnp.float32)
    return {"dit": ref_dit, "vae": ref_vae, "t5": ref_t5, "ours": ours}


def _make_ref_scheduler(sampler):
    # construction kwargs follow inference.py:286-295 + wan_civitai.yaml:
    # UniPC/DPM get shift=1 at construction (the real shift goes through
    # set_timesteps / get_sampling_sigmas); Euler keeps the yaml shift=5.0
    # with use_dynamic_shifting=false (so the pipeline's mu=1 is a no-op)
    if sampler == "unipc":
        return REF.fm_solvers_unipc.FlowUniPCMultistepScheduler(shift=1.0)
    if sampler == "dpm++":
        return REF.fm_solvers.FlowDPMSolverMultistepScheduler(shift=1.0)
    import diffusers
    return diffusers.FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, shift=5.0, use_dynamic_shifting=False)


def _run_pair(pair, monkeypatch, *, sampler, guidance_scale, cot,
              shift=3.0, seed=0):
    ref_sched = _make_ref_scheduler(sampler)
    ref_pipe = REF.pipeline_wan.WanPipeline(
        tokenizer=_RefTokenizerAdapter(T5_TINY.vocab),
        text_encoder=pair["t5"], vae=pair["vae"], transformer=pair["dit"],
        scheduler=ref_sched)

    rng = np.random.default_rng(seed)
    video = rng.uniform(-1, 1, (1, 3, SRC_FRAMES, H, W)).astype(np.float32)
    tl_src = (SRC_FRAMES - 1) // 4 + 1
    ground = (REASONING_FRAMES - 1) // 4 + 1 if cot else 0
    # reference noise draw: cot mode draws src+ground latent frames of noise
    # (`pipeline_wan.py:412-417`); paired mode draws org_latents' own shape
    # (`:373-377`)
    noise_shape = (1, VAE_CFG.z_dim, tl_src + ground if cot else tl_src,
                   H // 8, W // 8)
    noise = rng.standard_normal(noise_shape).astype(np.float32)

    def fake_randn(shape, generator=None, device=None, dtype=None,
                   layout=None):
        assert tuple(shape) == noise_shape, (tuple(shape), noise_shape)
        return torch.from_numpy(noise.copy())

    monkeypatch.setattr(REF.pipeline_wan, "randn_tensor", fake_randn)
    monkeypatch.setattr(torch.cuda, "device", _NullCudaDevice)

    captured = {}

    def cb(pipe, i, t, kw):
        captured["latents"] = kw["latents"].detach().clone()
        return kw

    with torch.no_grad():
        ref_out = ref_pipe(
            video=torch.from_numpy(video), prompt=PROMPT,
            height=H, width=W, source_frames=SRC_FRAMES,
            reasoning_frames=REASONING_FRAMES, num_inference_steps=STEPS,
            guidance_scale=guidance_scale,
            generator=torch.Generator().manual_seed(0),
            output_type="numpy", return_dict=False,
            callback_on_step_end=cb, max_sequence_length=MAX_SEQ,
            shift=shift, repeat_rope=True, cot=cot)

    ours = pair["ours"](
        video, PROMPT, source_frames=SRC_FRAMES,
        reasoning_frames=REASONING_FRAMES, num_inference_steps=STEPS,
        guidance_scale=guidance_scale, shift=float(shift), sampler=sampler,
        repeat_rope=True, cot=cot, max_sequence_length=MAX_SEQ,
        noise=noise, output_latents=True)
    return ref_out, captured["latents"].numpy(), ours


CASES = [
    # (sampler, guidance_scale, cot, shift)
    ("unipc", 5.0, True, 3.0),
    ("unipc", 1.0, True, 3.0),
    ("dpm++", 5.0, True, 3.0),
    # euler: the scheduler's own construction shift (5.0 per the yaml)
    # governs; ours receives it through the pipeline shift arg
    ("euler", 1.0, True, 5.0),
    ("unipc", 5.0, False, 3.0),  # paired repeat-rope (non-CoT) layout
]


@pytest.mark.parametrize("sampler,g,cot,shift", CASES)
def test_pipeline_e2e_parity(pair, monkeypatch, sampler, g, cot, shift):
    ref_out, ref_latents, ours = _run_pair(
        pair, monkeypatch, sampler=sampler, guidance_scale=g, cot=cot,
        shift=shift)

    # final denoised latents: the stringent check (pure glue + DiT math,
    # no uint8 quantization in the way)
    np.testing.assert_allclose(ours.latents, ref_latents, atol=1e-3,
                               rtol=1e-3)

    # decoded outputs: ours quantizes through device uint8 (one 8-bit fetch);
    # the reference stays float — 1/255-scale tolerance on top of 1e-3
    atol = 1.0 / 255.0 + 1e-3
    want_videos = ref_out.videos.numpy()
    assert ours.videos.shape == want_videos.shape
    np.testing.assert_allclose(ours.videos, want_videos, atol=atol)
    if cot:
        np.testing.assert_allclose(ours.ground_videos,
                                   ref_out.ground_videos.numpy(), atol=atol)
        np.testing.assert_allclose(ours.edit_videos,
                                   ref_out.edit_videos.numpy(), atol=atol)
    else:
        np.testing.assert_allclose(ours.edit_videos,
                                   ref_out.edit_videos.numpy(), atol=atol)
