"""END-TO-END parity vs the reference `Wan2_2Pipeline.__call__` (t2v MoE).

The reference Wan2.2 pipeline
(`/root/reference/videox_fun/pipeline/pipeline_wan2_2.py:388-599`) is a plain
text-to-video flow: noise latents -> boundary-routed dual-expert denoise ->
whole-sequence decode. This runs it end to end on torch CPU at tiny config —
actual tokenizer->T5 encoding, per-scheduler-class dispatch (`:478-490`),
`prepare_latents` from `randn_tensor` (`:266-291`), the expert choice
`t >= boundary * num_train_timesteps` (`:533-538`), CFG combine (`:552-558`),
and `decode_latents` (`:293-298`) — and asserts our
`WanPipeline.text_to_video` / `Wan22Pipeline.text_to_video` reproduce the
final latents and decoded video.

Determinism: both sides tokenize through the same deterministic fallback
tokenizer, share ported weights, and consume the SAME injected noise (the
reference via a patched `randn_tensor`, ours via the `noise=` hook).
"""

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
from test_pipeline_reference_e2e import (_NullCudaDevice,  # noqa: E402
                                         _RefTokenizerAdapter, _sd_to_numpy)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY  # noqa: E402
from videocof_tpu.data.tokenizer import WanTokenizer  # noqa: E402
from videocof_tpu.models import weights  # noqa: E402
from videocof_tpu.pipeline import Wan22Pipeline  # noqa: E402

REF = load_reference()

H = W = 32
NUM_FRAMES = 5          # -> 2 latent frames
STEPS = 6
MAX_SEQ = 16            # == DIT_CFG.text_len so context layouts coincide
BOUNDARY = 0.875

DIT_CFG = WAN_TINY.replace(in_dim=4, out_dim=4, text_dim=T5_TINY.dim)
LATENT_MEAN = (0.10, -0.20, 0.30, 0.05)
LATENT_STD = (1.20, 0.80, 1.50, 0.90)
VAE_CFG = VAE_TINY.replace(latent_mean=LATENT_MEAN, latent_std=LATENT_STD)

PROMPT = "A red fox runs across a snowy field at sunrise, cinematic"


def _make_ref_dit(seed):
    torch.manual_seed(seed)
    cfg = DIT_CFG
    return REF.wan_transformer3d.Wan2_2Transformer3DModel(
        model_type="t2v", patch_size=tuple(cfg.patch_size),
        text_len=cfg.text_len, in_dim=cfg.in_dim, dim=cfg.dim,
        ffn_dim=cfg.ffn_dim, freq_dim=cfg.freq_dim, text_dim=cfg.text_dim,
        out_dim=cfg.out_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, qk_norm=cfg.qk_norm,
        cross_attn_norm=cfg.cross_attn_norm, eps=cfg.eps,
        in_channels=cfg.in_dim, hidden_size=cfg.dim).float().eval()


@pytest.fixture(scope="module")
def pair():
    """(reference modules, our MoE pipeline) with shared tiny weights."""
    os.environ.setdefault("VIDEOX_ATTENTION_TYPE", "SDPA")
    cfg = DIT_CFG
    ref_dit = _make_ref_dit(0)        # low-noise / base expert
    ref_dit2 = _make_ref_dit(7)       # high-noise expert
    dit_params = jax.tree.map(jnp.asarray, weights.convert_dit_state_dict(
        _sd_to_numpy(ref_dit), cfg, dtype=np.float32))
    dit_params_2 = jax.tree.map(jnp.asarray, weights.convert_dit_state_dict(
        _sd_to_numpy(ref_dit2), cfg, dtype=np.float32))

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

    ours = Wan22Pipeline(dit_params, cfg, vae_params, VAE_CFG, t5_params,
                         T5_TINY,
                         tokenizer=WanTokenizer(vocab_size=T5_TINY.vocab),
                         dtype=jnp.float32, dit_params_2=dit_params_2,
                         boundary=BOUNDARY)
    return {"dit": ref_dit, "dit2": ref_dit2, "vae": ref_vae, "t5": ref_t5,
            "ours": ours}


def _make_ref_scheduler(sampler):
    if sampler == "unipc":
        return REF.fm_solvers_unipc.FlowUniPCMultistepScheduler(shift=1.0)
    if sampler == "dpm++":
        return REF.fm_solvers.FlowDPMSolverMultistepScheduler(shift=1.0)
    import diffusers
    return diffusers.FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, shift=5.0, use_dynamic_shifting=False)


def _run_pair(pair, monkeypatch, *, sampler, guidance_scale, shift=5.0,
              seed=0, with_expert_2=True, fused_sampling=True):
    ref_sched = _make_ref_scheduler(sampler)
    ref_pipe = REF.pipeline_wan2_2.Wan2_2Pipeline(
        tokenizer=_RefTokenizerAdapter(T5_TINY.vocab),
        text_encoder=pair["t5"], vae=pair["vae"], transformer=pair["dit"],
        transformer_2=pair["dit2"] if with_expert_2 else None,
        scheduler=ref_sched)

    rng = np.random.default_rng(seed)
    tl = (NUM_FRAMES - 1) // 4 + 1
    noise_shape = (1, VAE_CFG.z_dim, tl, H // 8, W // 8)
    noise = rng.standard_normal(noise_shape).astype(np.float32)

    def fake_randn(shape, generator=None, device=None, dtype=None,
                   layout=None):
        assert tuple(shape) == noise_shape, (tuple(shape), noise_shape)
        return torch.from_numpy(noise.copy())

    monkeypatch.setattr(REF.pipeline_wan2_2, "randn_tensor", fake_randn)
    monkeypatch.setattr(torch.cuda, "device", _NullCudaDevice)
    monkeypatch.setattr(torch.cuda.amp, "autocast",
                        lambda dtype=None: _NullCudaDevice())

    captured = {}

    def cb(pipe, i, t, kw):
        captured["latents"] = kw["latents"].detach().clone()
        return kw

    with torch.no_grad():
        ref_out = ref_pipe(
            prompt=PROMPT, height=H, width=W, num_frames=NUM_FRAMES,
            num_inference_steps=STEPS, guidance_scale=guidance_scale,
            generator=torch.Generator().manual_seed(0),
            output_type="numpy", return_dict=False,
            callback_on_step_end=cb, max_sequence_length=MAX_SEQ,
            boundary=BOUNDARY, shift=shift)

    ours_pipe = pair["ours"]
    if not with_expert_2:
        # single-expert: the base-pipeline t2v path handles it (the MoE
        # override routes everything to the base expert at split 0)
        saved, ours_pipe.dit_params_2 = ours_pipe.dit_params_2, None
    try:
        ours = ours_pipe.text_to_video(
            PROMPT, height=H, width=W, num_frames=NUM_FRAMES,
            num_inference_steps=STEPS, guidance_scale=guidance_scale,
            shift=float(shift), sampler=sampler,
            max_sequence_length=MAX_SEQ, noise=noise, output_latents=True,
            fused_sampling=fused_sampling)
    finally:
        if not with_expert_2:
            ours_pipe.dit_params_2 = saved
    return ref_out, captured["latents"].numpy(), ours


CASES = [
    # (sampler, guidance_scale, shift, with_expert_2)
    ("unipc", 5.0, 5.0, True),    # CFG + both experts used
    ("unipc", 1.0, 5.0, True),    # no CFG, expert routing only
    ("dpm++", 5.0, 5.0, True),
    ("unipc", 5.0, 5.0, False),   # no expert 2 -> always base transformer
]


@pytest.mark.parametrize("sampler,g,shift,with2", CASES)
def test_wan22_t2v_e2e_parity(pair, monkeypatch, sampler, g, shift, with2):
    ref_out, ref_latents, ours = _run_pair(
        pair, monkeypatch, sampler=sampler, guidance_scale=g, shift=shift,
        with_expert_2=with2)

    # the schedule straddles the boundary: both experts actually run
    if with2:
        from videocof_tpu.schedulers import get_scheduler
        s = get_scheduler(sampler)
        s.set_timesteps(STEPS, shift=shift)
        n_hi = sum(float(t) >= BOUNDARY * 1000 for t in s.timesteps)
        assert 0 < n_hi < STEPS

    np.testing.assert_allclose(ours.latents, ref_latents, atol=1e-3,
                               rtol=1e-3)
    want = ref_out.videos.numpy()
    assert ours.videos.shape == want.shape
    np.testing.assert_allclose(ours.videos, want,
                               atol=1.0 / 255.0 + 1e-3)


def test_wan22_t2v_segmented_matches_fused(pair, monkeypatch):
    """Our segmented dual-expert t2v trajectory equals the one-program
    fused path (and therefore the reference, transitively)."""
    _, _, fused = _run_pair(pair, monkeypatch, sampler="unipc",
                            guidance_scale=5.0, fused_sampling=True)
    monkeypatch.setenv("VIDEOCOF_SEG_STEPS", "2")
    _, _, seg = _run_pair(pair, monkeypatch, sampler="unipc",
                          guidance_scale=5.0, fused_sampling=False)
    np.testing.assert_allclose(seg.latents, fused.latents, atol=1e-5)
