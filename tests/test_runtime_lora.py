"""Runtime LoRA over fp8-resident weights.

The reference's flagship deployment is the Wan 14B base + its released
VideoCoF LoRA adapters (`lora_utils.py` fuses them into bf16 weights). On a
16 GB chip the 14B base only exists as fp8 storage, where fusion is
impossible — `lora.load_runtime_lora` + `WanPipeline.set_runtime_lora`
serve the adapters by fusing each block's delta INSIDE the scanned forward
instead (models/lora.fuse_block_adapters), weights unmutated."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videocof_tpu.configs import WAN_TINY
from videocof_tpu.models import wan_dit
from videocof_tpu.models.lora import (load_runtime_lora, merge_lora)
from videocof_tpu.utils.fp8 import quantize_params_fp8

CFG = WAN_TINY


@pytest.fixture(scope="module")
def base():
    return wan_dit.init_wan_dit(jax.random.PRNGKey(0), CFG)


def _lora_sd(seed, rank=3, layers=(0, 1), alpha=6.0):
    """kohya/PEFT-style state dict hitting attn + ffn modules."""
    rng = np.random.default_rng(seed)
    d, f = CFG.dim, CFG.ffn_dim
    sd = {}
    for i in layers:
        for mod, din, dout in (("self_attn.q", d, d), ("cross_attn.v", d, d),
                               ("ffn.0", d, f)):
            pre = f"diffusion_model.blocks.{i}.{mod}"
            sd[f"{pre}.lora_A.weight"] = (
                rng.standard_normal((rank, din)).astype(np.float32) * 0.05)
            sd[f"{pre}.lora_B.weight"] = (
                rng.standard_normal((dout, rank)).astype(np.float32) * 0.05)
            sd[f"{pre}.alpha"] = np.asarray(alpha, np.float32)
    return sd


def _inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, 5, 4, 6)),
                    jnp.float32)
    t = jnp.array([500.0])
    ctx = jnp.asarray(rng.standard_normal((1, CFG.text_len, CFG.text_dim)),
                      jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(CFG, (5, 2, 3))
    return x, t, ctx, jnp.asarray(cos), jnp.asarray(sin)


def test_runtime_matches_merged_forward(base):
    sd = _lora_sd(2)
    args = _inputs()
    want = np.asarray(wan_dit.wan_dit_forward(
        merge_lora(base, CFG, sd, multiplier=0.7), CFG, *args))

    runtime, leftover = load_runtime_lora([(sd, 0.7)], CFG)
    assert leftover == {}
    got = np.asarray(wan_dit.wan_dit_forward(
        base, CFG, *args, lora=(runtime["blocks"], runtime["scale"])))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # and via the "lora__" param-tree node (the serving attachment)
    tree = dict(base)
    tree["lora__"] = {"blocks": runtime["blocks"],
                      "scale": jnp.float32(runtime["scale"])}
    got2 = np.asarray(wan_dit.wan_dit_forward(tree, CFG, *args))
    np.testing.assert_allclose(got2, want, atol=1e-5, rtol=1e-5)


def test_multi_file_rank_concat(base):
    sd1, sd2 = _lora_sd(3, rank=2), _lora_sd(4, rank=4, layers=(1,))
    args = _inputs()
    want = np.asarray(wan_dit.wan_dit_forward(
        merge_lora(merge_lora(base, CFG, sd1, 1.0), CFG, sd2, 0.5),
        CFG, *args))
    runtime, _ = load_runtime_lora([(sd1, 1.0), (sd2, 0.5)], CFG)
    # ranks concatenated: 2 + 4
    assert runtime["blocks"]["self_attn"]["q"]["down"].shape[1] == 6
    got = np.asarray(wan_dit.wan_dit_forward(
        base, CFG, *args, lora=(runtime["blocks"], runtime["scale"])))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_nonblock_modules_reported_as_leftover():
    sd = _lora_sd(5)
    d = CFG.dim
    rng = np.random.default_rng(6)
    sd["diffusion_model.head.head.lora_A.weight"] = (
        rng.standard_normal((2, d)).astype(np.float32))
    sd["diffusion_model.head.head.lora_B.weight"] = (
        rng.standard_normal((CFG.out_dim * 4, 2)).astype(np.float32))
    runtime, leftover = load_runtime_lora([(sd, 1.0)], CFG)
    assert runtime is not None
    assert "head.head" in leftover


def test_pipeline_runtime_lora_over_fp8():
    """End to end through WanPipeline: fp8-quantized DiT + runtime adapters
    ~= bf16 DiT with the same LoRA merged (fp8-storage-grade tolerance);
    detaching restores the no-LoRA output exactly."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    vcfg = VAE_TINY
    dcfg = CFG.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                       text_dim=T5_TINY.dim)
    dit = wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg)
    vae = wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg)
    t5 = t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY)
    sd = _lora_sd(7)

    def mk(params):
        return WanPipeline(params, dcfg, vae, vcfg, t5_params=t5,
                           t5_cfg=T5_TINY, dtype=jnp.float32)

    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=9, output_latents=True)

    merged = mk(merge_lora(dit, dcfg, sd, 1.0))(video, "edit", **kw)

    qdit = jax.tree.map(jnp.asarray,
                        quantize_params_fp8(jax.tree.map(np.asarray, dit)))
    pipe_q = mk(qdit)
    plain_q = pipe_q(video, "edit", **kw)
    runtime, _ = load_runtime_lora([(sd, 1.0)], dcfg)
    pipe_q.set_runtime_lora(runtime)
    assert "lora__" in pipe_q.dit_params
    lora_q = pipe_q(video, "edit", **kw)

    # the adapters must actually act...
    assert np.abs(lora_q.latents - plain_q.latents).max() > 1e-3
    # ...and land near the bf16-merged trajectory (fp8 storage error only)
    ref_m = np.abs(merged.latents).mean()
    assert np.abs(lora_q.latents - merged.latents).mean() < 0.25 * ref_m

    pipe_q.set_runtime_lora(None)
    assert "lora__" not in pipe_q.dit_params
    detached = pipe_q(video, "edit", **kw)
    np.testing.assert_allclose(detached.latents, plain_q.latents, atol=1e-6)


def test_controller_runtime_lora_on_quantized(tmp_path):
    """ensure_lora on an fp8 pipeline attaches runtime adapters instead of
    raising; path=None detaches; merge-state tracking unchanged."""
    import safetensors.numpy
    from videocof_tpu.configs import GenerationConfig, T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.serving.controller import VideoCoFController

    vcfg = VAE_TINY
    dcfg = CFG.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                       text_dim=T5_TINY.dim)
    dit = wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg)
    qdit = jax.tree.map(jnp.asarray,
                        quantize_params_fp8(jax.tree.map(np.asarray, dit)))
    pipe = WanPipeline(qdit, dcfg,
                       wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg),
                       vcfg, t5_params=t5_encoder.init_t5_encoder(
                           jax.random.PRNGKey(2), T5_TINY),
                       t5_cfg=T5_TINY, dtype=jnp.float32)
    ctrl = VideoCoFController(pipe, defaults=GenerationConfig(
        source_frames=9, reasoning_frames=4, num_inference_steps=1))
    assert ctrl._params_quantized()

    lora_path = str(tmp_path / "l.safetensors")
    safetensors.numpy.save_file(_lora_sd(8), lora_path)
    ctrl.ensure_lora(lora_path, 0.8)
    assert "lora__" in pipe.dit_params
    assert ctrl._merged_loras == {lora_path: 0.8}
    ctrl.ensure_lora(None)
    assert "lora__" not in pipe.dit_params
    assert ctrl._merged_loras == {}


def test_moe_runtime_lora_lockstep():
    """set_runtime_lora on a Wan2.2 MoE pipeline attaches/detaches the
    adapters on BOTH expert trees, and the dual-expert trajectory runs."""
    from videocof_tpu.configs import T5_TINY, VAE_TINY
    from videocof_tpu.models import t5_encoder, wan_vae
    from videocof_tpu.pipeline import Wan22Pipeline

    vcfg = VAE_TINY
    dcfg = CFG.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                       text_dim=T5_TINY.dim)
    pipe = Wan22Pipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg), dcfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg), vcfg,
        t5_params=t5_encoder.init_t5_encoder(jax.random.PRNGKey(2),
                                             T5_TINY),
        t5_cfg=T5_TINY, dtype=jnp.float32,
        dit_params_2=wan_dit.init_wan_dit(jax.random.PRNGKey(3), dcfg),
        boundary=0.875)
    runtime, _ = load_runtime_lora([(_lora_sd(11), 1.0)], dcfg)
    pipe.set_runtime_lora(runtime)
    assert "lora__" in pipe.dit_params and "lora__" in pipe.dit_params_2

    video = np.random.default_rng(0).uniform(
        -1, 1, (1, 3, 9, 32, 32)).astype(np.float32)
    out = pipe(video, "edit", source_frames=9, reasoning_frames=4,
               num_inference_steps=2, seed=4, output_latents=True)
    assert np.isfinite(out.latents).all()

    pipe.set_runtime_lora(None)
    assert "lora__" not in pipe.dit_params
    assert "lora__" not in pipe.dit_params_2
