"""2D KL-VAE decoder (models/kl_vae.py) — the in-repo replacement for the
reference's external diffusers ``AutoencoderKL`` (Flux pixels).

diffusers is not installed here, so the oracle is an INDEPENDENT
torch-functional forward implementing the published AutoencoderKL decoder
semantics directly from the same diffusers-layout state dict — it shares
no code with the JAX implementation and pins both the converter's layout
handling (torch Linear transposes, conv [O,I,kh,kw]) and the math
(GroupNorm, resnets, single-head mid attention, nearest-2x upsamplers)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videocof_tpu.models import kl_vae

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _make_sd(cfg: kl_vae.KLVAEConfig, seed=0):
    """Synthetic diffusers-layout AutoencoderKL (decoder) state dict."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, k, k,
                                             generator=g) * 0.2
        sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.1

    def gn(prefix, c):
        sd[f"{prefix}.weight"] = 1 + torch.randn(c, generator=g) * 0.1
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1

    def lin(prefix, c):
        sd[f"{prefix}.weight"] = torch.randn(c, c, generator=g) * 0.2
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1

    def resnet(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout, 3)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, 1)

    rev = list(reversed(cfg.block_out_channels))
    d = "decoder"
    conv(f"{d}.conv_in", cfg.latent_channels, rev[0], 3)
    resnet(f"{d}.mid_block.resnets.0", rev[0], rev[0])
    resnet(f"{d}.mid_block.resnets.1", rev[0], rev[0])
    if cfg.mid_block_add_attention:
        a = f"{d}.mid_block.attentions.0"
        gn(f"{a}.group_norm", rev[0])
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{a}.{n}", rev[0])
    prev = rev[0]
    for i, ch in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"{d}.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else ch, ch)
        if i != len(rev) - 1:
            conv(f"{d}.up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)
        prev = ch
    gn(f"{d}.conv_norm_out", rev[-1])
    conv(f"{d}.conv_out", rev[-1], cfg.out_channels, 3)
    if cfg.use_post_quant_conv:
        conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, 1)
    return sd


def _torch_decode(sd, cfg: kl_vae.KLVAEConfig, z: torch.Tensor):
    """Independent torch-functional AutoencoderKL decoder forward."""
    eps, G = cfg.norm_eps, cfg.norm_num_groups

    def conv(x, p, k, pad):
        return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"], padding=pad)

    def gn(x, p):
        return F.group_norm(x, G, sd[f"{p}.weight"], sd[f"{p}.bias"], eps)

    def resnet(x, p):
        h = conv(F.silu(gn(x, f"{p}.norm1")), f"{p}.conv1", 3, 1)
        h = conv(F.silu(gn(h, f"{p}.norm2")), f"{p}.conv2", 3, 1)
        if f"{p}.conv_shortcut.weight" in sd:
            x = conv(x, f"{p}.conv_shortcut", 1, 0)
        return x + h

    def attention(x, p):
        B, C, H, W = x.shape
        t = gn(x, f"{p}.group_norm").reshape(B, C, H * W).permute(0, 2, 1)
        q = F.linear(t, sd[f"{p}.to_q.weight"], sd[f"{p}.to_q.bias"])
        k = F.linear(t, sd[f"{p}.to_k.weight"], sd[f"{p}.to_k.bias"])
        v = F.linear(t, sd[f"{p}.to_v.weight"], sd[f"{p}.to_v.bias"])
        o = F.scaled_dot_product_attention(q, k, v)
        o = F.linear(o, sd[f"{p}.to_out.0.weight"], sd[f"{p}.to_out.0.bias"])
        return x + o.permute(0, 2, 1).reshape(B, C, H, W)

    d = "decoder"
    if cfg.use_post_quant_conv:
        z = conv(z, "post_quant_conv", 1, 0)
    h = conv(z, f"{d}.conv_in", 3, 1)
    h = resnet(h, f"{d}.mid_block.resnets.0")
    if cfg.mid_block_add_attention:
        h = attention(h, f"{d}.mid_block.attentions.0")
    h = resnet(h, f"{d}.mid_block.resnets.1")
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block + 1):
            h = resnet(h, f"{d}.up_blocks.{i}.resnets.{j}")
        if f"{d}.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = conv(h, f"{d}.up_blocks.{i}.upsamplers.0.conv", 3, 1)
    return conv(F.silu(gn(h, f"{d}.conv_norm_out")), f"{d}.conv_out", 3, 1)


@pytest.mark.parametrize("post_quant,attn", [(False, True), (True, False)])
def test_decoder_matches_torch_oracle(post_quant, attn):
    cfg = kl_vae.KL_VAE_TINY.replace(use_post_quant_conv=post_quant,
                                     mid_block_add_attention=attn)
    sd = _make_sd(cfg, seed=3)
    z = torch.randn(1, cfg.latent_channels, 6, 5,
                    generator=torch.Generator().manual_seed(7))
    want = _torch_decode(sd, cfg, z).detach().numpy()

    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = kl_vae.convert_kl_vae_state_dict(np_sd, cfg)
    got = np.asarray(kl_vae.decode(jax.tree.map(jnp.asarray, params), cfg,
                                   jnp.asarray(z.numpy())))
    # 2x upsample per non-final block: (8, 12) -> one upsampler -> 2x
    assert got.shape == (1, 3, 12, 10)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_decode_latents_applies_scale_shift_and_clip():
    cfg = kl_vae.KL_VAE_TINY
    params = kl_vae.init_kl_vae_decoder(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.latent_channels, 4, 4))
    got = np.asarray(kl_vae.decode_latents(params, cfg, z))
    manual = np.clip(np.asarray(kl_vae.decode(
        params, cfg, z / cfg.scaling_factor + cfg.shift_factor)), -1, 1)
    np.testing.assert_allclose(got, manual, atol=1e-6)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_flux_pipeline_decodes_pixels_with_inrepo_vae():
    """FluxPipeline + make_decode_fn: the e2e sampler returns PIXELS, no
    caller-supplied decode_fn / external AutoencoderKL."""
    from videocof_tpu.models import flux as flux_lib
    from videocof_tpu.pipeline.image_pipelines import FluxPipeline

    dcfg = flux_lib.FLUX_TINY
    vcfg = kl_vae.KL_VAE_TINY.replace(latent_channels=dcfg.in_channels // 4)
    vparams = kl_vae.init_kl_vae_decoder(jax.random.PRNGKey(2), vcfg)
    pipe = FluxPipeline(
        flux_lib.init_flux(jax.random.PRNGKey(3), dcfg), dcfg,
        decode_fn=kl_vae.make_decode_fn(vparams, vcfg))
    txt = jnp.zeros((1, 7, dcfg.joint_attention_dim), jnp.float32)
    pooled = jnp.zeros((1, dcfg.pooled_projection_dim), jnp.float32)
    out = pipe(txt, pooled, height=32, width=32, num_inference_steps=2)
    # latents [1, 2, 4, 4] -> tiny decoder upsamples 2x
    assert out.shape == (1, 3, 8, 8)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_load_kl_vae_dir(tmp_path):
    """config.json + safetensors round trip through load_kl_vae, flux-style
    config fields (shift_factor, use_post_quant_conv=false)."""
    safetensors = pytest.importorskip("safetensors.torch")
    cfg = kl_vae.KL_VAE_TINY.replace(use_post_quant_conv=False)
    (tmp_path / "config.json").write_text(json.dumps({
        "latent_channels": cfg.latent_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": cfg.norm_num_groups,
        "scaling_factor": cfg.scaling_factor,
        "shift_factor": cfg.shift_factor,
        "use_post_quant_conv": False,
    }))
    sd = {k: v.contiguous() for k, v in _make_sd(cfg, seed=5).items()}
    safetensors.save_file(
        sd, str(tmp_path / "diffusion_pytorch_model.safetensors"))
    lcfg, lparams = kl_vae.load_kl_vae(str(tmp_path), dtype=jnp.float32)
    assert lcfg.shift_factor == cfg.shift_factor
    assert not lcfg.use_post_quant_conv
    z = jnp.ones((1, cfg.latent_channels, 4, 4), jnp.float32)
    out = kl_vae.decode_latents(lparams, lcfg, z)
    assert out.shape == (1, 3, 8, 8)


def test_factory_wires_flux_vae_subdir(tmp_path, monkeypatch):
    """A flux checkpoint dir with a vae/ subdir gets the in-repo KL-VAE
    decode path wired automatically by load_family_pipeline."""
    import videocof_tpu.factory as factory
    from videocof_tpu.pipeline import image_pipelines

    (tmp_path / "transformer").mkdir()
    (tmp_path / "transformer" / "config.json").write_text(
        json.dumps({"_class_name": "FluxTransformer2DModel"}))
    (tmp_path / "vae").mkdir()
    (tmp_path / "vae" / "config.json").write_text(json.dumps(
        {"latent_channels": 2, "block_out_channels": [8, 12]}))

    seen = {}

    def fake(cls_tdir, vae_path=None, dtype=None, quantize=None, **kw):
        seen["tdir"] = cls_tdir
        seen["vae_path"] = vae_path
        return "sentinel"

    monkeypatch.setattr(image_pipelines.FluxPipeline, "from_pretrained",
                        staticmethod(fake))
    out = factory.load_family_pipeline(str(tmp_path))
    assert out == "sentinel"
    assert seen["tdir"].endswith("transformer")
    assert seen["vae_path"].endswith("vae")


def test_flux_pixels_through_controller_and_api(tmp_path):
    """The full serving chain for Flux WITH the in-repo KL-VAE: controller
    generate_media returns pixel images, and the HTTP handler's reply
    carries base64_image (not base64_latents)."""
    import base64
    import threading
    import urllib.request

    from http.server import ThreadingHTTPServer

    from videocof_tpu.configs import GenerationConfig
    from videocof_tpu.models import flux as flux_lib
    from videocof_tpu.pipeline.image_pipelines import FluxPipeline
    from videocof_tpu.serving.api import ENDPOINT, make_handler
    from videocof_tpu.serving.controller import VideoCoFController

    dcfg = flux_lib.FLUX_TINY
    vcfg = kl_vae.KL_VAE_TINY.replace(latent_channels=dcfg.in_channels // 4)
    vparams = kl_vae.init_kl_vae_decoder(jax.random.PRNGKey(0), vcfg)
    pipe = FluxPipeline(
        flux_lib.init_flux(jax.random.PRNGKey(1), dcfg), dcfg,
        decode_fn=kl_vae.make_decode_fn(vparams, vcfg))
    ctrl = VideoCoFController(pipe, defaults=GenerationConfig(
        num_inference_steps=2))

    txt = np.zeros((1, 6, dcfg.joint_attention_dim), np.float32)
    pooled = np.zeros((1, dcfg.pooled_projection_dim), np.float32)
    out = ctrl.generate_media(txt, pooled_projections=pooled,
                              height=32, width=32, num_inference_steps=2,
                              seed=0)
    assert out["images"].shape == (1, 3, 8, 8)   # pixels, not latents

    import io

    def b64_npy(a):
        buf = io.BytesIO()
        np.save(buf, a, allow_pickle=False)
        return base64.b64encode(buf.getvalue()).decode()

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(ctrl, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({"text_embeddings": b64_npy(txt),
                             "pooled_projections": b64_npy(pooled),
                             "height": 32, "width": 32,
                             "sample_step_slider": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            resp = json.load(r)
        assert resp["message"] == "Success" and resp["family"] == "flux"
        assert "base64_image" in resp, sorted(resp)
        assert len(base64.b64decode(resp["base64_image"])) > 50
    finally:
        server.shutdown()
