"""QwenImage VAE: the diffusers-layout converter must reproduce the wan_vae
pytree exactly (the architectures are identical)."""

import jax
import numpy as np
import pytest

from videocof_tpu.configs import VAE_TINY
from videocof_tpu.models import qwenimage_vae, wan_vae

CFG = VAE_TINY


def _export_diffusers_layout(params, cfg):
    """Build a synthetic diffusers-layout state dict from a wan_vae pytree
    (the inverse of the converter), exercising every key path."""
    sd = {}

    def conv(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["kernel"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def rb(prefix, p):
        sd[prefix + ".norm1.gamma"] = np.asarray(p["norm1"]["gamma"])
        conv(prefix + ".conv1", p["conv1"])
        sd[prefix + ".norm2.gamma"] = np.asarray(p["norm2"]["gamma"])
        conv(prefix + ".conv2", p["conv2"])
        if "shortcut" in p:
            conv(prefix + ".conv_shortcut", p["shortcut"])

    def attn(prefix, p):
        sd[prefix + ".norm.gamma"] = np.asarray(p["norm"]["gamma"])
        conv(prefix + ".to_qkv", p["qkv"])
        conv(prefix + ".proj", p["proj"])

    enc = params["encoder"]
    conv("encoder.conv_in", enc["conv1"])
    seq = 0
    for stage in enc["down"]:
        for r in stage["res"]:
            rb(f"encoder.down_blocks.{seq}", r)
            seq += 1
        if "resample" in stage:
            conv(f"encoder.down_blocks.{seq}.resample.1",
                 stage["resample"]["conv"])
            if "time_conv" in stage["resample"]:
                conv(f"encoder.down_blocks.{seq}.time_conv",
                     stage["resample"]["time_conv"])
            seq += 1
    rb("encoder.mid_block.resnets.0", enc["mid_rb1"])
    attn("encoder.mid_block.attentions.0", enc["mid_attn"])
    rb("encoder.mid_block.resnets.1", enc["mid_rb2"])
    sd["encoder.norm_out.gamma"] = np.asarray(enc["head_norm"]["gamma"])
    conv("encoder.conv_out", enc["head_conv"])

    dec = params["decoder"]
    conv("decoder.conv_in", dec["conv1"])
    rb("decoder.mid_block.resnets.0", dec["mid_rb1"])
    attn("decoder.mid_block.attentions.0", dec["mid_attn"])
    rb("decoder.mid_block.resnets.1", dec["mid_rb2"])
    for i, stage in enumerate(dec["up"]):
        for j, r in enumerate(stage["res"]):
            rb(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "resample" in stage:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.resample.1",
                 stage["resample"]["conv"])
            if "time_conv" in stage["resample"]:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.time_conv",
                     stage["resample"]["time_conv"])
    sd["decoder.norm_out.gamma"] = np.asarray(dec["head_norm"]["gamma"])
    conv("decoder.conv_out", dec["head_conv"])

    conv("quant_conv", params["quant_conv"])
    conv("post_quant_conv", params["post_quant_conv"])
    return sd


def test_converter_roundtrip_and_numerics():
    params = wan_vae.init_wan_vae(jax.random.PRNGKey(0), CFG)
    sd = _export_diffusers_layout(params, CFG)
    back = qwenimage_vae.convert_qwenimage_vae_state_dict(sd, CFG)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
    a, _ = qwenimage_vae.encode(params, CFG, x)
    b, _ = qwenimage_vae.encode(back, CFG, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    ya = qwenimage_vae.decode(params, CFG, a)
    yb = qwenimage_vae.decode(back, CFG, b)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)


def test_config_matches_wan():
    # the reference uses the Wan2.1 latent statistics verbatim
    from videocof_tpu.configs import WanVAEConfig
    assert qwenimage_vae.QWENIMAGE_VAE_CONFIG == WanVAEConfig()
