"""QwenImage VAE = the Wan2.1 causal video VAE in diffusers clothing.

The reference's `AutoencoderKLQwenImage` (`videox_fun/models/qwenimage_vae.py
:684-760`) is architecturally identical to the Wan2.1 VAE — same base_dim 96 /
z_dim 16 / dim_mult / temporal downsample pattern and the SAME per-channel
latent statistics — refactored into diffusers module naming (down_blocks /
mid_block.resnets / up_blocks[i].resnets+upsamplers / conv_in / conv_out).
So the compute here is exactly `wan_vae` (whole-sequence) and
`wan_vae_streaming`; this module contributes the checkpoint-key converter and
the family-named API. Tiling (`use_tiling`) is unnecessary on TPU: the
streaming path already bounds memory per step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

from ..configs import WanVAEConfig
from . import wan_vae, wan_vae_streaming
from .weights import StateDict, _conv

QWENIMAGE_VAE_CONFIG = WanVAEConfig()  # identical geometry + latent stats

# re-exported compute (identical math)
encode = wan_vae.encode
decode = wan_vae.decode
encode_streaming = wan_vae_streaming.encode_streaming
decode_streaming = wan_vae_streaming.decode_streaming
init_qwenimage_vae = wan_vae.init_wan_vae


def _res_block(sd: StateDict, prefix: str, dtype) -> Dict[str, Any]:
    p = {
        "norm1": {"gamma": sd[prefix + ".norm1.gamma"].astype(dtype)},
        "conv1": _conv(sd, prefix + ".conv1", dtype),
        "norm2": {"gamma": sd[prefix + ".norm2.gamma"].astype(dtype)},
        "conv2": _conv(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, prefix + ".conv_shortcut", dtype)
    return p


def _attn_block(sd: StateDict, prefix: str, dtype) -> Dict[str, Any]:
    return {
        "norm": {"gamma": sd[prefix + ".norm.gamma"].astype(dtype)},
        "qkv": _conv(sd, prefix + ".to_qkv", dtype),
        "proj": _conv(sd, prefix + ".proj", dtype),
    }


def convert_qwenimage_vae_state_dict(sd: StateDict,
                                     cfg: WanVAEConfig = QWENIMAGE_VAE_CONFIG,
                                     dtype=np.float32) -> Dict[str, Any]:
    """diffusers-layout keys -> the `wan_vae` pytree."""
    n = len(cfg.dim_mult)

    enc: Dict[str, Any] = {"conv1": _conv(sd, "encoder.conv_in", dtype),
                           "down": []}
    seq = 0
    for i in range(n):
        stage: Dict[str, Any] = {"res": []}
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(
                _res_block(sd, f"encoder.down_blocks.{seq}", dtype))
            seq += 1
        if i != n - 1:
            pre = f"encoder.down_blocks.{seq}"
            stage["resample"] = {"conv": _conv(sd, pre + ".resample.1", dtype)}
            if pre + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, pre + ".time_conv",
                                                       dtype)
            seq += 1
        enc["down"].append(stage)
    enc["mid_rb1"] = _res_block(sd, "encoder.mid_block.resnets.0", dtype)
    enc["mid_attn"] = _attn_block(sd, "encoder.mid_block.attentions.0", dtype)
    enc["mid_rb2"] = _res_block(sd, "encoder.mid_block.resnets.1", dtype)
    enc["head_norm"] = {"gamma": sd["encoder.norm_out.gamma"].astype(dtype)}
    enc["head_conv"] = _conv(sd, "encoder.conv_out", dtype)

    dec: Dict[str, Any] = {"conv1": _conv(sd, "decoder.conv_in", dtype)}
    dec["mid_rb1"] = _res_block(sd, "decoder.mid_block.resnets.0", dtype)
    dec["mid_attn"] = _attn_block(sd, "decoder.mid_block.attentions.0", dtype)
    dec["mid_rb2"] = _res_block(sd, "decoder.mid_block.resnets.1", dtype)
    dec["up"] = []
    for i in range(n):
        stage = {"res": []}
        for j in range(cfg.num_res_blocks + 1):
            stage["res"].append(_res_block(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype))
        pre = f"decoder.up_blocks.{i}.upsamplers.0"
        if pre + ".resample.1.weight" in sd:
            stage["resample"] = {"conv": _conv(sd, pre + ".resample.1", dtype)}
            if pre + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, pre + ".time_conv",
                                                       dtype)
        dec["up"].append(stage)
    dec["head_norm"] = {"gamma": sd["decoder.norm_out.gamma"].astype(dtype)}
    dec["head_conv"] = _conv(sd, "decoder.conv_out", dtype)

    return {
        "encoder": enc,
        "quant_conv": _conv(sd, "quant_conv", dtype),
        "post_quant_conv": _conv(sd, "post_quant_conv", dtype),
        "decoder": dec,
    }
