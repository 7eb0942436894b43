"""Checkpoint loading: torch/safetensors state dicts -> JAX param pytrees.

Parity targets: the published Wan2.1 checkpoint layouts the reference loads —
DiT sharded safetensors with ``dict_mapping {in_dim: in_channels, dim:
hidden_size}`` (`wan_transformer3d.py:1157-1299`, `config/wan2.1/wan_civitai
.yaml:3-7`), the single-file VAE ``Wan2.1_VAE.pth`` (`wan_vae.py:684-706`),
and the single-file umT5 encoder (`wan_text_encoder.py:306-395`).

All conversion is pure key/shape bookkeeping on numpy arrays; torch is only
used (if available) to read ``.pth`` files.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from ..configs import T5Config, WanDiTConfig, WanVAEConfig

StateDict = Dict[str, np.ndarray]


# ---------------------------------------------------------------- file loading

def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16 -> keep values via float32 detour)
    import torch
    if t.dtype == torch.bfloat16:
        return t.detach().to(torch.float32).cpu().numpy()
    return t.detach().cpu().numpy()


def load_state_dict(path: str) -> StateDict:
    """Read a ``.safetensors`` / ``.pth`` file, or a directory of sharded
    safetensors (with or without an index json), into numpy arrays."""
    if os.path.isdir(path):
        idx = os.path.join(path, "diffusion_pytorch_model.safetensors.index.json")
        files = []
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            files = sorted({os.path.join(path, v) for v in weight_map.values()})
        else:
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".safetensors"))
        sd: StateDict = {}
        for f in files:
            sd.update(load_state_dict(f))
        return sd
    if path.endswith(".safetensors"):
        import safetensors
        sd = {}
        complete = True
        with safetensors.safe_open(path, framework="np") as f:
            for key in f.keys():
                try:
                    sd[key] = f.get_tensor(key)
                except TypeError:
                    # bf16 tensors are not representable in the numpy
                    # framework; a MIXED file must not return partial
                    complete = False
                    break
        if sd and complete:
            return sd
        from safetensors.torch import load_file
        return {k: _to_numpy(v) for k, v in load_file(path).items()}
    # torch pickle
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def read_checkpoint_config(model_dir: str,
                           dict_mapping: Optional[Dict[str, str]] = None
                           ) -> Dict[str, Any]:
    """config.json + the reference's dict_mapping translation
    (`wan_transformer3d.py:1166-1178`)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    dict_mapping = dict_mapping or {"in_dim": "in_channels",
                                    "dim": "hidden_size"}
    for src, dst in dict_mapping.items():
        if src in cfg:
            cfg[dst] = cfg[src]
    return cfg


def dit_config_from_checkpoint(model_dir: str) -> WanDiTConfig:
    raw = read_checkpoint_config(model_dir)
    keep = {k: raw[k] for k in (
        "model_type", "text_len", "in_dim", "dim", "ffn_dim", "freq_dim",
        "text_dim", "out_dim", "num_heads", "num_layers", "qk_norm",
        "cross_attn_norm", "eps") if k in raw}
    if "patch_size" in raw:
        keep["patch_size"] = tuple(raw["patch_size"])
    return WanDiTConfig(**keep)


# -------------------------------------------------------------- DiT conversion

def _lin(sd: StateDict, prefix: str, dtype, bias=True) -> Dict[str, np.ndarray]:
    p = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T).astype(dtype)}
    if bias and prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"].astype(dtype)
    return p


def convert_block_state_dict(sd: StateDict, prefix: str, cfg: WanDiTConfig,
                             dtype=np.float32) -> Dict[str, Any]:
    """One `WanAttentionBlock`'s torch keys (under ``prefix``, e.g.
    ``blocks.3.`` or ``vace_blocks.0.``) -> `wan_dit.init_block_params`
    pytree layout."""
    attn = lambda name: {
        "q": _lin(sd, prefix + name + ".q", dtype),
        "k": _lin(sd, prefix + name + ".k", dtype),
        "v": _lin(sd, prefix + name + ".v", dtype),
        "o": _lin(sd, prefix + name + ".o", dtype),
        "norm_q": {"weight": sd[prefix + name + ".norm_q.weight"].astype(
            dtype)},
        "norm_k": {"weight": sd[prefix + name + ".norm_k.weight"].astype(
            dtype)},
    }
    p = {
        "self_attn": attn("self_attn"),
        "cross_attn": attn("cross_attn"),
        "ffn": {"fc1": _lin(sd, prefix + "ffn.0", dtype),
                "fc2": _lin(sd, prefix + "ffn.2", dtype)},
        "modulation": sd[prefix + "modulation"].reshape(6, -1).astype(
            np.float32),
    }
    if prefix + "cross_attn.k_img.weight" in sd:
        # i2v image K/V branch (`wan_transformer3d.py:339-393`)
        p["cross_attn"]["k_img"] = _lin(sd, prefix + "cross_attn.k_img",
                                        dtype)
        p["cross_attn"]["v_img"] = _lin(sd, prefix + "cross_attn.v_img",
                                        dtype)
        p["cross_attn"]["norm_k_img"] = {"weight": sd[
            prefix + "cross_attn.norm_k_img.weight"].astype(dtype)}
    if cfg.cross_attn_norm:
        p["norm3"] = {"scale": sd[prefix + "norm3.weight"].astype(dtype),
                      "bias": sd[prefix + "norm3.bias"].astype(dtype)}
    return p


def convert_dit_state_dict(sd: StateDict, cfg: WanDiTConfig,
                           dtype=np.float32) -> Dict[str, Any]:
    """Wan DiT torch keys -> `wan_dit.init_wan_dit` pytree layout."""
    f32 = np.float32
    pe_w = sd["patch_embedding.weight"]       # [O, I, kt, kh, kw]
    O = pe_w.shape[0]
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                pe_w.reshape(O, -1).T).astype(dtype),
            "bias": sd["patch_embedding.bias"].astype(dtype),
        },
        "text_mlp": {"fc1": _lin(sd, "text_embedding.0", dtype),
                     "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_mlp": {"fc1": _lin(sd, "time_embedding.0", f32),
                     "fc2": _lin(sd, "time_embedding.2", f32)},
        "time_proj": {"fc": _lin(sd, "time_projection.1", f32)},
        "head": {
            "fc": _lin(sd, "head.head", dtype),
            "modulation": sd["head.modulation"].reshape(2, -1).astype(f32),
        },
    }

    if "img_emb.proj.0.weight" in sd:
        # i2v CLIP-feature MLPProj (`wan_transformer3d.py:551-563`:
        # Sequential(LN, Linear, GELU, Linear, LN))
        params["img_emb"] = {
            "ln1": {"scale": sd["img_emb.proj.0.weight"].astype(dtype),
                    "bias": sd["img_emb.proj.0.bias"].astype(dtype)},
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "ln2": {"scale": sd["img_emb.proj.4.weight"].astype(dtype),
                    "bias": sd["img_emb.proj.4.bias"].astype(dtype)},
        }

    blocks = [convert_block_state_dict(sd, f"blocks.{i}.", cfg, dtype)
              for i in range(cfg.num_layers)]
    params["blocks"] = _stack_pytrees(blocks)
    return params


def _stack_pytrees(trees):
    # host-side (numpy) stacking: conversion stays off-device so the caller
    # decides what ships (e.g. fp8-quantize first — factory.load_pipeline)
    import jax
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *trees)


# -------------------------------------------------------------- VAE conversion

def _conv(sd: StateDict, prefix: str, dtype) -> Dict[str, np.ndarray]:
    return {"kernel": sd[prefix + ".weight"].astype(dtype),
            "bias": sd[prefix + ".bias"].astype(dtype)}


def _res_block(sd: StateDict, prefix: str, dtype) -> Dict[str, Any]:
    # ResidualBlock.residual = Sequential(RMS, SiLU, Conv, RMS, SiLU, Dropout,
    # Conv) (`wan_vae.py:198-204`)
    p = {
        "norm1": {"gamma": sd[prefix + ".residual.0.gamma"].astype(dtype)},
        "conv1": _conv(sd, prefix + ".residual.2", dtype),
        "norm2": {"gamma": sd[prefix + ".residual.3.gamma"].astype(dtype)},
        "conv2": _conv(sd, prefix + ".residual.6", dtype),
    }
    if prefix + ".shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, prefix + ".shortcut", dtype)
    return p


def _attn_block(sd: StateDict, prefix: str, dtype) -> Dict[str, Any]:
    return {
        "norm": {"gamma": sd[prefix + ".norm.gamma"].astype(dtype)},
        "qkv": _conv(sd, prefix + ".to_qkv", dtype),
        "proj": _conv(sd, prefix + ".proj", dtype),
    }


def convert_vae_state_dict(sd: StateDict, cfg: WanVAEConfig,
                           dtype=np.float32) -> Dict[str, Any]:
    """Wan2.1_VAE.pth keys -> `wan_vae.init_wan_vae` pytree layout. The raw
    file has no 'model.' prefix (the reference adds it when loading into its
    wrapper — `wan_vae.py:699-702`); accept both."""
    if not any(k.startswith("encoder.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}

    n_stages = len(cfg.dim_mult)

    # ---- encoder: downsamples is a flat Sequential over stages
    enc: Dict[str, Any] = {"conv1": _conv(sd, "encoder.conv1", dtype),
                           "down": []}
    seq = 0
    for i in range(n_stages):
        stage: Dict[str, Any] = {"res": []}
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(
                _res_block(sd, f"encoder.downsamples.{seq}", dtype))
            seq += 1
        if i != n_stages - 1:
            pre = f"encoder.downsamples.{seq}"
            stage["resample"] = {"conv": _conv(sd, pre + ".resample.1", dtype)}
            if pre + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, pre + ".time_conv",
                                                       dtype)
            seq += 1
        enc["down"].append(stage)
    enc["mid_rb1"] = _res_block(sd, "encoder.middle.0", dtype)
    enc["mid_attn"] = _attn_block(sd, "encoder.middle.1", dtype)
    enc["mid_rb2"] = _res_block(sd, "encoder.middle.2", dtype)
    enc["head_norm"] = {"gamma": sd["encoder.head.0.gamma"].astype(dtype)}
    enc["head_conv"] = _conv(sd, "encoder.head.2", dtype)

    # ---- decoder: upsamples flat Sequential, num_res_blocks+1 per stage
    dec: Dict[str, Any] = {"conv1": _conv(sd, "decoder.conv1", dtype)}
    dec["mid_rb1"] = _res_block(sd, "decoder.middle.0", dtype)
    dec["mid_attn"] = _attn_block(sd, "decoder.middle.1", dtype)
    dec["mid_rb2"] = _res_block(sd, "decoder.middle.2", dtype)
    dec["up"] = []
    seq = 0
    for i in range(n_stages):
        stage = {"res": []}
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(
                _res_block(sd, f"decoder.upsamples.{seq}", dtype))
            seq += 1
        if i != n_stages - 1:
            pre = f"decoder.upsamples.{seq}"
            stage["resample"] = {"conv": _conv(sd, pre + ".resample.1", dtype)}
            if pre + ".time_conv.weight" in sd:
                stage["resample"]["time_conv"] = _conv(sd, pre + ".time_conv",
                                                       dtype)
            seq += 1
        dec["up"].append(stage)
    dec["head_norm"] = {"gamma": sd["decoder.head.0.gamma"].astype(dtype)}
    dec["head_conv"] = _conv(sd, "decoder.head.2", dtype)

    return {
        "encoder": enc,
        "quant_conv": _conv(sd, "conv1", dtype),
        "post_quant_conv": _conv(sd, "conv2", dtype),
        "decoder": dec,
    }


# --------------------------------------------------------------- T5 conversion

def convert_t5_state_dict(sd: StateDict, cfg: T5Config,
                          dtype=np.float32) -> Dict[str, Any]:
    """Wan umT5 checkpoint keys (`wan_text_encoder.py` module tree) ->
    `t5_encoder.init_t5_encoder` pytree."""
    def block(i: int):
        b = f"blocks.{i}."
        return {
            "norm1": {"weight": sd[b + "norm1.weight"].astype(dtype)},
            "attn": {n: {"kernel": np.ascontiguousarray(
                sd[b + f"attn.{n}.weight"].T).astype(dtype)}
                for n in ("q", "k", "v", "o")},
            "pos_emb": sd[b + "pos_embedding.embedding.weight"].astype(
                np.float32),
            "norm2": {"weight": sd[b + "norm2.weight"].astype(dtype)},
            "ffn": {
                "gate": {"kernel": np.ascontiguousarray(
                    sd[b + "ffn.gate.0.weight"].T).astype(dtype)},
                "fc1": {"kernel": np.ascontiguousarray(
                    sd[b + "ffn.fc1.weight"].T).astype(dtype)},
                "fc2": {"kernel": np.ascontiguousarray(
                    sd[b + "ffn.fc2.weight"].T).astype(dtype)},
            },
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": sd["token_embedding.weight"].astype(dtype),
        "blocks": _stack_pytrees(blocks),
        "norm": {"weight": sd["norm.weight"].astype(dtype)},
    }
