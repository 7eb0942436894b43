"""Checkpoint save/load.

The reference's "checkpointing" is weight loading plus LoRA save with
sd-webui metadata (`lora_utils.py:318-342`, SURVEY.md §5). Here:
  * orbax for training-state checkpoints (params + optimizer state + step),
    the TPU-native resume path (sharded, async-capable);
  * safetensors export of DiT params back to the reference's torch key
    layout, so weights trained here load in the reference (round-trip of
    `models/weights.py`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanDiTConfig


# ------------------------------------------------------------------- orbax

def save_train_state(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        mgr.save(int(jax.device_get(state.step)), args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step}))
        mgr.wait_until_finished()


def restore_train_state(path: str, abstract_state: Any,
                        step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp
    from ..training.train_step import TrainState
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        step = mgr.latest_step() if step is None else step
        target = {"params": abstract_state.params,
                  "opt_state": abstract_state.opt_state,
                  "step": abstract_state.step}
        out = mgr.restore(step, args=ocp.args.StandardRestore(target))
    return TrainState(params=out["params"], opt_state=out["opt_state"],
                      step=out["step"])


# -------------------------------------------------- safetensors round-trip

def _t(x) -> np.ndarray:
    """our kernel [in, out] -> torch weight [out, in]."""
    return np.ascontiguousarray(np.asarray(x).T)


def export_dit_state_dict(params: Dict[str, Any], cfg: WanDiTConfig
                          ) -> Dict[str, np.ndarray]:
    """Inverse of `weights.convert_dit_state_dict`: emits the Wan torch key
    layout so checkpoints interchange with the reference ecosystem."""
    f32 = lambda x: np.asarray(x, np.float32)
    pt, ph, pw = cfg.patch_size
    sd: Dict[str, np.ndarray] = {}
    pe = np.asarray(params["patch_embed"]["kernel"])          # [in*k, out]
    sd["patch_embedding.weight"] = np.ascontiguousarray(
        pe.T.reshape(cfg.dim, cfg.in_dim, pt, ph, pw))
    sd["patch_embedding.bias"] = np.asarray(params["patch_embed"]["bias"])

    def lin(prefix, p, cast=np.asarray):
        sd[prefix + ".weight"] = cast(_t(p["kernel"]))
        if "bias" in p:
            sd[prefix + ".bias"] = cast(np.asarray(p["bias"]))

    lin("text_embedding.0", params["text_mlp"]["fc1"])
    lin("text_embedding.2", params["text_mlp"]["fc2"])
    lin("time_embedding.0", params["time_mlp"]["fc1"], f32)
    lin("time_embedding.2", params["time_mlp"]["fc2"], f32)
    lin("time_projection.1", params["time_proj"]["fc"], f32)
    lin("head.head", params["head"]["fc"])
    sd["head.modulation"] = f32(params["head"]["modulation"])[None]

    blocks = params["blocks"]
    for i in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[i], blocks)
        b = f"blocks.{i}."
        for which in ("self_attn", "cross_attn"):
            for n in ("q", "k", "v", "o"):
                lin(b + f"{which}.{n}", bp[which][n])
            sd[b + f"{which}.norm_q.weight"] = np.asarray(
                bp[which]["norm_q"]["weight"])
            sd[b + f"{which}.norm_k.weight"] = np.asarray(
                bp[which]["norm_k"]["weight"])
        if "k_img" in bp["cross_attn"]:
            lin(b + "cross_attn.k_img", bp["cross_attn"]["k_img"])
            lin(b + "cross_attn.v_img", bp["cross_attn"]["v_img"])
            sd[b + "cross_attn.norm_k_img.weight"] = np.asarray(
                bp["cross_attn"]["norm_k_img"]["weight"])
        lin(b + "ffn.0", bp["ffn"]["fc1"])
        lin(b + "ffn.2", bp["ffn"]["fc2"])
        sd[b + "modulation"] = f32(bp["modulation"])[None]
        if cfg.cross_attn_norm:
            sd[b + "norm3.weight"] = np.asarray(bp["norm3"]["scale"])
            sd[b + "norm3.bias"] = np.asarray(bp["norm3"]["bias"])
    if "img_emb" in params:
        ie = params["img_emb"]
        sd["img_emb.proj.0.weight"] = np.asarray(ie["ln1"]["scale"])
        sd["img_emb.proj.0.bias"] = np.asarray(ie["ln1"]["bias"])
        lin("img_emb.proj.1", ie["fc1"])
        lin("img_emb.proj.3", ie["fc2"])
        sd["img_emb.proj.4.weight"] = np.asarray(ie["ln2"]["scale"])
        sd["img_emb.proj.4.bias"] = np.asarray(ie["ln2"]["bias"])
    return sd


def save_dit_safetensors(path: str, params: Dict[str, Any],
                         cfg: WanDiTConfig) -> None:
    import safetensors.numpy
    sd = export_dit_state_dict(params, cfg)
    # bf16 arrays can't round-trip through safetensors.numpy; store fp32
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    safetensors.numpy.save_file(sd, path)
