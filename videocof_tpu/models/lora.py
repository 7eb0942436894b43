"""LoRA weight fusion.

As in the reference, LoRA is fused algebraically into the weights at load time
(`lora_utils.py:371-500`: ``W += multiplier * (alpha/rank) * up @ down``) so
the compiled graph never sees adapter structure. Unmerge subtracts the same
delta (`lora_utils.py:503-620`).

Key-format zoo handled (reference `lora_utils.py:379-393`):
  * kohya:  ``lora_unet_blocks_0_self_attn_q.lora_up.weight`` /
    ``.lora_down.weight`` / ``.alpha``
  * PEFT / diffusion_model: ``diffusion_model.blocks.0.self_attn.q.lora_A
    .weight`` (A=down, B=up)
  * Comfy "lora_A/lora_B" under ``lora_unet_`` underscore names

Because our DiT blocks are stacked on a leading layer axis for `lax.scan`,
per-layer deltas are applied with ``.at[layer].add``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanDiTConfig

# our pytree path for each torch module name pattern ({i} = layer index)
_BLOCK_PATHS = {
    "self_attn.q": ("self_attn", "q"),
    "self_attn.k": ("self_attn", "k"),
    "self_attn.v": ("self_attn", "v"),
    "self_attn.o": ("self_attn", "o"),
    "cross_attn.q": ("cross_attn", "q"),
    "cross_attn.k": ("cross_attn", "k"),
    "cross_attn.v": ("cross_attn", "v"),
    "cross_attn.o": ("cross_attn", "o"),
    "ffn.0": ("ffn", "fc1"),
    "ffn.2": ("ffn", "fc2"),
}
_TOP_PATHS = {
    "text_embedding.0": ("text_mlp", "fc1"),
    "text_embedding.2": ("text_mlp", "fc2"),
    "time_embedding.0": ("time_mlp", "fc1"),
    "time_embedding.2": ("time_mlp", "fc2"),
    "time_projection.1": ("time_proj", "fc"),
    "head.head": ("head", "fc"),
    "patch_embedding": ("patch_embed",),
}


def _known_module_names(num_layers: int):
    names = dict(_TOP_PATHS)
    out = {}
    for dotted, path in names.items():
        out[dotted] = (None, path)
    for i in range(num_layers):
        for dotted, path in _BLOCK_PATHS.items():
            out[f"blocks.{i}.{dotted}"] = (i, ("blocks",) + path)
    return out


def parse_lora_state_dict(sd: Dict[str, np.ndarray], num_layers: int
                          ) -> Dict[str, Dict[str, Any]]:
    """-> {dotted_module_name: {down, up, alpha}}; unknown modules skipped."""
    known = _known_module_names(num_layers)
    underscore_to_dotted = {k.replace(".", "_"): k for k in known}

    mods: Dict[str, Dict[str, Any]] = {}

    def canon(raw: str) -> Optional[str]:
        if raw in known:
            return raw
        return underscore_to_dotted.get(raw)

    for key, val in sd.items():
        # kohya underscore names first (they would also match the generic
        # dotted regex below, whose canon() would then fail)
        m = re.match(
            r"^lora_unet_(.+?)\.(lora_A|lora_B|lora_down|lora_up)"
            r"(?:\.default)?\.weight$", key)
        if m:
            name, which = m.group(1), m.group(2)
        else:
            # dotted formats: optional diffusion_model./transformer. prefix
            # (PEFT adapters exported bare use no prefix at all — the
            # reference prepends lora_unet__ to any lora_A/lora_B key,
            # `lora_utils.py:386-393`), optional peft ".default" infix
            m = re.match(
                r"^(?:diffusion_model\.|transformer\.)?(.+?)\."
                r"(lora_A|lora_B|lora_down|lora_up)(?:\.default)?\.weight$",
                key)
            if m:
                name, which = m.group(1), m.group(2)
            else:
                m = re.match(r"^(?:lora_unet_|diffusion_model\.|"
                             r"transformer\.)?(.+?)\.alpha$", key)
                if m:
                    name = canon(m.group(1))
                    if name:
                        mods.setdefault(name, {})["alpha"] = float(
                            np.asarray(val).reshape(()))
                continue
        name = canon(name)
        if name is None:
            continue
        slot = "down" if which in ("lora_A", "lora_down") else "up"
        mods.setdefault(name, {})[slot] = np.asarray(val)
    return {k: v for k, v in mods.items() if "down" in v and "up" in v}


def merge_lora(params: Dict[str, Any], cfg: WanDiTConfig,
               lora: Union[str, Dict[str, np.ndarray]],
               multiplier: float = 1.0) -> Dict[str, Any]:
    """Returns a new params pytree with the LoRA deltas fused in. ``lora`` is
    a state dict or a safetensors/pth path."""
    if isinstance(lora, str):
        from .weights import load_state_dict
        lora = load_state_dict(lora)
    mods = parse_lora_state_dict(lora, cfg.num_layers)
    known = _known_module_names(cfg.num_layers)

    params = jax.tree.map(lambda x: x, params)  # shallow copy of containers

    for name, entry in mods.items():
        layer, path = known[name]
        down, up = entry["down"], entry["up"]
        rank = down.shape[0]
        scale = entry.get("alpha", float(rank)) / rank
        # conv LoRA (e.g. patch_embedding 1x2x2): flatten kernel dims the same
        # way the base conversion does
        if down.ndim > 2:
            down = down.reshape(down.shape[0], -1)
        if up.ndim > 2:
            up = up.reshape(up.shape[0], -1)
        delta_t = multiplier * scale * (up @ down)        # [out, in]
        node = params
        for p in path:
            node = node[p]
        kern = node["kernel"]
        if isinstance(kern, dict):
            raise ValueError(
                f"cannot fuse LoRA into fp8-quantized weight {name!r}: "
                "merge before quantization (factory.load_pipeline applies "
                "lora_paths ahead of quantize='fp8')")
        if isinstance(kern, np.ndarray):
            # host-side fusion (numpy): used by the 14B fp8 path, where
            # weights must never materialize bf16 on the device
            delta = delta_t.T.astype(np.float32)
            kern = np.array(kern)  # copy
            if layer is None:
                kern = (kern.astype(np.float32) + delta).astype(kern.dtype)
            else:
                kern[layer] = (kern[layer].astype(np.float32)
                               + delta).astype(kern.dtype)
            node["kernel"] = kern
        else:
            delta = jnp.asarray(delta_t.T, dtype=jnp.float32)
            if layer is None:
                node["kernel"] = (kern.astype(jnp.float32) + delta).astype(
                    kern.dtype)
            else:
                upd = kern[layer].astype(jnp.float32) + delta
                node["kernel"] = kern.at[layer].set(upd.astype(kern.dtype))
    return params


def unmerge_lora(params, cfg: WanDiTConfig, lora, multiplier: float = 1.0):
    return merge_lora(params, cfg, lora, multiplier=-multiplier)


# ---------------------------------------------------------------- adapters
#
# Runtime LoRA adapters for TRAINING (the reference's LoRANetwork,
# `lora_utils.py:22-369`, trains adapters with forward hooks; VideoCoF's
# released weights are such adapters). Tensors keep the torch orientation
# (down [r, din], up [dout, r]) so export round-trips through merge_lora
# byte-compatibly. Block adapters are stacked on the layer axis like the
# DiT params.

_ADAPTER_TARGETS = {
    "self_attn": ("q", "k", "v", "o"),
    "cross_attn": ("q", "k", "v", "o"),
    "ffn": ("fc1", "fc2"),
}


def _target_dims(cfg: WanDiTConfig):
    d, f = cfg.dim, cfg.ffn_dim
    dims = {}
    for n in ("q", "k", "v", "o"):
        dims[("self_attn", n)] = (d, d)
        dims[("cross_attn", n)] = (d, d)
    dims[("ffn", "fc1")] = (d, f)
    dims[("ffn", "fc2")] = (f, d)
    return dims


def init_lora_adapters(key, cfg: WanDiTConfig, rank: int = 16,
                       dtype=jnp.float32) -> Dict[str, Any]:
    """Zero-initialized-up adapters (identity at init, standard LoRA):
    {"rank", "alpha", "blocks": {module: {name: {down [L,r,din],
    up [L,dout,r]}}}}."""
    L = cfg.num_layers
    dims = _target_dims(cfg)
    keys = iter(jax.random.split(key, len(dims)))
    blocks: Dict[str, Any] = {}
    for (mod, name), (din, dout) in dims.items():
        blocks.setdefault(mod, {})[name] = {
            "down": (jax.random.normal(next(keys), (L, rank, din))
                     / rank).astype(dtype),
            "up": jnp.zeros((L, dout, rank), dtype),
        }
    return {"rank": rank, "alpha": float(rank), "blocks": blocks}


def fuse_block_adapters(bp: Dict[str, Any], ad: Dict[str, Any],
                        scale) -> Dict[str, Any]:
    """Per-block W_eff = W + scale*(up@down), for ONE scan slice (down
    [r, din], up [dout, r] — the [L, ...]-stacked adapters sliced by
    `lax.scan`). Used inside the scanned block body
    (`wan_dit.wan_dit_forward(lora=...)`): only one block's fused kernel is
    ever materialized, vs `apply_lora_adapters`' full-tree copy (+2.8 GiB
    at 1.3B — the difference between LoRA training fitting the 29.6k-token
    CoF geometry on a 16 GB chip or not). Also dequantizes fp8 base
    storage, enabling LoRA-over-fp8-frozen-base training."""
    import jax.numpy as jnp
    out = {k: v for k, v in bp.items()}
    for mod, names in ad.items():
        out[mod] = {k: v for k, v in out[mod].items()}
        for name, a in names.items():
            node = dict(out[mod][name])
            kern = node["kernel"]
            delta = jnp.einsum("rd,or->do", a["down"].astype(jnp.float32),
                               a["up"].astype(jnp.float32))
            if isinstance(kern, dict):          # fp8 {fp8, scale} storage
                k = kern["fp8"].astype(jnp.float32) * kern["scale"]
                node["kernel"] = (k + scale * delta).astype(jnp.bfloat16)
            else:
                node["kernel"] = (kern.astype(jnp.float32)
                                  + scale * delta).astype(kern.dtype)
            out[mod][name] = node
    return out


def apply_lora_adapters(params: Dict[str, Any], adapters: Dict[str, Any],
                        multiplier: float = 1.0) -> Dict[str, Any]:
    """Returns params with W_eff = W + multiplier*(alpha/rank)*(up@down)
    fused in (differentiable wrt the adapters — the training-time analogue
    of merge_lora)."""
    scale = multiplier * adapters["alpha"] / adapters["rank"]
    out = {k: v for k, v in params.items()}
    out["blocks"] = {k: v for k, v in params["blocks"].items()}
    for mod, names in adapters["blocks"].items():
        out["blocks"][mod] = {k: v for k, v in out["blocks"][mod].items()}
        for name, ad in names.items():
            node = dict(out["blocks"][mod][name])
            kern = node["kernel"]                      # [L, din, dout]
            if isinstance(kern, dict):
                raise ValueError("cannot apply adapters over fp8 weights")
            # delta^T per layer: (up @ down)^T = down^T @ up^T
            delta = jnp.einsum("lrd,lor->ldo", ad["down"].astype(jnp.float32),
                               ad["up"].astype(jnp.float32))
            node["kernel"] = (kern.astype(jnp.float32)
                              + scale * delta).astype(kern.dtype)
            out["blocks"][mod][name] = node
    return out


def load_runtime_lora(loras, cfg: WanDiTConfig
                      ) -> Tuple[Optional[Dict[str, Any]], Dict[str, Any]]:
    """Published LoRA files -> RUNTIME adapters for fp8-resident serving.

    The reference's flagship deployment is the Wan 14B base plus its
    released VideoCoF LoRA adapters; on a 16 GB chip the 14B only fits
    with fp8 weight storage, and fusing a delta into fp8 kernels is
    impossible without re-materializing bf16 (`merge_lora` refuses). This
    builds the same stacked-adapter pytree the trainer uses so the deltas
    apply PER BLOCK inside the scanned forward
    (`wan_dit_forward(lora=...)` / a ``"lora__"`` node in the param tree)
    — no weight mutation, fp8 stays resident.

    ``loras``: list of (state_dict_or_path, multiplier). Multiple files
    combine by RANK CONCATENATION with ``multiplier * alpha/rank`` folded
    into each file's up matrices, so the runtime scale is always 1.0.

    Returns (runtime, leftover): ``runtime`` is ``{"blocks": {mod: {name:
    {down [L,R,din], up [L,dout,R]}}}, "scale": 1.0}`` or None when no
    block modules exist; ``leftover`` maps non-block dotted module names
    (text/time embedding, head, patch embed) to their entries — those
    cannot ride the scanned path and the caller decides whether to
    merge or skip them.
    """
    from .weights import load_state_dict

    L = cfg.num_layers
    known = _known_module_names(L)
    # (mod, name) -> list over files of per-layer {layer: (down, up)}
    per_file: Dict[Tuple[str, str], list] = {}
    leftover: Dict[str, Any] = {}
    dims: Dict[Tuple[str, str], Tuple[int, int]] = {}

    for sd, mult in loras:
        if isinstance(sd, str):
            sd = load_state_dict(sd)
        mods = parse_lora_state_dict(sd, L)
        file_blocks: Dict[Tuple[str, str], Dict[int, Tuple]] = {}
        for dotted, entry in mods.items():
            layer, path = known[dotted]
            if layer is None or path[0] != "blocks":
                leftover[dotted] = {**entry, "multiplier": mult}
                continue
            mod, name = path[1], path[2]
            down, up = entry["down"], entry["up"]
            if down.ndim > 2:
                down = down.reshape(down.shape[0], -1)
            if up.ndim > 2:
                up = up.reshape(up.shape[0], -1)
            rank = down.shape[0]
            scale = mult * entry.get("alpha", float(rank)) / rank
            file_blocks.setdefault((mod, name), {})[layer] = (
                down.astype(np.float32), up.astype(np.float32) * scale)
            dims[(mod, name)] = (down.shape[1], up.shape[0])
        for key, layers in file_blocks.items():
            per_file.setdefault(key, []).append(layers)

    if not per_file:
        return None, leftover

    blocks: Dict[str, Any] = {}
    for (mod, name), files in per_file.items():
        din, dout = dims[(mod, name)]
        downs, ups = [], []
        for layers in files:
            r = max(d.shape[0] for d, _ in layers.values())
            dn = np.zeros((L, r, din), np.float32)
            up = np.zeros((L, dout, r), np.float32)
            for i, (d, u) in layers.items():
                dn[i, :d.shape[0]] = d
                up[i, :, :u.shape[1]] = u
            downs.append(dn)
            ups.append(up)
        blocks.setdefault(mod, {})[name] = {
            "down": jnp.asarray(np.concatenate(downs, axis=1)),
            "up": jnp.asarray(np.concatenate(ups, axis=2)),
        }
    return {"blocks": blocks, "scale": 1.0}, leftover


def lora_adapters_to_state_dict(adapters: Dict[str, Any]) -> Dict[str, Any]:
    """Adapters -> kohya-format numpy state dict (lora_unet_* keys), loadable
    by merge_lora and by the reference's lora_utils."""
    name_map = {("ffn", "fc1"): "ffn.0", ("ffn", "fc2"): "ffn.2"}
    sd: Dict[str, Any] = {}
    for mod, names in adapters["blocks"].items():
        for name, ad in names.items():
            dotted = name_map.get((mod, name), f"{mod}.{name}")
            down, up = np.asarray(ad["down"]), np.asarray(ad["up"])
            for layer in range(down.shape[0]):
                base = "lora_unet_" + f"blocks.{layer}.{dotted}".replace(
                    ".", "_")
                sd[base + ".lora_down.weight"] = down[layer]
                sd[base + ".lora_up.weight"] = up[layer]
                sd[base + ".alpha"] = np.array(adapters["alpha"], np.float32)
    return sd
