"""Pipeline factory: build a `WanPipeline` from a Wan2.1 checkpoint directory
(the reference's config-driven model build — `fast_infer.py:277-345`,
`config/wan2.1/wan_civitai.yaml`), or from random weights for weight-free
environments.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .configs import (T5Config, WAN21_T2V_1_3B, WAN21_T2V_14B, WanDiTConfig,
                      WanVAEConfig)
from .data.tokenizer import WanTokenizer
from .models import t5_encoder, wan_dit, wan_vae, weights
from .pipeline import WanPipeline

# default sub-paths inside a Wan2.1 checkpoint dir (wan_civitai.yaml)
VAE_SUBPATH = "Wan2.1_VAE.pth"
T5_SUBPATH = "models_t5_umt5-xxl-enc-bf16.pth"
TOKENIZER_SUBPATH = "google/umt5-xxl"
FUSIONX_LORA = "Wan2.1_Text_to_Video_14B_FusionX_LoRA.safetensors"
# Wan2.2 A14B MoE checkpoint layout: two expert sub-dirs beside the shared
# VAE/T5/tokenizer (reference `config/wan2.2/wan_civitai_t2v.yaml`
# transformer_low/high_noise_model_subpath)
LOW_NOISE_SUBPATH = "low_noise_model"
HIGH_NOISE_SUBPATH = "high_noise_model"
WAN22_BOUNDARY = 0.875
# Wan2.2 3.8 VAE (TI2V-5B family), `config/wan2.2/wan_civitai_5b.yaml:12`
VAE22_SUBPATH = "Wan2.2_VAE.pth"


# diffusers `_class_name` -> family key for the non-Wan model families
# (the reference ships these as bare model files driven through external
# diffusers pipelines; its per-family UIs intended per-family serving —
# `videox_fun/ui/cogvideox_fun_ui.py`, dead in-snapshot)
FAMILY_CLASSES = {
    "CogVideoXTransformer3DModel": "cogvideox",
    "FluxTransformer2DModel": "flux",
    "QwenImageTransformer2DModel": "qwenimage",
}


def detect_family(model_name: str) -> str:
    """'wan' | 'cogvideox' | 'flux' | 'qwenimage' for a checkpoint dir.

    Diffusers-layout checkpoints carry a ``config.json`` with ``_class_name``
    either at the dir root (bare transformer dir) or under ``transformer/``
    (full pipeline dir); Wan checkpoint dirs carry neither."""
    if not model_name or not os.path.isdir(model_name):
        return "wan"
    import json
    for sub in ("", "transformer"):
        cfgf = os.path.join(model_name, sub, "config.json")
        if os.path.isfile(cfgf):
            try:
                with open(cfgf) as f:
                    cls = json.load(f).get("_class_name", "")
            except (OSError, ValueError):
                continue
            fam = FAMILY_CLASSES.get(cls)
            if fam:
                return fam
    return "wan"


def load_family_pipeline(model_name: str, dtype=jnp.bfloat16,
                         family: Optional[str] = None,
                         quantize: Optional[str] = None):
    """Build a CogVideoX / Flux / QwenImage pipeline from a checkpoint dir.

    Accepts a bare transformer dir or a diffusers pipeline dir (with
    ``transformer/`` and optionally ``vae/`` subdirs). Text encoders are out
    of scope by design (see pipeline/image_pipelines.py): the returned
    pipelines take precomputed text embeddings."""
    family = family or detect_family(model_name)
    tdir = model_name
    if os.path.isfile(os.path.join(model_name, "transformer",
                                   "config.json")):
        tdir = os.path.join(model_name, "transformer")
    vdir = os.path.join(model_name, "vae")
    has_vae = os.path.isfile(os.path.join(vdir, "config.json"))
    from .pipeline import (CogVideoXPipeline, FluxPipeline,
                           QwenImagePipeline)
    if family == "cogvideox":
        if not has_vae:
            raise ValueError(
                f"CogVideoX checkpoint {model_name!r} needs a vae/ subdir "
                "(AutoencoderKLCogVideoX) to decode videos")
        return CogVideoXPipeline.from_pretrained(tdir, vdir, dtype=dtype,
                                                 quantize=quantize)
    if family == "qwenimage":
        return QwenImagePipeline.from_pretrained(
            tdir, vae_path=vdir if os.path.isdir(vdir) else None,
            dtype=dtype, quantize=quantize)
    if family == "flux":
        return FluxPipeline.from_pretrained(
            tdir, vae_path=vdir if has_vae else None, dtype=dtype,
            quantize=quantize)
    raise ValueError(f"unknown model family {family!r} for {model_name!r}")


def is_wan22_moe_dir(model_name: str) -> bool:
    """True when ``model_name`` is a Wan2.2 A14B dual-expert checkpoint dir
    (contains both ``low_noise_model/`` and ``high_noise_model/``)."""
    return (os.path.isdir(os.path.join(model_name, LOW_NOISE_SUBPATH)) and
            os.path.isdir(os.path.join(model_name, HIGH_NOISE_SUBPATH)))


def is_vae22_dir(model_name: str) -> bool:
    """True when the checkpoint dir ships the Wan2.2 3.8 VAE (TI2V-5B
    layout: ``Wan2.2_VAE.pth`` and no ``Wan2.1_VAE.pth``)."""
    return (bool(model_name)
            and os.path.isfile(os.path.join(model_name, VAE22_SUBPATH))
            and not os.path.isfile(os.path.join(model_name, VAE_SUBPATH)))


def load_pipeline(
    model_name: str,
    dtype=jnp.bfloat16,
    random_init: bool = False,
    dit_cfg: Optional[WanDiTConfig] = None,
    vae_cfg: Optional[WanVAEConfig] = None,
    t5_cfg: Optional[T5Config] = None,
    seed: int = 0,
    attn_backend: Optional[str] = None,
    high_noise_model: Optional[str] = None,
    boundary: float = 0.875,
    require_real_tokenizer: bool = True,
    quantize: Optional[str] = None,
    offload_t5: bool = False,
    lora_paths=None,
    precompile: Optional[dict] = None,
) -> WanPipeline:
    """Build a pipeline from a checkpoint dir (or random weights).

    ``high_noise_model``: path to a second DiT checkpoint dir — returns a
    `Wan22Pipeline` routing high-noise timesteps to it (the Wan2.2 A14B MoE
    layout ships low/high-noise expert directories).

    ``quantize="fp8"``: store DiT matmul weights as float8_e4m3fn with
    per-layer scales, dequantized inside the scanned block body
    (`wan_dit._kernel`). Halves DiT HBM — the 14B fits a 16 GB chip
    (14 GB fp8 + activations) where bf16 (28 GB) cannot load at all. The
    TPU-native replacement for the reference's sequential CPU offload
    (`inference.py:306-321`, `utils/fp8_optimization.py`). Quantization of
    checkpoint weights happens HOST-side (numpy), so the fp32/bf16 copy
    never touches the device.

    ``offload_t5=True``: keep the umT5 encoder weights host-resident; they
    stream to the device only for the duration of each `encode_prompt` call
    (staged residency: encode text -> free -> DiT has the chip to itself).

    ``lora_paths``: sequence of (path, multiplier) fused into the DiT
    weights BEFORE quantization (host-side on the checkpoint path), matching
    the reference's merge-then-infer flow (`fast_infer.py:366-386`).

    ``precompile``: kwargs for `WanPipeline.precompile_fused` (height,
    width, source_frames, ...). The fused denoise executable is AOT-
    compiled from abstract shapes BEFORE the DiT weights ship, and the
    weights land directly in its expected input formats — mandatory for
    the 14B fp8 on a 16 GB chip, where a dispatch-time relayout copy of
    the 13.8 GiB tree would exhaust HBM (see utils/layouts.py)."""
    from .utils.jit_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # non-Wan family checkpoint dirs (CogVideoX / Flux / QwenImage) route to
    # their own pipelines; every Wan-specific knob below is meaningless for
    # them (they carry no umT5/LoRA/MoE machinery)
    if not random_init and detect_family(model_name) != "wan":
        return load_family_pipeline(model_name, dtype=dtype)

    if vae_cfg is None:
        # TI2V-5B-style checkpoints ship the Wan2.2 3.8 VAE
        # (`config/wan2.2/wan_civitai_5b.yaml:11-12`: AutoencoderKLWan3_8,
        # Wan2.2_VAE.pth); everything else uses the 2.1 causal VAE
        if not random_init and is_vae22_dir(model_name):
            from .models.wan_vae22 import Wan22VAEConfig
            vae_cfg = Wan22VAEConfig()
        else:
            vae_cfg = WanVAEConfig()
    t5_cfg = t5_cfg or T5Config()

    if random_init:
        dit_cfg = dit_cfg or WAN21_T2V_1_3B
        keys = jax.random.split(jax.random.PRNGKey(seed), 3)
        dit_params = jax.jit(
            lambda k: wan_dit.init_wan_dit(k, dit_cfg, dtype=dtype))(keys[0])
        from .models.wan_vae22 import Wan22VAEConfig, init_wan22_vae
        vae_init = (init_wan22_vae if isinstance(vae_cfg, Wan22VAEConfig)
                    else wan_vae.init_wan_vae)
        vae_params = jax.jit(
            lambda k: vae_init(k, vae_cfg, dtype=dtype))(keys[1])
        t5_params = jax.jit(
            lambda k: t5_encoder.init_t5_encoder(k, t5_cfg, dtype=dtype)
        )(keys[2])
        for path, mult in (lora_paths or ()):
            from .models.lora import merge_lora
            dit_params = merge_lora(dit_params, dit_cfg, path,
                                    multiplier=mult)
        if quantize == "fp8":
            from .utils.fp8 import quantize_params_fp8
            dit_params = jax.jit(quantize_params_fp8)(dit_params)
        elif quantize:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        tokenizer = WanTokenizer(vocab_size=t5_cfg.vocab)
        pipe = WanPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                           t5_params, t5_cfg, tokenizer, dtype=dtype,
                           attn_backend=attn_backend)
        if precompile is not None:
            pipe.precompile_fused(**precompile)
        return pipe

    np_dtype = {jnp.bfloat16: "bfloat16", jnp.float32: "float32"}.get(
        dtype, "float32")
    import numpy as np
    import ml_dtypes
    npdt = np.dtype(np_dtype if np_dtype == "float32"
                    else ml_dtypes.bfloat16)

    # Wan2.2 A14B MoE layout auto-detection: DiT weights live in the
    # low/high-noise expert sub-dirs, VAE/T5/tokenizer at the root
    dit_dir = model_name
    if high_noise_model is None and is_wan22_moe_dir(model_name):
        dit_dir = os.path.join(model_name, LOW_NOISE_SUBPATH)
        high_noise_model = os.path.join(model_name, HIGH_NOISE_SUBPATH)

    if dit_cfg is None:
        dit_cfg = weights.dit_config_from_checkpoint(dit_dir)
    sd = weights.load_state_dict(dit_dir)
    # VACE checkpoint auto-detection: the control branch's keys mark a
    # `VaceWanTransformer3DModel` state dict (`wan_transformer3d_vace.py`)
    vace_params = None
    vace_stride = 2
    if any(k.startswith("vace_patch_embedding") for k in sd):
        from .models import wan_dit_vace
        n_vace = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("vace_blocks."))
        vace_stride = dit_cfg.num_layers // n_vace
        dit_params, vace_params = wan_dit_vace.convert_vace_state_dict(
            sd, dit_cfg, stride=vace_stride, dtype=npdt)
    else:
        dit_params = weights.convert_dit_state_dict(sd, dit_cfg, dtype=npdt)
    # Fun-Control camera checkpoints carry a `control_adapter.*` branch
    # (`wan_transformer3d.py:703-705`)
    camera_params = None
    if any(k.startswith("control_adapter.") for k in sd):
        from .pipeline.camera_pipeline import \
            convert_camera_adapter_state_dict
        camera_params = convert_camera_adapter_state_dict(sd, dtype=npdt)
    del sd

    from .models.wan_vae22 import (Wan22VAEConfig,
                                   convert_wan22_vae_state_dict)
    if isinstance(vae_cfg, Wan22VAEConfig):
        vae_sd = weights.load_state_dict(
            os.path.join(model_name, VAE22_SUBPATH))
        vae_params = convert_wan22_vae_state_dict(vae_sd, vae_cfg,
                                                  dtype=npdt)
    else:
        vae_sd = weights.load_state_dict(
            os.path.join(model_name, VAE_SUBPATH))
        vae_params = weights.convert_vae_state_dict(vae_sd, vae_cfg,
                                                    dtype=npdt)
    del vae_sd

    t5_sd = weights.load_state_dict(os.path.join(model_name, T5_SUBPATH))
    t5_params = weights.convert_t5_state_dict(t5_sd, t5_cfg, dtype=npdt)
    del t5_sd

    # A real checkpoint dir demands a real tokenizer: failing over to the
    # hash tokenizer here would silently corrupt production prompts.
    tok_path = os.path.join(model_name, TOKENIZER_SUBPATH)
    tokenizer = WanTokenizer(tok_path if os.path.isdir(tok_path)
                             else TOKENIZER_SUBPATH, vocab_size=t5_cfg.vocab,
                             require_real=require_real_tokenizer)

    # LoRA fusion happens host-side here, BEFORE quantization, so the 14B
    # fp8 path never materializes bf16 weights on the device
    for path, mult in (lora_paths or ()):
        from .models.lora import merge_lora
        dit_params = merge_lora(dit_params, dit_cfg, path, multiplier=mult)

    if quantize == "fp8":
        # host-side: the bf16/fp32 copy never ships to the device
        from .utils.fp8 import quantize_params_fp8
        dit_params = quantize_params_fp8(dit_params)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")

    if precompile is None:
        dit_params = jax.tree.map(jnp.asarray, dit_params)
    # (precompile: DiT stays host-side until the fused executable's input
    # formats are known — see the ship step below)
    vae_params = jax.tree.map(jnp.asarray, vae_params)
    if not offload_t5:
        t5_params = jax.tree.map(jnp.asarray, t5_params)
    # (offload_t5: numpy leaves stream to the device per encode_prompt call
    # and are freed with the call's temporaries — staged residency)

    if high_noise_model:
        from .pipeline import Wan22Pipeline
        sd2 = weights.load_state_dict(high_noise_model)
        dit2 = weights.convert_dit_state_dict(sd2, dit_cfg, dtype=npdt)
        # LoRAs apply to BOTH experts (high-noise steps would otherwise run
        # un-adapted weights), and before quantization like the primary
        for path, mult in (lora_paths or ()):
            from .models.lora import merge_lora
            dit2 = merge_lora(dit2, dit_cfg, path, multiplier=mult)
        if quantize == "fp8":
            from .utils.fp8 import quantize_params_fp8
            dit2 = quantize_params_fp8(dit2)
        if precompile is None:
            dit2 = jax.tree.map(jnp.asarray, dit2)
        pipe = Wan22Pipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                             t5_params, t5_cfg, tokenizer, dtype=dtype,
                             attn_backend=attn_backend, dit_params_2=dit2,
                             boundary=boundary)
        if precompile is not None:
            # dual-expert AOT: compile the two-phase fused executable from
            # abstract shapes, then create BOTH experts' weights directly in
            # its input formats (see utils/layouts.py)
            from .utils.layouts import ship_tree_into
            fmts1, fmts2 = pipe.precompile_fused(
                **precompile,
                dit_param_abstract=jax.eval_shape(lambda p: p,
                                                  pipe.dit_params),
                dit_param_2_abstract=jax.eval_shape(lambda p: p,
                                                    pipe.dit_params_2))
            pipe.dit_params = ship_tree_into(pipe.dit_params, fmts1)
            pipe.dit_params_2 = ship_tree_into(pipe.dit_params_2, fmts2)
        return pipe
    if vace_params is not None:
        from .pipeline import VacePipeline
        # (no fused-AOT precompile on the control path — VACE steps are
        # dispatched individually; ship both trees plainly)
        return VacePipeline(jax.tree.map(jnp.asarray, dit_params), dit_cfg,
                            vae_params, vae_cfg, t5_params, t5_cfg,
                            tokenizer, dtype=dtype,
                            attn_backend=attn_backend,
                            vace_params=jax.tree.map(jnp.asarray,
                                                     vace_params),
                            vace_stride=vace_stride)
    if camera_params is not None:
        from .pipeline import CameraPipeline
        return CameraPipeline(jax.tree.map(jnp.asarray, dit_params),
                              dit_cfg, vae_params, vae_cfg, t5_params,
                              t5_cfg, tokenizer, dtype=dtype,
                              attn_backend=attn_backend,
                              camera_params=jax.tree.map(jnp.asarray,
                                                         camera_params))
    pipe = WanPipeline(dit_params, dit_cfg, vae_params, vae_cfg, t5_params,
                       t5_cfg, tokenizer, dtype=dtype,
                       attn_backend=attn_backend)
    if precompile is not None:
        from .utils.layouts import ship_tree_into
        fmts = pipe.precompile_fused(
            **precompile,
            dit_param_abstract=jax.eval_shape(lambda p: p, pipe.dit_params))
        pipe.dit_params = ship_tree_into(pipe.dit_params, fmts)
    return pipe
