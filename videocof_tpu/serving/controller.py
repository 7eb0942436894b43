"""Serving controller — the framework-agnostic core of the reference's
`Wan_Controller` / `VideoCoF_Controller` (`videox_fun/ui/wan_ui.py:43-147`,
`examples/app.py:157-349`): owns the loaded pipeline, tracks LoRA merge state,
builds CoT prompts, runs generation, and encodes results for transport."""

from __future__ import annotations

import base64
import io
import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from ..data.instructions import build_cot_prompt
from ..configs import GenerationConfig
from ..utils.video_io import load_video_frames, save_video


@dataclass
class VideoCoFController:
    pipeline: Any
    defaults: GenerationConfig = field(default_factory=GenerationConfig)
    # checkpoint name/path the pipeline was loaded from; selects the
    # TeaCache coefficient set by alias the way the reference UI does
    # (`videox_fun/api/api.py:224`)
    model_name: Optional[str] = None
    # LoRA merge-state tracking (`examples/app.py:220-262`)
    _merged_loras: Dict[str, float] = field(default_factory=dict)
    # pipeline's construction-time cfg_sequential (captured lazily); the
    # per-request payload knob resets to this when absent so one request's
    # setting never leaks into the next
    _cfg_seq_default: Optional[bool] = None
    # load_pipeline kwargs the resident Wan pipeline was built with
    # (quantize/high_noise_model/boundary/...). A cross-family switch BACK
    # to Wan rebuilds with these — without them the 14B fp8 deployment
    # (13.83 GiB resident) would reload as ~27 GiB bf16 and OOM the chip.
    wan_load_kwargs: Dict[str, Any] = field(default_factory=dict)
    # quantization INFERRED from the resident Wan params when the server
    # didn't thread an explicit --quantize. Kept separate from
    # wan_load_kwargs so a cross-family switch doesn't silently downgrade a
    # small model (e.g. CogVideoX-2B fits bf16 comfortably); it only
    # applies to Wan round-trips and to families that need it to exist on
    # a 16 GB chip at all (Flux-dev/QwenImage class).
    _inferred_quantize: Optional[str] = None

    # -------------------------------------------------------------- family
    @property
    def family(self) -> str:
        """Which model family the resident pipeline serves: 'wan' (all Wan
        video editors incl. MoE/VACE/S2V/camera) or one of the non-Wan
        families ('cogvideox' / 'flux' / 'qwenimage')."""
        from ..pipeline.image_pipelines import (CogVideoXPipeline,
                                                FluxPipeline,
                                                QwenImagePipeline)
        p = self.pipeline
        if isinstance(p, CogVideoXPipeline):
            return "cogvideox"
        if isinstance(p, FluxPipeline):
            return "flux"
        if isinstance(p, QwenImagePipeline):
            return "qwenimage"
        return "wan"

    # ------------------------------------------------------------- experts
    def _expert_attrs(self):
        """Pipeline attributes holding DiT expert param trees. A Wan2.2 MoE
        pipeline carries a second (high-noise) expert; LoRA merges and
        weight swaps must cover BOTH — high-noise steps would otherwise run
        un-adapted weights (same rule as the factory's load-time merge)."""
        attrs = ["dit_params"]
        if getattr(self.pipeline, "dit_params_2", None) is not None:
            attrs.append("dit_params_2")
        return attrs

    # ---------------------------------------------------------------- LoRA
    def ensure_lora(self, path: Optional[str], multiplier: float = 1.0):
        """Merge/unmerge so that EXACTLY the requested LoRA set is fused:
        a different path (or multiplier) first unmerges what no longer
        belongs, path=None unmerges everything. On a Wan2.2 MoE pipeline the
        merge state is guarded per expert: every merge/unmerge applies to
        both expert trees in lockstep. On fp8-quantized pipelines the LoRA
        is served as RUNTIME adapters (set_runtime_lora) instead of a fused
        delta. Callers that share the pipeline across threads must hold the
        generation lock — this mutates pipeline.dit_params (and
        dit_params_2)."""
        from ..models.lora import merge_lora, unmerge_lora
        want = {path: multiplier} if path else {}
        if self._merged_loras == want:
            return
        if self._params_quantized():
            # fp8-resident weights cannot take a fused delta (merging would
            # re-materialize bf16). Serve the LoRA as RUNTIME adapters
            # instead: the forward fuses each block's delta inside the
            # scanned body (lora.load_runtime_lora / set_runtime_lora).
            # Non-block modules (text/time embedding, head) cannot ride the
            # scanned path; they are skipped with a warning.
            from ..models.lora import load_runtime_lora
            runtime, leftover = (load_runtime_lora(
                list(want.items()), self.pipeline.dit_cfg)
                if want else (None, {}))
            if leftover:
                print(f"[controller] runtime LoRA over fp8: skipping "
                      f"{len(leftover)} non-block module(s): "
                      f"{sorted(leftover)[:4]}...", flush=True)
            self.pipeline.set_runtime_lora(runtime)
            self._merged_loras.clear()
            self._merged_loras.update(want)
            return
        attrs = self._expert_attrs()
        for p, m in list(self._merged_loras.items()):
            if want.get(p) != m:
                for attr in attrs:
                    setattr(self.pipeline, attr, unmerge_lora(
                        getattr(self.pipeline, attr),
                        self.pipeline.dit_cfg, p, m))
                del self._merged_loras[p]
        for p, m in want.items():
            if p not in self._merged_loras:
                for attr in attrs:
                    setattr(self.pipeline, attr, merge_lora(
                        getattr(self.pipeline, attr),
                        self.pipeline.dit_cfg, p, m))
                self._merged_loras[p] = m

    # ---------------------------------------------------------- weight swap
    def update_diffusion_transformer(self, path: Optional[str]) -> None:
        """Hot-swap the DiT weights from a checkpoint path — the reference's
        model-switch endpoint (`videox_fun/api/api.py:23-39` ->
        `Fun_Controller.update_diffusion_transformer`,
        `videox_fun/ui/wan_ui.py:43-147`). ``'none'``/empty is a no-op
        (reference semantics). TPU-side contract: the checkpoint must match
        the resident architecture config, so every compiled executable stays
        valid (shape-identical swap = zero recompiles); fp8-resident params
        are re-quantized on the way in. Clears the LoRA merge state — the
        new checkpoint is pristine. A Wan2.2 dual-expert checkpoint dir
        (low_noise_model/ + high_noise_model/) swaps BOTH experts of a MoE
        pipeline; a single-expert path swaps the base expert only."""
        if not path or path == "none":
            return
        from ..factory import (HIGH_NOISE_SUBPATH, LOW_NOISE_SUBPATH,
                               detect_family, is_wan22_moe_dir)
        target_family = detect_family(path)
        if target_family != "wan" or self.family != "wan":
            # cross-family (or within a non-Wan family) switch: the weight
            # trees are structurally different, so this is a full pipeline
            # rebuild through the factory, not an in-place tree swap
            self._switch_family_pipeline(path, target_family)
            return
        if is_wan22_moe_dir(path):
            # Wan2.2 A14B dual-expert layout: swap BOTH experts. Requires a
            # pipeline that carries a second expert slot (same architecture
            # config — the shape-identity contract extends per expert).
            if getattr(self.pipeline, "dit_params_2", None) is None:
                raise RuntimeError(
                    f"{path} is a Wan2.2 dual-expert checkpoint but the "
                    "resident pipeline has no high-noise expert slot; "
                    "restart with load_pipeline(high_noise_model=...) or "
                    "point at a single-expert checkpoint")
            self._swap_expert("dit_params",
                              os.path.join(path, LOW_NOISE_SUBPATH))
            self._swap_expert("dit_params_2",
                              os.path.join(path, HIGH_NOISE_SUBPATH))
        else:
            # single-expert checkpoint: swaps the base (low-noise) expert;
            # on a MoE pipeline the high-noise expert keeps its weights —
            # unmerge any fused LoRAs FIRST so the surviving expert is left
            # pristine (clearing the tracker while deltas stay fused would
            # corrupt dit_params_2 permanently). Single-expert pipelines
            # skip this: the only tree is replaced wholesale.
            if (self._merged_loras and
                    getattr(self.pipeline, "dit_params_2", None) is not None):
                self.ensure_lora(None)
            self._swap_expert("dit_params", path)
        self._merged_loras.clear()

    def _switch_family_pipeline(self, path: str, target_family: str) -> None:
        """Replace the resident pipeline with one loaded for ``path``'s
        family (Wan included when switching back). Old DiT device buffers
        are released FIRST so peak HBM is one model, not two."""
        import jax

        old = self.pipeline
        if (self.family == "wan" and self._params_quantized()
                and "quantize" not in self.wan_load_kwargs):
            # remember quantization across the family round-trip even when
            # the server didn't thread its load kwargs through — but as
            # INFERRED intent, not an explicit load kwarg
            self._inferred_quantize = "fp8"
        for attr in ("dit_params", "dit_params_2"):
            tree = getattr(old, attr, None)
            if tree is not None:
                setattr(old, attr, None)
                for leaf in jax.tree.leaves(tree):
                    if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                        leaf.delete()
        import jax.numpy as jnp
        dtype = getattr(old, "dtype", None) or jnp.bfloat16
        if target_family == "wan":
            from ..factory import load_pipeline
            kw = dict(self.wan_load_kwargs)
            if "quantize" not in kw and self._inferred_quantize:
                kw["quantize"] = self._inferred_quantize
            self.pipeline = load_pipeline(path, dtype=dtype, **kw)
        else:
            from ..factory import load_family_pipeline
            # the deployment-level quantize intent (--quantize) applies
            # across families: a 12B Flux needs fp8 on a 16 GB chip for
            # exactly the same reason the 14B Wan does. Quantization that
            # was merely INFERRED from the resident Wan params only carries
            # to families that need it to fit at all — CogVideoX-class
            # models fit bf16 and must not be silently downgraded.
            quantize = self.wan_load_kwargs.get("quantize")
            if (quantize is None and self._inferred_quantize
                    and target_family in ("flux", "qwenimage")):
                quantize = self._inferred_quantize
                print(f"[controller] applying inferred quantize="
                      f"{quantize!r} to {target_family} load "
                      f"(no explicit --quantize)", flush=True)
            self.pipeline = load_family_pipeline(
                path, dtype=dtype, family=target_family, quantize=quantize)
        self.model_name = path
        self._merged_loras.clear()
        self._cfg_seq_default = None

    def _swap_expert(self, attr: str, path: str) -> None:
        import jax
        import jax.numpy as jnp
        import ml_dtypes
        from ..models import weights
        sd = weights.load_state_dict(path)
        npdt = (np.dtype(ml_dtypes.bfloat16)
                if self.pipeline.dtype == jnp.bfloat16
                else np.dtype("float32"))
        params = weights.convert_dit_state_dict(
            sd, self.pipeline.dit_cfg, dtype=npdt)
        if self._params_quantized():
            from ..utils.fp8 import quantize_params_fp8
            params = quantize_params_fp8(params)
        # Release the OLD device tree before shipping the new one: holding
        # both would transiently double model HBM, which the 14B fp8
        # deployment (13.83 GiB resident on a 16 GB chip) cannot afford.
        # The controller owns the canonical param tree (LoRA state is about
        # to be cleared), so explicit buffer deletion is safe here.
        old = getattr(self.pipeline, attr)
        setattr(self.pipeline, attr, None)
        if old is not None:
            for leaf in jax.tree.leaves(old):
                if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                    leaf.delete()
            del old
        setattr(self.pipeline, attr, jax.tree.map(jnp.asarray, params))
        jax.block_until_ready(getattr(self.pipeline, attr))

    def _apply_cfg_sequential(self, gen_kwargs: Dict[str, Any]) -> None:
        """Per-request sequential-CFG knob: a pipeline attr, not a __call__
        kwarg (the API serializes generations, so flipping it here is
        race-free). Resets to the pipeline's construction-time value when the
        payload omits the key — one request's setting must not leak into
        later requests."""
        if self._cfg_seq_default is None:
            self._cfg_seq_default = bool(
                getattr(self.pipeline, "cfg_sequential", False))
        self.pipeline.cfg_sequential = bool(
            gen_kwargs.pop("cfg_sequential", self._cfg_seq_default))

    def _resolve_teacache_coefficients(self,
                                       gen_kwargs: Dict[str, Any]) -> None:
        """checkpoint-name alias -> published polynomial set, the reference
        controller's get_teacache_coefficients dispatch."""
        if (gen_kwargs.get("enable_teacache") and self.model_name and
                "teacache_coefficients" not in gen_kwargs):
            from ..models.teacache import get_teacache_coefficients
            coeffs = get_teacache_coefficients(self.model_name)
            if coeffs is not None:
                gen_kwargs["teacache_coefficients"] = coeffs

    def _params_quantized(self) -> bool:
        blocks = self.pipeline.dit_params.get("blocks", {})
        try:
            return "fp8" in blocks["self_attn"]["q"]["kernel"]
        except (KeyError, TypeError):
            return False

    # ------------------------------------------------------------- generate
    def generate(
        self,
        video_path: Optional[str] = None,
        video_array: Optional[np.ndarray] = None,
        prompt: str = "",
        raw_prompt: bool = False,
        source_frames: Optional[int] = None,
        reasoning_frames: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: Optional[int] = None,
        sampler: Optional[str] = None,
        shift: Optional[float] = None,
        negative_prompt: Optional[str] = None,
        **gen_kwargs,
    ) -> Dict[str, Any]:
        d = self.defaults
        source_frames = source_frames or d.source_frames
        if video_array is None:
            if not video_path:
                raise ValueError("provide video_path or video_array")
            video_array, _, _ = load_video_frames(
                video_path, source_frames,
                rng=np.random.default_rng(seed or d.seed))
        full_prompt = prompt if raw_prompt else build_cot_prompt(prompt)
        self._apply_cfg_sequential(gen_kwargs)
        self._resolve_teacache_coefficients(gen_kwargs)
        out = self.pipeline(
            video_array, full_prompt,
            negative_prompt=(negative_prompt if negative_prompt is not None
                             else d.negative_prompt),
            source_frames=source_frames,
            reasoning_frames=(reasoning_frames or d.reasoning_frames),
            num_inference_steps=(num_inference_steps or
                                 d.num_inference_steps),
            guidance_scale=(guidance_scale if guidance_scale is not None
                            else d.guidance_scale),
            shift=(shift or d.shift),
            sampler=(sampler or d.sampler),
            repeat_rope=d.repeat_rope, cot=d.cot,
            seed=(seed if seed is not None else d.seed),
            **gen_kwargs,
        )
        return {"prompt": full_prompt, "videos": out.videos,
                "ground_videos": out.ground_videos,
                "edit_videos": out.edit_videos}

    # ------------------------------------------------------- text-to-video
    def generate_t2v(
        self,
        prompt: str = "",
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: Optional[int] = None,
        sampler: Optional[str] = None,
        shift: Optional[float] = None,
        negative_prompt: Optional[str] = None,
        **gen_kwargs,
    ) -> Dict[str, Any]:
        """Plain text-to-video (no source video): `pipeline.text_to_video`,
        the reference Wan2_2Pipeline generation flow. The prompt is used
        raw — CoT phrasing is an editing-task convention."""
        d = self.defaults
        self._apply_cfg_sequential(gen_kwargs)
        self._resolve_teacache_coefficients(gen_kwargs)
        out = self.pipeline.text_to_video(
            prompt,
            height=height, width=width, num_frames=num_frames,
            negative_prompt=(negative_prompt if negative_prompt is not None
                             else d.negative_prompt),
            num_inference_steps=(num_inference_steps or
                                 d.num_inference_steps),
            guidance_scale=(guidance_scale if guidance_scale is not None
                            else d.guidance_scale),
            shift=(shift or d.shift),
            sampler=(sampler or d.sampler),
            seed=(seed if seed is not None else d.seed),
            **gen_kwargs,
        )
        return {"prompt": prompt, "videos": out.videos,
                "ground_videos": None, "edit_videos": out.edit_videos}

    # -------------------------------------------------- non-Wan families
    def generate_media(
        self,
        text_embeddings: np.ndarray,
        negative_embeddings: Optional[np.ndarray] = None,
        pooled_projections: Optional[np.ndarray] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: Optional[int] = None,
        **gen_kwargs,
    ) -> Dict[str, Any]:
        """Generation for the CogVideoX / Flux / QwenImage pipelines.

        These families take PRECOMPUTED text embeddings (the standard
        serving decomposition — their encoders, T5-XXL / CLIP+T5 /
        Qwen2.5-VL, are out of the reference's scope too; see
        pipeline/image_pipelines.py). Returns {'videos': [B,3,F,H,W]} for
        CogVideoX, {'images': [B,3,H,W] or latents} for the image
        families. Reference intent: the per-family serving UIs at
        `videox_fun/ui/cogvideox_fun_ui.py` (dead in-snapshot)."""
        fam = self.family
        if fam == "wan":
            raise RuntimeError(
                "generate_media serves the CogVideoX/Flux/QwenImage "
                "families; this controller holds a Wan pipeline — use "
                "generate/generate_t2v")
        d = self.defaults
        steps = num_inference_steps or d.num_inference_steps
        seed = seed if seed is not None else d.seed
        if fam == "cogvideox":
            videos = self.pipeline(
                text_embeddings, negative_embeddings,
                num_inference_steps=steps,
                guidance_scale=(guidance_scale
                                if guidance_scale is not None else 6.0),
                seed=seed, **gen_kwargs)
            return {"videos": videos, "images": None}
        if fam == "qwenimage":
            images = self.pipeline(
                text_embeddings, negative_embeddings,
                num_inference_steps=steps,
                true_cfg_scale=(guidance_scale
                                if guidance_scale is not None else 4.0),
                seed=seed, **gen_kwargs)
            return {"videos": None, "images": images}
        images = self.pipeline(   # flux: pooled CLIP projections required
            text_embeddings,
            pooled_projections if pooled_projections is not None
            else np.zeros((np.asarray(text_embeddings).shape[0],
                           self.pipeline.dit_cfg.pooled_projection_dim),
                          np.float32),
            num_inference_steps=steps,
            guidance=(guidance_scale
                      if guidance_scale is not None else 3.5),
            seed=seed, **gen_kwargs)
        return {"videos": None, "images": images}

    # --------------------------------------------------------------- encode
    @staticmethod
    def encode_image_base64(image: np.ndarray) -> str:
        """PNG bytes as base64 for one decoded image ([3, H, W] float in
        [0, 1]); the image-family twin of ``encode_video_base64``."""
        from PIL import Image
        arr = np.asarray(image, np.float32)
        if arr.ndim == 4:
            arr = arr[0]
        arr = np.clip(arr, 0.0, 1.0)
        arr = (arr * 255.0).round().astype(np.uint8).transpose(1, 2, 0)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    @staticmethod
    def encode_array_base64(arr: np.ndarray) -> str:
        """.npy bytes as base64 — the transport for undecoded latents
        (Flux/Qwen pipelines without a resident VAE decoder)."""
        buf = io.BytesIO()
        np.save(buf, np.asarray(arr), allow_pickle=False)
        return base64.b64encode(buf.getvalue()).decode()

    @staticmethod
    def encode_video_base64(video: np.ndarray, fps: int = 16) -> str:
        """mp4 bytes as base64 (the reference API returns base64 mp4 —
        `videox_fun/api/api.py:90-226`)."""
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "out.mp4")
            save_video(video, path, fps=fps)
            if not os.path.exists(path):
                # save_video's last-resort PNG-sequence fallback (no native
                # encoder AND no cv2 mp4 codec) can't satisfy the base64-mp4
                # API contract — fail with the reason, not FileNotFoundError
                raise RuntimeError(
                    "no mp4 encoder available on this host (native libav "
                    "runtime unavailable and cv2 lacks an mp4 codec)")
            with open(path, "rb") as f:
                return base64.b64encode(f.read()).decode()


@dataclass
class VideoCoFClient:
    """Remote-host client mode — the twin of the reference's
    `Fun_Controller_Client.post_to_host` (`videox_fun/ui/controller.py:345-513`):
    the UI/CLI runs here, generation runs on a remote `serving.api` host.
    stdlib-only (urllib); auth token goes in the Authorization header like
    the reference's EAS_TOKEN."""

    url: str                       # e.g. "http://host:8188"
    token: Optional[str] = None
    timeout: float = 300.0

    def post_to_host(self, prompt: str,
                     video_path: Optional[str] = None,
                     video_b64: Optional[str] = None,
                     save_path: Optional[str] = None,
                     **params) -> Dict[str, Any]:
        """POST one generation. ``params`` are forwarded using the reference
        field names (seed_textbox, sample_step_slider, cfg_scale_slider,
        source_frames, reasoning_frames). Returns the response dict with the
        decoded mp4 under ``video_bytes`` (also written to ``save_path``)."""
        import urllib.request
        if video_b64 is None:
            if not video_path:
                raise ValueError("provide video_path or video_b64")
            with open(video_path, "rb") as f:
                video_b64 = base64.b64encode(f.read()).decode()
        payload = {"prompt_textbox": prompt, "source_video": video_b64}
        payload.update(params)
        from .api import ENDPOINT
        req = urllib.request.Request(
            self.url.rstrip("/") + ENDPOINT,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     **({"Authorization": self.token} if self.token else {})},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read())
        if out.get("base64_encoding"):
            out["video_bytes"] = base64.b64decode(out["base64_encoding"])
            if save_path:
                os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
                with open(save_path, "wb") as f:
                    f.write(out["video_bytes"])
        elif save_path:
            # fail fast: the caller asked for a file; don't return an error
            # dict they may never inspect
            raise RuntimeError(f"server returned no video: "
                               f"{out.get('message', out)}")
        return out
