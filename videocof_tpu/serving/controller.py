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
    # LoRA merge-state tracking (`examples/app.py:220-262`)
    _merged_loras: Dict[str, float] = field(default_factory=dict)

    # ---------------------------------------------------------------- LoRA
    def ensure_lora(self, path: Optional[str], multiplier: float = 1.0):
        """Merge/unmerge so that EXACTLY the requested LoRA set is fused:
        a different path (or multiplier) first unmerges what no longer
        belongs, path=None unmerges everything. Callers that share the
        pipeline across threads must hold the generation lock — this
        mutates pipeline.dit_params."""
        from ..models.lora import merge_lora, unmerge_lora
        want = {path: multiplier} if path else {}
        if self._merged_loras == want:
            return
        if want and self._params_quantized():
            raise RuntimeError(
                "cannot merge a LoRA into fp8-quantized weights at serve "
                "time; fuse it at load time via "
                "load_pipeline(lora_paths=[(path, mult)], quantize='fp8')")
        for p, m in list(self._merged_loras.items()):
            if want.get(p) != m:
                self.pipeline.dit_params = unmerge_lora(
                    self.pipeline.dit_params, self.pipeline.dit_cfg, p, m)
                del self._merged_loras[p]
        for p, m in want.items():
            if p not in self._merged_loras:
                self.pipeline.dit_params = merge_lora(
                    self.pipeline.dit_params, self.pipeline.dit_cfg, p, m)
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
        new checkpoint is pristine."""
        if not path or path == "none":
            return
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
        old = self.pipeline.dit_params
        self.pipeline.dit_params = None
        if old is not None:
            for leaf in jax.tree.leaves(old):
                if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                    leaf.delete()
            del old
        self.pipeline.dit_params = jax.tree.map(jnp.asarray, params)
        jax.block_until_ready(self.pipeline.dit_params)
        self._merged_loras.clear()

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

    # --------------------------------------------------------------- encode
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
