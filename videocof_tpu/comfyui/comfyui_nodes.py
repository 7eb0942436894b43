"""ComfyUI nodes for TPU chain-of-frames video editing.

ComfyUI's node contract is structural: a class with ``INPUT_TYPES`` /
``RETURN_TYPES`` / ``FUNCTION`` / ``CATEGORY`` and the named method. IMAGE
wires carry float [T, H, W, C] tensors in [0, 1] (torch on ComfyUI itself;
numpy accepted here so the nodes run framework-free in tests).

Two nodes mirror the reference CLI surface (`fast_infer.py` /
`inference.py`): a loader that owns the pipeline (cached — ComfyUI
re-executes nodes whose inputs changed) and an editor that runs one CoF
edit. Replaces the reference's dangling ``comfyui.comfyui_nodes`` import
(reference root ``__init__.py:1``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy_thwc(frames: Any) -> np.ndarray:
    """IMAGE wire ([T, H, W, C] float 0..1, torch or numpy) -> numpy."""
    if hasattr(frames, "detach"):          # torch tensor without importing it
        frames = frames.detach().cpu().numpy()
    arr = np.asarray(frames, dtype=np.float32)
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"expected [T, H, W, 3] frames, got {arr.shape}")
    return arr


def _to_image_wire(video01: np.ndarray):
    """pipeline [B, C, T, H, W] float [0,1] -> IMAGE wire [T, H, W, C]
    (torch when available, numpy otherwise)."""
    thwc = np.ascontiguousarray(
        video01[0].transpose(1, 2, 3, 0).astype(np.float32))
    try:
        import torch
        return torch.from_numpy(thwc)
    except Exception:
        return thwc


class VideoCoFModelLoader:
    """Builds (and caches) the pipeline. quantize='fp8' is the 14B-on-16GB
    path (`factory.load_pipeline`)."""

    # single-entry cache: one pipeline's weights can be most of HBM (the
    # fp8 14B is 13.8 GiB of 16), so switching models/quantize must FREE the
    # old pipeline before building the new one, not accumulate
    _cache_key: tuple = ()
    _cache_pipe: Any = None

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_name": ("STRING", {"default": ""}),
            "quantize": (["none", "fp8"],),
            "random_init": ("BOOLEAN", {"default": False}),
        }}

    RETURN_TYPES = ("VIDEOCOF_PIPE",)
    RETURN_NAMES = ("pipeline",)
    FUNCTION = "load"
    CATEGORY = "VideoCoF-TPU"

    def load(self, model_name: str, quantize: str = "none",
             random_init: bool = False):
        cls = type(self)
        key = (model_name, quantize, random_init)
        if cls._cache_key != key or cls._cache_pipe is None:
            cls._cache_pipe = None          # drop the old weights first
            from ..factory import load_pipeline
            cls._cache_pipe = load_pipeline(
                model_name, random_init=random_init,
                quantize=None if quantize == "none" else quantize)
            cls._cache_key = key
        return (cls._cache_pipe,)


class VideoCoFEdit:
    """One chain-of-frames edit: see -> reason -> edit."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipeline": ("VIDEOCOF_PIPE",),
            "frames": ("IMAGE",),
            "prompt": ("STRING", {"multiline": True, "default": ""}),
            "steps": ("INT", {"default": 4, "min": 1, "max": 100}),
            "guidance_scale": ("FLOAT", {"default": 1.0, "min": 0.0,
                                         "max": 20.0}),
            "seed": ("INT", {"default": 42}),
            "reasoning_frames": ("INT", {"default": 4, "min": 1, "max": 16}),
        }, "optional": {
            "return_reasoning": ("BOOLEAN", {"default": False}),
        }}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("frames",)
    FUNCTION = "edit"
    CATEGORY = "VideoCoF-TPU"

    def edit(self, pipeline, frames, prompt: str, steps: int = 4,
             guidance_scale: float = 1.0, seed: int = 42,
             reasoning_frames: int = 4,
             return_reasoning: bool = False) -> Tuple[Any]:
        from ..data.instructions import build_cot_prompt
        thwc = _to_numpy_thwc(frames)
        video = thwc.transpose(3, 0, 1, 2)[None] * 2.0 - 1.0  # [1,C,T,H,W]
        out = pipeline(
            video, build_cot_prompt(prompt),
            source_frames=thwc.shape[0],
            reasoning_frames=reasoning_frames,
            num_inference_steps=steps, guidance_scale=guidance_scale,
            seed=seed, repeat_rope=True, cot=True)
        result = out.videos if return_reasoning else out.edit_videos
        return (_to_image_wire(result),)


NODE_CLASS_MAPPINGS = {
    "VideoCoFModelLoader": VideoCoFModelLoader,
    "VideoCoFEdit": VideoCoFEdit,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "VideoCoFModelLoader": "VideoCoF-TPU Model Loader",
    "VideoCoFEdit": "VideoCoF-TPU Edit (see-reason-edit)",
}
