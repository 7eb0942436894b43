"""Shared CLI machinery for the inference entry points.

Mirrors the reference CLI behaviour (`fast_infer.py:214-456`,
`inference.py`): task-JSON or single-video mode, resume by skipping existing
outputs, data-parallel item sharding across processes
(`pending_items[rank::world_size]`), CoT prompt construction, and the
reason+edit / edit-only / side-by-side output triple with an `_info.txt`
prompt record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

from ..data.instructions import build_cot_prompt
from ..utils.video_io import (load_video_frames, save_results,
                              save_side_by_side)


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--test_json", type=str, default=None,
                        help="Path to test JSON for batch inference")
    parser.add_argument("--prompt", type=str, default=None)
    parser.add_argument("--video_path", type=str, default=None)
    parser.add_argument("--model_name", type=str, default=None,
                        help="Checkpoint dir (omit with --random_init)")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--videocof_path", type=str, default=None,
                        help="VideoCoF LoRA checkpoint")
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--lora_weight", type=float, default=1.0)
    parser.add_argument("--num_frames", type=int, default=65)
    parser.add_argument("--source_frames", type=int, default=33)
    parser.add_argument("--reasoning_frames", type=int, default=4)
    parser.add_argument("--repeat_rope", action="store_true")
    parser.add_argument("--sampler", type=str, default="unipc",
                        choices=["unipc", "euler", "dpm++"])
    parser.add_argument("--shift", type=float, default=3.0)
    parser.add_argument("--solver_order", type=int, default=None,
                        choices=(1, 2, 3),
                        help="UniPC/DPM++ multistep order (reference caps at "
                             "3; default 2)")
    parser.add_argument("--start_image", type=str, default=None,
                        help="image-to-video: animate this image (needs an "
                             "i2v DiT checkpoint; --num_frames sets length)")
    parser.add_argument("--end_image", type=str, default=None,
                        help="optional last-frame pin for --start_image")
    parser.add_argument("--t2v", action="store_true",
                        help="plain text-to-video from --prompt (no source "
                             "video; the Wan2.2 pipeline's generation flow; "
                             "--num_frames/--height/--width set the shape)")
    parser.add_argument("--control_video", type=str, default=None,
                        help="VACE control-to-video: generate --prompt under "
                             "this control clip (depth/pose/scribble or "
                             "masked video; needs a VACE checkpoint)")
    parser.add_argument("--control_mask", type=str, default=None,
                        help="optional region-mask clip for --control_video "
                             "(bright = generate; omitted = full generation "
                             "under control)")
    parser.add_argument("--vace_scale", type=float, default=1.0,
                        help="control-hint strength (context_scale)")
    parser.add_argument("--cfg_sequential", action="store_true",
                        help="run CFG as two batch-1 dispatches instead of "
                             "a batch-2 step: halves the step's activation "
                             "HBM (lets 50-step CFG run beside fp8-resident "
                             "14B weights on a 16 GB chip) at ~no cost on "
                             "compute-bound geometries")
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=832)
    parser.add_argument("--guidance_scale_2", type=float, default=None,
                        help="high-noise-expert guidance on a Wan2.2 MoE "
                             "checkpoint (defaults to --guidance_scale)")
    parser.add_argument("--fps", type=int, default=10)
    parser.add_argument("--random_init", action="store_true",
                        help="Random weights (weight-free smoke runs)")
    parser.add_argument("--attention", type=str, default=None,
                        choices=[None, "pallas", "xla", "naive"])
    parser.add_argument("--quantize", type=str, default=None,
                        choices=[None, "fp8"],
                        help="fp8 DiT weight storage (14B fits 16 GB; the "
                             "TPU replacement for sequential CPU offload)")
    parser.add_argument("--offload_t5", action="store_true",
                        help="Keep umT5 weights host-resident; stream to "
                             "device per encode call")
    parser.add_argument("--precompile_hw", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="AOT-compile the fused denoise executable for "
                             "this resolution BEFORE weights ship, landing "
                             "them in its input formats (required for the "
                             "14B fp8 on a 16 GB chip)")


def collect_items(args) -> List[Tuple[str, Dict]]:
    if args.test_json:
        with open(args.test_json, encoding="utf-8") as f:
            entries = json.load(f)
        items = []
        for i, item in enumerate(entries):
            if "task_type" in item and "sample_id" in item:
                fname = f"{item['task_type']}_{item['sample_id']}.mp4"
            else:
                fname = f"sample_{i}.mp4"
            items.append((fname, item))
        return items
    if args.video_path and args.prompt:
        return [(os.path.basename(args.video_path),
                 {"source_video_path": args.video_path,
                  "edit_instruction": args.prompt})]
    if getattr(args, "start_image", None) and args.prompt:
        return [(os.path.basename(args.start_image),
                 {"start_image_path": args.start_image,
                  "end_image_path": getattr(args, "end_image", None),
                  "edit_instruction": args.prompt})]
    if getattr(args, "control_video", None) and args.prompt:
        return [(os.path.basename(args.control_video),
                 {"control_video_path": args.control_video,
                  "control_mask_path": getattr(args, "control_mask", None),
                  "edit_instruction": args.prompt})]
    if getattr(args, "t2v", False) and args.prompt:
        slug = "".join(c if c.isalnum() else "_"
                       for c in args.prompt.lower())[:48] or "t2v"
        return [(f"{slug}.mp4", {"t2v": True,
                                 "edit_instruction": args.prompt})]
    raise SystemExit("provide --test_json, --video_path/--start_image/"
                     "--control_video plus --prompt, or --t2v --prompt")


def shard_pending(items, output_dir: str):
    """Resume + DP sharding: drop finished outputs, stride over processes."""
    import jax
    pending = []
    for fname, item in items:
        base = os.path.splitext(fname)[0]
        if not os.path.exists(os.path.join(output_dir, f"gen_{base}.mp4")):
            pending.append((fname, item))
    rank, world = jax.process_index(), jax.process_count()
    return pending[rank::world], rank, world


def item_prompt(item: Dict) -> str:
    edit_text = item.get("text", item.get("qwen_vl_72b_refined_instruction",
                                          item.get("edit_instruction", "")))
    return build_cot_prompt(edit_text), edit_text


def run_items(pipe, args, subset, rank: int, *, num_inference_steps: int,
              guidance_scale: float, negative_prompt: str,
              gen_kwargs=None) -> None:
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed + rank)
    for fname, item in subset:
        base = os.path.splitext(fname)[0]
        out_path = os.path.join(args.output_dir, f"gen_{base}.mp4")
        if item.get("t2v"):
            # text-to-video (--t2v): the reference Wan2_2Pipeline flow
            prompt = item.get("edit_instruction", "")
            print(f"[proc {rank}] t2v {fname}: {prompt}", file=sys.stderr)
            t2v_kw = {}
            if (getattr(args, "guidance_scale_2", None) is not None
                    and getattr(pipe, "dit_params_2", None) is not None):
                t2v_kw["guidance_scale_2"] = args.guidance_scale_2
            out = pipe.text_to_video(
                prompt, height=args.height, width=args.width,
                num_frames=args.num_frames,
                negative_prompt=negative_prompt,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, shift=args.shift,
                sampler=args.sampler,
                solver_order=getattr(args, "solver_order", None),
                seed=args.seed + rank, **t2v_kw)
            save_results(out.videos, out_path, args.fps)
            with open(os.path.join(args.output_dir, f"gen_{base}_info.txt"),
                      "w", encoding="utf-8") as f:
                f.write(prompt)
            print(f"[proc {rank}] wrote {out_path}", file=sys.stderr)
            continue

        if item.get("control_video_path"):
            # VACE control-to-video (--control_video): needs the factory to
            # have detected a VACE checkpoint (pipeline/vace_pipeline.py)
            from ..pipeline import VacePipeline
            if not isinstance(pipe, VacePipeline):
                raise SystemExit(
                    "--control_video needs a VACE checkpoint (the factory "
                    "auto-detects vace_* keys in the DiT state dict)")
            prompt = item.get("edit_instruction", "")
            print(f"[proc {rank}] vace {fname}: {prompt}", file=sys.stderr)
            # fixed rng: the mask clip must sample the SAME frame indices
            # as the control clip
            ctrl, _, _ = load_video_frames(item["control_video_path"],
                                           args.num_frames,
                                           rng=np.random.default_rng(0))
            mask = None
            if item.get("control_mask_path"):
                m, _, _ = load_video_frames(item["control_mask_path"],
                                            args.num_frames,
                                            rng=np.random.default_rng(0))
                # RGB -> {0,1} single channel (bright = generate); mid-gray
                # threshold in whichever range the loader returned
                thresh = 127.5 if m.dtype == np.uint8 else 0.0
                mask = (m.mean(axis=1, keepdims=True) > thresh
                        ).astype(np.float32)
            out = pipe.control_to_video(
                prompt, ctrl, mask=mask,
                negative_prompt=negative_prompt,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                context_scale=getattr(args, "vace_scale", 1.0),
                shift=args.shift, sampler=args.sampler,
                solver_order=getattr(args, "solver_order", None),
                seed=args.seed + rank)
            save_results(out.videos, out_path, args.fps)
            with open(os.path.join(args.output_dir, f"gen_{base}_info.txt"),
                      "w", encoding="utf-8") as f:
                f.write(prompt)
            print(f"[proc {rank}] wrote {out_path}", file=sys.stderr)
            continue

        if item.get("start_image_path"):
            # image-to-video path (--start_image): plain prompt, i2v DiT
            prompt = item.get("edit_instruction", "")
            print(f"[proc {rank}] i2v {fname}: {prompt}", file=sys.stderr)
            from PIL import Image
            from ..utils.video_io import size_from_base_resolution
            with Image.open(item["start_image_path"]) as im:
                w0, h0 = im.size
            # generation size: the image's aspect ratio at the AREA the
            # --height/--width flags budget (the reference controllers' AR-
            # aware sizing rule) — a raw 4032x3024 photo must not dictate a
            # ~190k-token generation
            base = int(round((args.height * args.width) ** 0.5))
            h0, w0 = size_from_base_resolution(h0, w0, base)
            h0, w0 = (h0 // 16) * 16, (w0 // 16) * 16  # patch/VAE-aligned
            out = pipe.image_to_video(
                item["start_image_path"], prompt,
                end_image=item.get("end_image_path"),
                num_frames=args.num_frames, height=h0, width=w0,
                negative_prompt=negative_prompt,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, shift=args.shift,
                sampler=args.sampler,
                solver_order=getattr(args, "solver_order", None),
                seed=args.seed + rank)
            save_results(out.videos, out_path, args.fps)
            with open(os.path.join(args.output_dir, f"gen_{base}_info.txt"),
                      "w", encoding="utf-8") as f:
                f.write(prompt)
            print(f"[proc {rank}] wrote {out_path}", file=sys.stderr)
            continue

        prompt, _ = item_prompt(item)
        print(f"[proc {rank}] {fname}: {prompt}", file=sys.stderr)

        # codec-native I420 upload (half the u8 RGB bytes, chroma upsampled
        # on device) on transports below the same threshold the decode-side
        # fetch uses; VIDEOCOF_UPLOAD_YUV420=1/0 overrides
        from ..utils import transport
        env_up = os.environ.get("VIDEOCOF_UPLOAD_YUV420")
        use_i420 = (env_up == "1" if env_up is not None
                    else transport.should_fetch_yuv420())
        video, h, w = load_video_frames(
            item["source_video_path"], args.source_frames, rng=rng,
            dtype="i420" if use_i420 else "uint8")
        out = pipe(video, prompt,
                   negative_prompt=negative_prompt,
                   source_frames=args.source_frames,
                   reasoning_frames=args.reasoning_frames,
                   num_inference_steps=num_inference_steps,
                   guidance_scale=guidance_scale,
                   shift=args.shift, sampler=args.sampler,
                   solver_order=getattr(args, "solver_order", None),
                   repeat_rope=args.repeat_rope, cot=True,
                   seed=args.seed + rank, **(gen_kwargs or {}))

        save_results(out.videos, os.path.join(
            args.output_dir, f"gen_{base}_reason_edit.mp4"), args.fps)
        edit = out.videos[:, :, -args.source_frames:]
        save_results(edit, out_path, args.fps)
        if video.ndim == 4:  # I420 planes -> RGB01 for the comparison strip
            from ..utils.colorspace import i420_to_rgb01
            video = i420_to_rgb01(video)
        save_side_by_side(video, edit, os.path.join(
            args.output_dir, f"gen_{base}_compare.mp4"), args.fps)
        with open(os.path.join(args.output_dir, f"gen_{base}_info.txt"),
                  "w", encoding="utf-8") as f:
            f.write(prompt)
        print(f"[proc {rank}] wrote {out_path}", file=sys.stderr)


def build_pipeline_from_args(args, dtype=None, num_inference_steps=4,
                             guidance_scale=1.0):
    import jax.numpy as jnp
    from ..factory import load_pipeline

    dtype = dtype or jnp.bfloat16
    precompile = None
    if getattr(args, "precompile_hw", None):
        h, w = args.precompile_hw
        precompile = dict(height=h, width=w,
                          source_frames=args.source_frames,
                          reasoning_frames=args.reasoning_frames,
                          num_inference_steps=num_inference_steps,
                          guidance_scale=guidance_scale, shift=args.shift,
                          sampler=args.sampler, cot=True)
    loras = []
    for path, mult in ((getattr(args, "acceleration_lora", None), 1.0),
                      (args.lora_path, args.lora_weight),
                      (args.videocof_path, args.lora_weight)):
        if path:
            if os.path.exists(path):
                loras.append((path, mult))
            else:
                print(f"warning: LoRA not found: {path}", file=sys.stderr)
    # LoRA fusion runs inside the factory, host-side, BEFORE fp8
    # quantization (merging into quantized weights is impossible)
    pipe = load_pipeline(args.model_name or "", dtype=dtype,
                         random_init=args.random_init,
                         attn_backend=args.attention,
                         seed=args.seed,
                         quantize=getattr(args, "quantize", None),
                         offload_t5=getattr(args, "offload_t5", False),
                         lora_paths=loras, precompile=precompile)
    for path, _ in loras:
        print(f"merged LoRA: {path}", file=sys.stderr)
    if getattr(args, "cfg_sequential", False):
        pipe.cfg_sequential = True
    return pipe
