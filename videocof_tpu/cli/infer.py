"""Standard 50-step VideoCoF inference CLI — twin of reference `inference.py`
(50 steps, UniPC shift 3, CFG guidance 5.0, TeaCache on by default —
`inference.py:99-126`).
"""

from __future__ import annotations

import argparse
import sys

from ._common import (add_common_args, build_pipeline_from_args,
                      collect_items, run_items, shard_pending)
from ..configs import GenerationConfig

NUM_INFERENCE_STEPS = 50
GUIDANCE_SCALE = 5.0
NEGATIVE_PROMPT = GenerationConfig().negative_prompt


def parse_args():
    p = argparse.ArgumentParser(
        description="Standard 50-step VideoCoF inference")
    add_common_args(p)
    p.add_argument("--num_inference_steps", type=int,
                   default=NUM_INFERENCE_STEPS)
    p.add_argument("--guidance_scale", type=float, default=GUIDANCE_SCALE)
    p.add_argument("--enable_teacache", action="store_true", default=True)
    p.add_argument("--disable_teacache", dest="enable_teacache",
                   action="store_false")
    p.add_argument("--teacache_threshold", type=float, default=0.10)
    p.add_argument("--num_skip_start_steps", type=int, default=5)
    p.add_argument("--cfg_skip_ratio", type=float, default=0.0)
    return p.parse_args()


def main():
    args = parse_args()
    items = collect_items(args)
    subset, rank, world = shard_pending(items, args.output_dir)
    print(f"[proc {rank}/{world}] {len(subset)} pending items",
          file=sys.stderr)
    if not subset:
        return

    pipe = build_pipeline_from_args(
        args, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale)
    gen_kwargs = {}
    if args.enable_teacache:
        from ..models.teacache import get_teacache_coefficients
        coeffs = get_teacache_coefficients(args.model_name or "wan2.1-t2v-14b")
        if coeffs:
            gen_kwargs.update(
                enable_teacache=True,
                teacache_threshold=args.teacache_threshold,
                teacache_skip_start_steps=args.num_skip_start_steps,
                teacache_coefficients=coeffs)
    if args.cfg_skip_ratio:
        gen_kwargs["cfg_skip_ratio"] = args.cfg_skip_ratio

    run_items(pipe, args, subset, rank,
              num_inference_steps=args.num_inference_steps,
              guidance_scale=args.guidance_scale,
              negative_prompt=NEGATIVE_PROMPT,
              gen_kwargs=gen_kwargs)


if __name__ == "__main__":
    main()
