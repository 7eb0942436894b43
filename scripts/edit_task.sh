#!/usr/bin/env bash
# Generic single-task CoF edit (TPU twin of the reference's per-task scripts:
# 33 source frames + 4 reasoning frames, 4-step FusionX fast path).
#
# Usage: scripts/edit_task.sh <video> <prompt> <output_dir> [model_dir]
set -euo pipefail
VIDEO=${1:?video path}
PROMPT=${2:?edit prompt}
OUT=${3:?output dir}
MODEL=${4:-models/Wan2.1-T2V-14B}

python -m videocof_tpu.cli.fast_infer \
  --video_path "$VIDEO" \
  --prompt "$PROMPT" \
  --output_dir "$OUT" \
  --model_name "$MODEL" \
  --videocof_path videocof_weight/videocof.safetensors \
  --enable_acceleration_lora \
  --acceleration_lora_path videocof_weight/Wan2.1_Text_to_Video_14B_FusionX_LoRA.safetensors \
  --num_frames 33 \
  --source_frames 33 \
  --reasoning_frames 4 \
  --repeat_rope
