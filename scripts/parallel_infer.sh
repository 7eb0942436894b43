#!/usr/bin/env bash
# Batch inference over a task JSON with per-process item sharding (twin of
# reference scripts/parallel_infer.sh, which used torchrun --nproc_per_node=4).
# On a TPU pod each host runs this same command; items shard automatically by
# jax process index. Single-host multi-chip: run one process per chip with
# TPU_VISIBLE_DEVICES + PROCESS_ID/NUM_PROCESSES env.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m videocof_tpu.cli.fast_infer \
  --test_json assets/teaser_test.json \
  --output_dir results/teaser \
  --model_name "${MODEL_NAME:-models/Wan2.1-T2V-14B}" \
  --videocof_path videocof_weight/videocof.safetensors \
  --enable_acceleration_lora \
  --num_frames 33 --source_frames 33 --reasoning_frames 4 --repeat_rope
