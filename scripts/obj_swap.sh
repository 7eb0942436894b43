#!/usr/bin/env bash
# Object-swap examples (task twin of reference scripts/obj_swap.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
scripts/edit_task.sh assets/cat.mp4 \
  "Replace the cat with a golden retriever puppy." \
  results/obj_swap_1 "${MODEL_NAME:-models/Wan2.1-T2V-14B}"
