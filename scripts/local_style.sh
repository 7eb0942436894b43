#!/usr/bin/env bash
# Local style-transfer examples (task twin of reference scripts/local_style.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
scripts/edit_task.sh assets/house.mp4 \
  "Change the house walls to weathered red brick." \
  results/local_style_1 "${MODEL_NAME:-models/Wan2.1-T2V-14B}"
