#!/usr/bin/env bash
# Object-addition examples (task twin of reference scripts/obj_add.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
scripts/edit_task.sh assets/road.mp4 \
  "Add a red sports car driving on the road." \
  results/obj_add_1 "${MODEL_NAME:-models/Wan2.1-T2V-14B}"
