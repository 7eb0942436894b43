#!/usr/bin/env bash
# Object-removal examples (task twin of reference scripts/obj_rem.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
scripts/edit_task.sh assets/two_man.mp4 \
  "Remove the young man with short black hair wearing black shirt on the left." \
  results/obj_rem_1 "${MODEL_NAME:-models/Wan2.1-T2V-14B}"
scripts/edit_task.sh assets/office.mp4 \
  "Remove the beige CRT computer setup." \
  results/obj_rem_3 "${MODEL_NAME:-models/Wan2.1-T2V-14B}"
