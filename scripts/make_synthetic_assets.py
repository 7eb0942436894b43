"""Generate synthetic demo assets so the task scripts and the batch runner
work out of the box in weight-free environments (the reference's
`assets/teaser_test.json` references real clips not shipped here).

Creates assets/*.mp4 (moving-shapes clips) and assets/teaser_test.json with
the same schema the reference batch runner consumes
(`fast_infer.py:232-243`: task_type/sample_id/source_video_path/
edit_instruction).
"""

import json
import os
import sys

import numpy as np

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")

CLIPS = {
    "two_man.mp4": (64, 48),
    "office.mp4": (64, 48),
    "road.mp4": (64, 48),
    "cat.mp4": (64, 48),
    "house.mp4": (64, 48),
}

TASKS = [
    {"task_type": "obj_rem", "sample_id": "001", "video": "two_man.mp4",
     "edit_instruction": "Remove the man on the left."},
    {"task_type": "obj_rem", "sample_id": "002", "video": "office.mp4",
     "edit_instruction": "Remove the beige computer."},
    {"task_type": "obj_add", "sample_id": "001", "video": "road.mp4",
     "edit_instruction": "Add a red sports car driving on the road."},
    {"task_type": "obj_swap", "sample_id": "001", "video": "cat.mp4",
     "edit_instruction": "Replace the cat with a golden retriever puppy."},
    {"task_type": "local_style", "sample_id": "001", "video": "house.mp4",
     "edit_instruction": "Change the house walls to weathered red brick."},
]


def make_clip(path: str, w: int, h: int, seed: int, frames: int = 40):
    import cv2
    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (w, h))
    color = tuple(int(c) for c in rng.integers(60, 255, 3))
    x, y = rng.integers(5, w - 15), rng.integers(5, h - 15)
    dx, dy = rng.choice([-2, 2]), rng.choice([-1, 1])
    for _ in range(frames):
        frame = np.full((h, w, 3), 32, np.uint8)
        cv2.rectangle(frame, (int(x), int(y)), (int(x) + 10, int(y) + 10),
                      color, -1)
        writer.write(frame)
        x = (x + dx) % (w - 12)
        y = (y + dy) % (h - 12)
    writer.release()


def main():
    os.makedirs(ASSETS, exist_ok=True)
    for i, (name, (w, h)) in enumerate(CLIPS.items()):
        p = os.path.join(ASSETS, name)
        if not os.path.exists(p):
            make_clip(p, w, h, seed=i)
            print("wrote", p, file=sys.stderr)
    items = []
    for t in TASKS:
        items.append({
            "task_type": t["task_type"],
            "sample_id": t["sample_id"],
            "source_video_path": os.path.join(ASSETS, t["video"]),
            "edit_instruction": t["edit_instruction"],
        })
    jp = os.path.join(ASSETS, "teaser_test.json")
    with open(jp, "w") as f:
        json.dump(items, f, indent=2)
    print("wrote", jp, file=sys.stderr)


if __name__ == "__main__":
    main()
