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
    "three_people.mp4": (64, 48),
    "office.mp4": (64, 48),
    "woman_ballon.mp4": (64, 48),
    "greenhouse.mp4": (64, 48),
    "gameplay.mp4": (64, 48),
    "dog.mp4": (64, 48),
    "sign.mp4": (64, 48),
    "old_man.mp4": (64, 48),
    "pants.mp4": (64, 48),
    "bowl.mp4": (64, 48),
    "ketchup.mp4": (64, 48),
    "fruit.mp4": (64, 48),
}

# The reference's full 13-item eval list (assets/teaser_test.json:
# obj_rem x3, obj_add x4, obj_swap x3, local_style x3), instructions
# verbatim, clip names mapped onto synthetic moving-shape videos.
TASKS = [
    {"task_type": "obj_rem", "sample_id": "001", "video": "two_man.mp4",
     "edit_instruction": "Remove the young man with short black hair "
                         "wearing black shirt on the left."},
    {"task_type": "obj_rem", "sample_id": "002", "video": "three_people.mp4",
     "edit_instruction": "Remove the man with short dark hair wearing a "
                         "gray suit on the right"},
    {"task_type": "obj_rem", "sample_id": "003", "video": "office.mp4",
     "edit_instruction": "Remove the beige CRT computer setup."},
    {"task_type": "obj_add", "sample_id": "001", "video": "woman_ballon.mp4",
     "edit_instruction": "Add the woman in a floral dress pointing at the "
                         "balloon on the left."},
    {"task_type": "obj_add", "sample_id": "002", "video": "greenhouse.mp4",
     "edit_instruction": "A white Samoyed is watching the man, who crouches "
                         "in a greenhouse. The Samoyed is covered in thick, "
                         "fluffy white fur, giving it a very soft and plush "
                         "appearance. Its ears are erect and triangular, "
                         "making it look alert and intelligent. The "
                         "Samoyed's face features its signature smile, with "
                         "bright black eyes that convey friendliness and "
                         "curiosity."},
    {"task_type": "obj_add", "sample_id": "003", "video": "gameplay.mp4",
     "edit_instruction": "Add the woman holding the blue game controller "
                         "to the left of the man, engaged in gameplay."},
    {"task_type": "obj_add", "sample_id": "004", "video": "dog.mp4",
     "edit_instruction": "Add the brown and white beagle interacting with "
                         "and drinking from the metallic bowl on the "
                         "wooden floor."},
    {"task_type": "obj_swap", "sample_id": "001", "video": "sign.mp4",
     "edit_instruction": "Replace the yellow \"SCHOOL\" sign with a red "
                         "hospital sign, featuring a white hospital emblem "
                         "on the top and the word \"HOSPITAL\" below."},
    {"task_type": "obj_swap", "sample_id": "002", "video": "old_man.mp4",
     "edit_instruction": "Swap the old man with long white hair and a blue "
                         "checkered shirt at the left side of the frame "
                         "with a woman with curly brown hair and a denim "
                         "shirt."},
    {"task_type": "obj_swap", "sample_id": "003", "video": "pants.mp4",
     "edit_instruction": "swap the white pants worn by the individual the "
                         "light blue jeans."},
    {"task_type": "local_style", "sample_id": "001", "video": "bowl.mp4",
     "edit_instruction": "Make the largest cup on the right white and "
                         "smooth."},
    {"task_type": "local_style", "sample_id": "002", "video": "ketchup.mp4",
     "edit_instruction": "Make the ketchup bottle to the right of the BBQ "
                         "sauce bottle violet color."},
    {"task_type": "local_style", "sample_id": "003", "video": "fruit.mp4",
     "edit_instruction": "Make the pomegranate at the right side of the "
                         "basket lavender color."},
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
