"""Chain-of-frames triplet dataset (training side).

Behavioural rebuild of the reference `ImageVideoCoTDataset`
(`dataset_image_video.py:1161-1650`), the VideoCoF-50k loader: JSON items
``{original_video, grounded_video, edited_video, edit_instruction}``;
``source_frames`` source indices sampled by linspace, grounding frames taken
from the grounded video at the first ``reasoning_frames`` source indices,
edited frames at the same source indices; all three streams resize+center-crop
aligned; the CoT prompt built from the instruction (with the derived grounding
phrase) and a 10% text drop; infinite-retry ``__getitem__`` that resamples a
random index on error.

Framework-free: returns numpy dicts; wrap in any loader. The pixel layout
[src | ground | tgt] matches the pipeline's CoT latent layout.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from .buckets import resize_center_crop
from .instructions import build_cot_prompt


def _read_frames_at(path: str, indices: List[int]) -> np.ndarray:
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    frames = []
    for idx in indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ok, frame = cap.read()
        if not ok:
            raise ValueError(f"decode failed at frame {idx} of {path}")
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames)


def _frame_count(path: str) -> int:
    import cv2
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


class CoTTripletDataset:
    def __init__(
        self,
        json_path: str,
        data_root: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        source_frames: int = 33,
        target_frames: int = 33,
        reasoning_frames: int = 4,
        text_drop_ratio: float = 0.1,
        seed: int = 0,
        max_retries: int = 100,
    ):
        with open(json_path, encoding="utf-8") as f:
            self.items = json.load(f)
        self.data_root = data_root
        self.height, self.width = height, width
        self.source_frames = source_frames
        self.target_frames = target_frames
        self.reasoning_frames = reasoning_frames
        self.text_drop_ratio = text_drop_ratio
        self.rng = np.random.default_rng(seed)
        self.max_retries = max_retries

    def __len__(self) -> int:
        return len(self.items)

    def _path(self, p: str) -> str:
        return os.path.join(self.data_root, p) if self.data_root else p

    def _load_one(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.items[idx]
        src_path = self._path(item.get("original_video",
                                       item.get("source_video_path", "")))
        grd_path = self._path(item.get("grounded_video", src_path))
        edt_path = self._path(item.get("edited_video", src_path))
        instruction = item.get("edit_instruction", item.get("text", ""))

        total = _frame_count(src_path)
        if total < 1:
            raise ValueError(f"empty video {src_path}")
        src_idx = np.linspace(0, total - 1, self.source_frames).astype(int)
        tgt_total = _frame_count(edt_path)
        tgt_idx = np.linspace(0, tgt_total - 1, self.target_frames).astype(int)
        # grounding frames: grounded video at the first source indices
        grd_total = _frame_count(grd_path)
        grd_idx = np.clip(src_idx[: self.reasoning_frames], 0, grd_total - 1)

        def prep(path, indices):
            arr = _read_frames_at(path, list(indices))
            arr = resize_center_crop(arr, self.height, self.width)
            out = arr.transpose(3, 0, 1, 2).astype(np.float32)
            return out * (2.0 / 255.0) - 1.0          # [C, T, H, W] in [-1,1]

        text = build_cot_prompt(instruction)
        if self.rng.random() < self.text_drop_ratio:
            text = ""

        return {
            "pixel_src": prep(src_path, src_idx),
            "pixel_ground": prep(grd_path, grd_idx),
            "pixel_tgt": prep(edt_path, tgt_idx),
            "text": text,
            "edit_instruction": instruction,
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        for _ in range(self.max_retries):
            try:
                return self._load_one(idx)
            except Exception:
                idx = int(self.rng.integers(0, len(self.items)))
        raise RuntimeError("dataset: too many consecutive load failures")

    def cot_pixels(self, sample: Dict[str, np.ndarray]) -> np.ndarray:
        """[src | ground | tgt] concat along time — the training-side pixel
        analogue of the CoT latent layout."""
        return np.concatenate([sample["pixel_src"], sample["pixel_ground"],
                               sample["pixel_tgt"]], axis=1)
