"""Host-side video I/O.

The reference decodes with imageio/ffmpeg/decord (`fast_infer.py:43-92`,
`videox_fun/utils/utils.py:59-143`); this environment ships OpenCV, so cv2 is
the codec path with a PNG-sequence fallback. Decode stays on the host CPU (as
in the reference — SURVEY.md §2.9); normalization to [-1, 1] matches
`fast_infer.py:90-92`.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def load_video_frames(video_path: str, source_frames: int,
                      rng: Optional[np.random.Generator] = None
                      ) -> Tuple[np.ndarray, int, int]:
    """-> (video [1, 3, T, H, W] float32 in [-1, 1], height, width).

    Stride-samples ``source_frames`` frames like the reference
    (`fast_infer.py:43-92`): stride = total // source_frames, random start,
    repeat the last frame if the clip runs short. Decode runs through the
    native C++ runtime (single sequential stream walk) when built, else cv2.
    """
    from ..runtime import decode_frames, video_info
    total, h, w, _fps = video_info(video_path)
    if total < 1:
        raise ValueError(f"no frames in {video_path}")
    stride = max(1, total // source_frames)
    hi = max(1, total - stride * source_frames)
    rng = rng or np.random.default_rng(0)
    start = int(rng.integers(0, hi))
    idx = [min(start + i * stride, total - 1) for i in range(source_frames)]
    arr = decode_frames(video_path, idx, h, w)    # [T, 3, H, W] in [-1, 1]
    return arr.transpose(1, 0, 2, 3)[None], h, w


def save_video(video: np.ndarray, path: str, fps: int = 16) -> None:
    """video [C, T, H, W] (or [B, C, T, H, W], first item) in [0, 1]."""
    import cv2
    if video.ndim == 5:
        video = video[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    c, t, h, w = video.shape
    frames = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    frames = frames.transpose(1, 2, 3, 0)         # [T, H, W, C]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not writer.isOpened():
        # PNG-sequence fallback when no mp4 codec is available
        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        for i, fr in enumerate(frames):
            cv2.imwrite(os.path.join(base, f"{i:05d}.png"),
                        cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        return
    for fr in frames:
        writer.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    writer.release()


def save_results(video: np.ndarray, path: str, fps: int = 16) -> None:
    """Single frame -> png, else mp4 (reference `fast_infer.py:176-188`)."""
    import cv2
    if video.ndim == 5:
        video = video[0]
    if video.shape[1] == 1:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        img = (np.clip(video[:, 0], 0, 1) * 255).astype(np.uint8)
        img = img.transpose(1, 2, 0)
        cv2.imwrite(os.path.splitext(path)[0] + ".png",
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        return
    save_video(video, path, fps)


def _to01(x: np.ndarray) -> np.ndarray:
    if x.min() < 0.0 or x.max() > 1.0:
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


def save_side_by_side(input_video: np.ndarray, sample: np.ndarray, path: str,
                      fps: int = 16) -> None:
    """Horizontal concat input|output cropped to common T/H/W
    (`fast_infer.py:196-209`)."""
    a, b = _to01(np.asarray(input_video)), _to01(np.asarray(sample))
    if a.ndim == 5:
        a = a[0]
    if b.ndim == 5:
        b = b[0]
    t = min(a.shape[1], b.shape[1])
    h = min(a.shape[2], b.shape[2])
    w = min(a.shape[3], b.shape[3])
    combined = np.concatenate([a[:, :t, :h, :w], b[:, :t, :h, :w]], axis=3)
    save_video(combined, path, fps)
