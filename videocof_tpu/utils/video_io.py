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
                      rng: Optional[np.random.Generator] = None,
                      dtype: str = "uint8") -> Tuple[np.ndarray, int, int]:
    """-> (video [1, 3, T, H, W], height, width) — uint8 [0, 255] by
    default, or float32 in [-1, 1] with ``dtype="float32"``.

    uint8 is the production contract: the pipelines normalize on device with
    the SAME ``x * 2/255 - 1`` the decoder applies, so the u8 host array is
    a bit-exact, 4x smaller host->device upload (160 -> 40 MB at 33x480p —
    seconds on per-byte-priced transports).

    Stride-samples ``source_frames`` frames like the reference
    (`fast_infer.py:43-92`): stride = total // source_frames, random start,
    repeat the last frame if the clip runs short. Decode runs through the
    native C++ runtime (single sequential stream walk) when built, else cv2.

    ``dtype="i420"`` returns codec-native packed 4:2:0 planes
    [1, T, H*3//2, W] uint8 — HALF the u8 RGB upload; the pipelines accept
    them directly and upsample chroma on device (requires even H and W).
    """
    from ..runtime import decode_frames, decode_frames_i420, video_info
    total, h, w, _fps = video_info(video_path)
    if total < 1:
        raise ValueError(f"no frames in {video_path}")
    stride = max(1, total // source_frames)
    hi = max(1, total - stride * source_frames)
    rng = rng or np.random.default_rng(0)
    start = int(rng.integers(0, hi))
    idx = [min(start + i * stride, total - 1) for i in range(source_frames)]
    if dtype == "i420" and h % 2 == 0 and w % 2 == 0:
        return decode_frames_i420(video_path, idx, h, w)[None], h, w
    arr = decode_frames(video_path, idx, h, w)    # [T, 3, H, W] in [-1, 1]
    arr = arr.transpose(1, 0, 2, 3)[None]
    if dtype != "float32":
        # exact inverse of the decoder's px * 2/255 - 1 normalization
        arr = np.round((arr + 1.0) * 127.5).astype(np.uint8)
    return arr, h, w


def save_video(video: np.ndarray, path: str, fps: int = 16) -> None:
    """video [C, T, H, W] (or [B, C, T, H, W], first item) in [0, 1]."""
    if video.ndim == 5:
        video = video[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    c, t, h, w = video.shape
    frames = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    frames = frames.transpose(1, 2, 3, 0)         # [T, H, W, C]
    if path.endswith(".mp4") and h % 2 == 0 and w % 2 == 0:
        try:
            from .. import runtime
            runtime.encode_video_rgb(path, frames, fps=fps)
            return
        except Exception:
            pass  # toolchain-less install: cv2 writer below
    import cv2
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
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
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


def color_transfer(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Match ``src``'s LAB channel statistics to ``ref``'s (both uint8 RGB
    [H, W, 3]): per-channel ``(x - mu_s) * (sigma_r / sigma_s) + mu_r``
    in LAB space (reference `videox_fun/utils/utils.py:31-57`). Used to pin
    per-frame color drift to the first frame when saving."""
    import cv2
    s = cv2.cvtColor(src, cv2.COLOR_RGB2LAB).astype(np.float64)
    r = cv2.cvtColor(ref, cv2.COLOR_RGB2LAB).astype(np.float64)
    s_mean = s.reshape(-1, 3).mean(0)
    s_std = np.maximum(s.reshape(-1, 3).std(0), 1e-6)
    r_mean = r.reshape(-1, 3).mean(0)
    r_std = r.reshape(-1, 3).std(0)
    out = (s - s_mean) * (r_std / s_std) + r_mean
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return cv2.cvtColor(out, cv2.COLOR_LAB2RGB)


def save_videos_grid(videos: np.ndarray, path: str, rescale: bool = False,
                     n_rows: int = 6, fps: int = 12,
                     color_transfer_post_process: bool = False) -> None:
    """[B, C, T, H, W] batch -> one tiled video, ``n_rows`` items per grid
    row (reference `save_videos_grid`, `utils.py:59-83`). ``rescale`` maps
    [-1,1] -> [0,1]; ``color_transfer_post_process`` pins every frame's LAB
    statistics to frame 0's."""
    v = np.asarray(videos)
    if v.ndim == 4:
        v = v[None]
    if rescale:
        v = (v + 1.0) / 2.0
    v = np.clip(v, 0.0, 1.0)
    B, C, T, H, W = v.shape
    cols = min(n_rows, B)
    rows = -(-B // cols)
    pad = rows * cols - B
    if pad:
        v = np.concatenate([v, np.zeros((pad, C, T, H, W), v.dtype)])
    # [rows, cols, C, T, H, W] -> [C, T, rows*H, cols*W]
    grid = (v.reshape(rows, cols, C, T, H, W)
            .transpose(2, 3, 0, 4, 1, 5)
            .reshape(C, T, rows * H, cols * W))
    if color_transfer_post_process and T > 1:
        u8 = (grid * 255).astype(np.uint8).transpose(1, 2, 3, 0)  # [T,H,W,C]
        ref = u8[0]
        u8 = np.stack([ref] + [color_transfer(f, ref) for f in u8[1:]])
        grid = u8.transpose(3, 0, 1, 2).astype(np.float32) / 255.0
    save_video(grid, path, fps)


def merge_video_audio(video_path: str, audio_path: str) -> None:
    """Mux ``audio_path`` onto ``video_path`` in place, duration clipped to
    the shorter stream (reference `merge_video_audio`, `utils.py:85-143`:
    ffmpeg, video stream copied, AAC audio, ``-shortest``)."""
    import shutil
    import subprocess
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"video file {video_path} does not exist")
    if not os.path.exists(audio_path):
        raise FileNotFoundError(f"audio file {audio_path} does not exist")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("merge_video_audio needs ffmpeg on PATH")
    base, ext = os.path.splitext(video_path)
    temp_output = f"{base}_temp{ext}"
    try:
        result = subprocess.run(
            [ffmpeg, "-y", "-i", video_path, "-i", audio_path,
             "-c:v", "copy", "-c:a", "aac", "-b:a", "192k",
             "-map", "0:v:0", "-map", "1:a:0", "-shortest", temp_output],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"ffmpeg failed: {result.stderr}")
        shutil.move(temp_output, video_path)
    finally:
        if os.path.exists(temp_output):
            os.remove(temp_output)


def _read_image_rgb(img, size: Optional[Tuple[int, int]] = None
                    ) -> np.ndarray:
    """-> HWC uint8 RGB. ``img``: path, HWC array, or PIL-like object;
    ``size`` = (H, W) resize via PIL ``Image.resize`` with its default
    resample (BICUBIC) — the reference resizes conditioning images through
    PIL (`videox_fun/utils/utils.py:148-162`), so matching the resampler
    matters for pixel parity."""
    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            a = np.asarray(im.convert("RGB"), np.uint8)
    else:
        a = np.asarray(img, np.uint8)             # PIL images coerce too
    if size is not None and a.shape[:2] != tuple(size):
        from PIL import Image
        a = np.asarray(Image.fromarray(a).resize((size[1], size[0])),
                       np.uint8)
    return a


def get_image_to_video_latent(image_start, image_end, video_length: int,
                              sample_size: Tuple[int, int]):
    """i2v conditioning builder — twin of the reference
    `get_image_to_video_latent` (`videox_fun/utils/utils.py:145-242`).

    ``image_start``/``image_end``: path | HWC array | PIL image | list of
    those | None. -> ``(input_video [1,3,T,H,W] float 0..1,
    input_video_mask [1,1,T,H,W] 0/255, clip_image HWC uint8 | None)``:
    the start frame(s) fill the head (mask 0 = keep), the rest is 255
    (= generate); end frame(s) overwrite the tail with mask 0.
    """
    H, W = sample_size
    if image_start is None:
        video = np.zeros((1, 3, video_length, H, W), np.float32)
        mask = np.full((1, 1, video_length, H, W), 255.0, np.float32)
        return video, mask, None
    starts = image_start if isinstance(image_start, list) else [image_start]
    starts = [_read_image_rgb(s, (H, W)) for s in starts]
    clip_image = starts[0]
    head = np.stack(starts).transpose(3, 0, 1, 2)[None]   # [1,3,k,H,W]
    video = np.tile(head[:, :, :1], (1, 1, video_length, 1, 1))
    video[:, :, :len(starts)] = head
    mask = np.zeros((1, 1, video_length, H, W), np.float32)
    mask[:, :, len(starts):] = 255.0
    if image_end is not None:
        ends = image_end if isinstance(image_end, list) else [image_end]
        ends = [_read_image_rgb(e, (H, W)) for e in ends]
        tail = np.stack(ends).transpose(3, 0, 1, 2)[None]
        video[:, :, -len(ends):] = tail
        mask[:, :, -len(ends):] = 0.0
    return video.astype(np.float32) / 255.0, mask, clip_image


def get_video_to_video_latent(input_video_path, video_length: int,
                              sample_size: Tuple[int, int],
                              fps: Optional[int] = None,
                              validation_video_mask: Optional[str] = None,
                              ref_image=None):
    """v2v conditioning builder — twin of the reference
    `get_video_to_video_latent` (`videox_fun/utils/utils.py:244-300`).

    -> ``(input_video [1,3,T,H,W] 0..1 | None, input_video_mask [1,1,T,H,W]
    | None, ref_image [1,3,1,H,W] 0..1 | None, clip_image HWC uint8 |
    None)``. Path input decodes through the native runtime (fps-downsampled
    like the reference's `frame_count % frame_skip` walk); the mask image
    thresholds <240 -> 0 (keep) else 255 (generate), tiled over T.
    """
    H, W = sample_size
    video = mask = None
    if input_video_path is not None:
        if isinstance(input_video_path, str):
            from ..runtime import decode_frames, video_info
            total, _, _, src_fps = video_info(input_video_path)
            skip = 1 if fps is None else max(1, int(src_fps // fps))
            idx = list(range(0, total, skip))[:video_length]
            dec = decode_frames(input_video_path, idx, H, W)  # [T,3,H,W] ±1
            video = ((dec + 1.0) * 0.5).clip(0, 1).transpose(1, 0, 2, 3)[None]
        else:
            arr = np.asarray(input_video_path)[:video_length]  # [T,H,W,3]
            video = arr.transpose(3, 0, 1, 2)[None].astype(np.float32) / 255.0
        T = video.shape[2]
        if validation_video_mask is not None:
            # reference loads/resizes the mask through PIL ('L', default
            # BICUBIC resample) before thresholding (`utils.py:275-277`)
            from PIL import Image
            with Image.open(validation_video_mask) as im:
                m = np.asarray(im.convert("L").resize((W, H)))
            m = np.where(m < 240, 0.0, 255.0).astype(np.float32)
            mask = np.tile(m[None, None, None], (1, 1, T, 1, 1))
        else:
            mask = np.full((1, 1, T) + video.shape[3:], 255.0, np.float32)
    clip_image = None if ref_image is None else _read_image_rgb(ref_image)
    ref = None
    if ref_image is not None:
        # reference only resizes a str-path ref image to (H, W); an array
        # ref keeps its original size (`utils.py:288-299`)
        r = _read_image_rgb(ref_image,
                            (H, W) if isinstance(ref_image, str) else None)
        ref = r.transpose(2, 0, 1)[None, :, None].astype(np.float32) / 255.0
    return video, mask, ref, clip_image


def size_from_base_resolution(height: int, width: int,
                              base_resolution: int = 512
                              ) -> Tuple[int, int]:
    """-> (H, W) scaled so H*W ~= base_resolution^2 at the input's aspect
    ratio — the reference's AR-aware sizing rule
    (`get_width_and_height_from_image_and_base_resolution`,
    `videox_fun/utils/utils.py:23-29`; controllers feed it the reference
    image to pick the generation resolution)."""
    target = float(base_resolution) ** 2
    ratio = (target / (float(width) * float(height))) ** 0.5
    return round(height * ratio), round(width * ratio)
