"""ctypes binding for the native video runtime (`video_decoder.cc` decode,
`video_encoder.cc` mp4 encode), with transparent build-on-first-use and a
cv2 fallback so the framework stays functional without the toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvideocof_runtime.so")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    # Always run make: the Makefile's mtime rule decides whether a rebuild is
    # needed, so an edited video_decoder.cc is never shadowed by a stale .so.
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=300)
    except Exception as e:
        if not os.path.exists(_SO):
            print(f"[runtime] native build unavailable ({e}); "
                  "falling back to cv2", file=sys.stderr)
            _build_failed = True
            return None
        print(f"[runtime] rebuild failed ({e}); using existing {_SO}",
              file=sys.stderr)
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        print(f"[runtime] cannot load {_SO}: {e}", file=sys.stderr)
        _build_failed = True
        return None
    lib.vcf_last_error.restype = ctypes.c_char_p
    lib.vcf_video_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double)]
    lib.vcf_decode_frames.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.vcf_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    # I420 decode may be absent from an older kept-alive .so
    try:
        lib.vcf_decode_frames_i420.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib._vcf_has_i420 = True
    except AttributeError:
        lib._vcf_has_i420 = False
    # Encoder symbols may be ABSENT from a pre-encoder .so kept alive by the
    # "rebuild failed; using existing" path above — degrade to decode-only
    # (encode falls back to cv2/ffmpeg) instead of AttributeError-ing the
    # previously working decode path.
    try:
        lib.vcf_enc_last_error.restype = ctypes.c_char_p
        for name in ("vcf_encode_video_rgb", "vcf_encode_video_i420"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.c_int64]
        lib._vcf_has_encoder = True
    except AttributeError:
        print(f"[runtime] {_SO} predates the encoder symbols; "
              "decode-only mode", file=sys.stderr)
        lib._vcf_has_encoder = False
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def video_info(path: str):
    """-> (n_frames, height, width, fps)."""
    lib = _load()
    if lib is None:
        import cv2
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(path)
        info = (int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                float(cap.get(cv2.CAP_PROP_FPS)))
        cap.release()
        return info
    n = ctypes.c_int64()
    h, w = ctypes.c_int(), ctypes.c_int()
    fps = ctypes.c_double()
    if lib.vcf_video_info(path.encode(), ctypes.byref(n), ctypes.byref(h),
                          ctypes.byref(w), ctypes.byref(fps)) != 0:
        raise IOError(lib.vcf_last_error().decode())
    return int(n.value), int(h.value), int(w.value), float(fps.value)


def decode_frames(path: str, indices: Sequence[int], out_h: int, out_w: int
                  ) -> np.ndarray:
    """-> float32 [T, 3, out_h, out_w] in [-1, 1]; single sequential decode
    pass regardless of how many frames are requested. Output rows follow the
    caller's ``indices`` order (decode happens in sorted order; results are
    scattered back)."""
    req = np.asarray(list(indices), np.int64)
    order = np.argsort(req, kind="stable")
    idx = req[order]
    nf = len(idx)
    lib = _load()
    if lib is None:
        out = _decode_frames_cv2(path, idx, out_h, out_w)
    else:
        out = np.empty((nf, 3, out_h, out_w), np.float32)
        r = lib.vcf_decode_frames(
            path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nf, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if r < 0:
            raise IOError(lib.vcf_last_error().decode())
        if r == 0:
            raise ValueError(f"no frames decoded from {path}")
    inv = np.empty_like(order)
    inv[order] = np.arange(nf)
    return out[inv]


def decode_frames_i420(path: str, indices: Sequence[int], out_h: int,
                       out_w: int) -> np.ndarray:
    """-> uint8 [T, out_h*3//2, out_w] packed I420 planes (codec-native
    4:2:0 — HALF the bytes of uint8 RGB; the pipelines upsample chroma on
    device, see `utils/colorspace.i420_to_rgbm11_jax`). Same sequential-walk
    /scatter-back contract as `decode_frames`. Falls back to cv2 decode +
    RGB->I420 when the native runtime (or its i420 symbol) is absent."""
    assert out_h % 2 == 0 and out_w % 2 == 0, (out_h, out_w)
    req = np.asarray(list(indices), np.int64)
    order = np.argsort(req, kind="stable")
    idx = req[order]
    nf = len(idx)
    lib = _load()
    if lib is not None and getattr(lib, "_vcf_has_i420", False):
        out = np.empty((nf, out_h * 3 // 2, out_w), np.uint8)
        r = lib.vcf_decode_frames_i420(
            path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nf, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if r < 0:
            raise IOError(lib.vcf_last_error().decode())
        if r == 0:
            raise ValueError(f"no frames decoded from {path}")
    else:
        import cv2
        rgbf = (decode_frames(path, idx, out_h, out_w) + 1.0) * 127.5
        rgb = np.round(rgbf).astype(np.uint8)          # [T, 3, H, W]
        out = np.empty((nf, out_h * 3 // 2, out_w), np.uint8)
        for t in range(nf):
            out[t] = cv2.cvtColor(rgb[t].transpose(1, 2, 0),
                                  cv2.COLOR_RGB2YUV_I420)
    inv = np.empty_like(order)
    inv[order] = np.arange(nf)
    return out[inv]


def decode_batch(paths: Sequence[str], indices: np.ndarray, out_h: int,
                 out_w: int, num_threads: int = 0) -> np.ndarray:
    """indices [n_videos, frames_per_video] -> [n_videos, T, 3, H, W];
    one decoder thread per video. Per-video frame order follows the caller's
    ``indices`` rows (decoded sorted, scattered back)."""
    lib = _load()
    req = np.asarray(indices, np.int64)
    nv, fpv = req.shape
    order = np.argsort(req, axis=1, kind="stable")
    idx = np.ascontiguousarray(np.take_along_axis(req, order, axis=1))
    if lib is None:
        out = np.stack([_decode_frames_cv2(p, idx[i], out_h, out_w)
                        for i, p in enumerate(paths)])
    else:
        out = np.empty((nv, fpv, 3, out_h, out_w), np.float32)
        arr = (ctypes.c_char_p * nv)(*[p.encode() for p in paths])
        r = lib.vcf_decode_batch(
            arr, nv, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), fpv,
            out_h, out_w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            num_threads)
        if r != 0:
            raise IOError(lib.vcf_last_error().decode())
    inv = np.empty_like(order)
    np.put_along_axis(inv, order, np.arange(fpv)[None, :].repeat(nv, 0),
                      axis=1)
    return np.take_along_axis(out, inv[:, :, None, None, None], axis=1)


def encode_available() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "_vcf_has_encoder", False)


def encode_video_rgb(path: str, frames: np.ndarray, fps: float = 16.0,
                     bitrate: int = 0) -> None:
    """Encode packed uint8 RGB frames [T, H, W, 3] to an mp4 (native libav
    mux+encode; raises if the native runtime is unavailable — callers
    fall back to cv2, see utils/video_io.save_video)."""
    lib = _load()
    if lib is None or not getattr(lib, "_vcf_has_encoder", False):
        raise RuntimeError("native encoder unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    T, H, W, C = frames.shape
    assert C == 3, frames.shape
    r = lib.vcf_encode_video_rgb(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, float(fps), int(bitrate))
    if r != 0:
        raise IOError(lib.vcf_enc_last_error().decode())


def encode_video_i420(path: str, i420: np.ndarray, fps: float = 16.0,
                      bitrate: int = 0) -> None:
    """Encode packed I420 frames [T, H*3//2, W] (the utils/colorspace.py
    device-fetch layout) to an mp4 — zero host-side colorspace work."""
    lib = _load()
    if lib is None or not getattr(lib, "_vcf_has_encoder", False):
        raise RuntimeError("native encoder unavailable")
    i420 = np.ascontiguousarray(i420, np.uint8)
    T, Hp, W = i420.shape
    H = (Hp * 2) // 3
    r = lib.vcf_encode_video_i420(
        path.encode(), i420.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, float(fps), int(bitrate))
    if r != 0:
        raise IOError(lib.vcf_enc_last_error().decode())


def _decode_frames_cv2(path, idx, out_h, out_w):
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    frames = []
    want = list(idx)
    pos = 0
    wi = 0
    while wi < len(want):
        ok, frame = cap.read()
        if not ok:
            break
        while wi < len(want) and want[wi] == pos:
            f = cv2.resize(frame, (out_w, out_h))
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
            wi += 1
        pos += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    while len(frames) < len(want):
        frames.append(frames[-1].copy())
    arr = np.stack(frames).astype(np.float32) * (2.0 / 255.0) - 1.0
    return arr.transpose(0, 3, 1, 2)
