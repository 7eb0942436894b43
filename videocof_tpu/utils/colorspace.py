"""On-device RGB -> I420 (YUV 4:2:0) packing for the decode readback.

The decoded video leaves the chip as uint8 and its final consumer is an
8-bit 4:2:0 codec (the reference saves mp4 via imageio/ffmpeg,
`videox_fun/utils/utils.py:59-143`; our `save_video` via cv2's mp4v — both
chroma-subsample to 4:2:0 at encode time). Converting on device and fetching
I420 planes instead of RGB halves the transfer bytes (1.5 vs 3 per pixel),
which matters on per-transfer-latency transports (the axon tunnel swings
0.2-32 MB/s). Opt-in via ``VIDEOCOF_FETCH_YUV420=1`` because the chroma
subsample is lossy versus the raw RGB array contract (it is the SAME loss any
mp4 save applies, but tests and callers comparing raw frames should keep the
default RGB fetch).

Video-range (studio-swing) BT.601 coefficients — the convention cv2's
RGB<->I420 pair implements (probed empirically: Y16 -> black, Y235 -> white,
dR/dY = 1.164): Y = 16 + (65.481 R + 128.553 G + 24.966 B)/255,
U = 128 + (-37.797 R - 74.203 G + 112 B)/255,
V = 128 + (112 R - 93.786 G - 18.214 B)/255; chroma is 2x2 mean-pooled.
I420 plane layout per frame: H rows of Y, then the U plane (H/2 x W/2)
packed row-major into H/4 rows of width W, then V likewise — one
[H*3/2, W] uint8 image cv2.cvtColor(..., COLOR_YUV2RGB_I420) accepts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rgb_to_i420(u8):
    """[B, 3, T, H, W] uint8 RGB -> [B, T, H*3//2, W] uint8 I420 (jittable).

    Requires H % 4 == 0 and W % 2 == 0 (the I420 row packing).
    """
    B, C, T, H, W = u8.shape
    assert C == 3 and H % 4 == 0 and W % 2 == 0, (C, H, W)
    x = u8.astype(jnp.float32)
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    u = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    v = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0

    def pool(c):
        return c.reshape(B, T, H // 2, 2, W // 2, 2).mean(axis=(3, 5))

    def q(c):
        return jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint8)

    yq = q(y)
    uq = q(pool(u)).reshape(B, T, H // 4, W)
    vq = q(pool(v)).reshape(B, T, H // 4, W)
    return jnp.concatenate([yq, uq, vq], axis=2)


def i420_to_rgbm11_jax(i420) -> "jnp.ndarray":
    """[B, T, H*3//2, W] uint8 I420 -> [B, 3, T, H, W] float32 in [-1, 1],
    jittable — the UPLOAD twin of `rgb_to_i420`: video sources are 4:2:0
    already, so shipping the codec-native planes host->device halves the
    biggest transfer in the edit pipeline (40 -> 20 MB at 33x480p) and the
    chip does the chroma upsample. Same math as the NumPy fallback in
    `i420_to_rgb01` (nearest-neighbour chroma upsample, studio-swing BT.601),
    so host and device reconstructions agree exactly."""
    B, T, Hp, W = i420.shape
    H = (Hp * 2) // 3
    y = i420[:, :, :H].astype(jnp.float32)
    u = i420[:, :, H:H + H // 4].reshape(B, T, H // 2, W // 2)
    v = i420[:, :, H + H // 4:].reshape(B, T, H // 2, W // 2)
    u = jnp.repeat(jnp.repeat(u, 2, axis=2), 2, axis=3
                   ).astype(jnp.float32) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=2), 2, axis=3
                   ).astype(jnp.float32) - 128.0
    c = 1.164 * (y - 16.0)
    r = c + 1.596 * v
    g = c - 0.391 * u - 0.813 * v
    b = c + 2.018 * u
    rgb = jnp.stack([r, g, b], axis=1)            # [B, 3, T, H, W]
    return jnp.clip(rgb, 0.0, 255.0) * (2.0 / 255.0) - 1.0


def i420_to_rgb01(i420: np.ndarray) -> np.ndarray:
    """[B, T, H*3//2, W] uint8 I420 -> [B, 3, T, H, W] float32 in [0, 1].

    Host-side reconstruction (cv2 if available, else a NumPy twin of
    COLOR_YUV2RGB_I420: nearest-neighbour chroma upsample, BT.601 full
    range)."""
    B, T, Hp, W = i420.shape
    H = (Hp * 2) // 3
    try:
        import cv2
        out = np.empty((B, 3, T, H, W), np.float32)
        for bi in range(B):
            for ti in range(T):
                rgb = cv2.cvtColor(i420[bi, ti], cv2.COLOR_YUV2RGB_I420)
                out[bi, :, ti] = rgb.transpose(2, 0, 1)
        return out / 255.0
    except ImportError:
        y = i420[:, :, :H].astype(np.float32)
        u = i420[:, :, H:H + H // 4].reshape(B, T, H // 2, W // 2)
        v = i420[:, :, H + H // 4:].reshape(B, T, H // 2, W // 2)
        u = u.repeat(2, axis=2).repeat(2, axis=3).astype(np.float32) - 128.0
        v = v.repeat(2, axis=2).repeat(2, axis=3).astype(np.float32) - 128.0
        c = 1.164 * (y - 16.0)
        r = c + 1.596 * v
        g = c - 0.391 * u - 0.813 * v
        b = c + 2.018 * u
        rgb = np.stack([r, g, b], axis=1)
        return np.clip(rgb, 0, 255) / 255.0
