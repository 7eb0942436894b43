"""Native C++ decode runtime tests (builds the .so if the toolchain exists;
the cv2 fallback path is exercised either way)."""

import numpy as np
import pytest

from videocof_tpu import runtime


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("rt") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    for i in range(30):
        # deterministic gradient frames so indices are distinguishable
        frame = np.full((48, 64, 3), i * 8 % 256, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_video_info(test_video):
    n, h, w, fps = runtime.video_info(test_video)
    assert (h, w) == (48, 64)
    assert n == 30
    assert fps == pytest.approx(12, abs=0.5)


def test_decode_selected_frames(test_video):
    out = runtime.decode_frames(test_video, [0, 10, 29], 48, 64)
    assert out.shape == (3, 3, 48, 64)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # gradient content: later frames are brighter
    means = out.mean(axis=(1, 2, 3))
    assert means[0] < means[1] < means[2]


def test_decode_with_resize(test_video):
    out = runtime.decode_frames(test_video, [5], 24, 32)
    assert out.shape == (1, 3, 24, 32)


def test_native_matches_cv2_fallback(test_video):
    if not runtime.native_available():
        pytest.skip("native runtime not built")
    idx = np.array([0, 7, 15])
    a = runtime.decode_frames(test_video, idx, 48, 64)
    b = runtime._decode_frames_cv2(test_video, idx, 48, 64)
    assert np.abs(a - b).mean() < 0.02  # codec/scaler rounding differences


def test_batch_decode(test_video):
    out = runtime.decode_batch([test_video] * 4,
                               np.tile(np.array([0, 5, 10]), (4, 1)), 48, 64)
    assert out.shape == (4, 3, 3, 48, 64)
    np.testing.assert_allclose(out[0], out[3], atol=1e-6)


def test_decode_preserves_caller_order(test_video):
    fwd = runtime.decode_frames(test_video, [0, 10, 29], 48, 64)
    rev = runtime.decode_frames(test_video, [29, 10, 0], 48, 64)
    np.testing.assert_allclose(rev, fwd[::-1], atol=1e-6)
    means = rev.mean(axis=(1, 2, 3))
    assert means[0] > means[1] > means[2]  # gradient: brighter first


def test_batch_decode_preserves_caller_order(test_video):
    fwd = runtime.decode_batch([test_video] * 2,
                               np.tile(np.array([0, 5, 10]), (2, 1)), 48, 64)
    rev = runtime.decode_batch([test_video] * 2,
                               np.tile(np.array([10, 5, 0]), (2, 1)), 48, 64)
    np.testing.assert_allclose(rev, fwd[:, ::-1], atol=1e-6)


def test_missing_file_errors():
    with pytest.raises(Exception):
        runtime.video_info("/nonexistent/file.mp4")
    with pytest.raises(Exception):
        runtime.decode_frames("/nonexistent/file.mp4", [0], 32, 32)


# ------------------------------------------------------------- encoder

def _smooth_frames(T=10, H=48, W=64):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([127.5 + 90 * np.sin(yy / H * 2.0),
                     127.5 + 90 * np.cos(xx / W * 1.5),
                     np.full((H, W), 80.0, np.float32)], axis=-1)
    frames = np.stack([np.clip(base + 6 * t, 0, 255) for t in range(T)])
    return frames.astype(np.uint8)          # [T, H, W, 3]


def test_encode_rgb_roundtrip(tmp_path):
    if not runtime.encode_available():
        pytest.skip("native runtime not built")
    frames = _smooth_frames()
    path = str(tmp_path / "enc.mp4")
    runtime.encode_video_rgb(path, frames, fps=12)
    n, h, w, fps = runtime.video_info(path)
    assert (n, h, w) == (10, 48, 64)
    assert fps == pytest.approx(12, abs=0.5)
    dec = runtime.decode_frames(path, list(range(10)), 48, 64)  # [-1, 1]
    orig = frames.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    assert np.abs(dec - orig).mean() < 0.04  # lossy codec tolerance


def test_encode_i420_matches_rgb_path(tmp_path):
    if not runtime.encode_available():
        pytest.skip("native runtime not built")
    import jax.numpy as jnp
    from videocof_tpu.utils import colorspace
    frames = _smooth_frames()
    u8 = frames.transpose(3, 0, 1, 2)[None]  # [1, 3, T, H, W]
    i420 = np.asarray(colorspace.rgb_to_i420(jnp.asarray(u8)))[0]
    path = str(tmp_path / "enc_i420.mp4")
    runtime.encode_video_i420(path, i420, fps=12)
    n, h, w, _ = runtime.video_info(path)
    assert (n, h, w) == (10, 48, 64)
    dec = runtime.decode_frames(path, list(range(10)), 48, 64)
    orig = frames.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    assert np.abs(dec - orig).mean() < 0.05


def test_save_video_uses_native_encoder(tmp_path):
    if not runtime.encode_available():
        pytest.skip("native runtime not built")
    from videocof_tpu.utils.video_io import save_video
    vid = _smooth_frames().transpose(3, 0, 1, 2).astype(np.float32) / 255.0
    path = str(tmp_path / "sv.mp4")
    save_video(vid, path, fps=10)
    n, h, w, _ = runtime.video_info(path)
    assert (n, h, w) == (10, 48, 64)


def test_decode_i420_matches_rgb_decode(test_video):
    """Native I420 decode (codec-native planes, half the RGB bytes) agrees
    with the RGB decode path after host reconstruction — the two are
    different orderings of the same YUV->RGB conversion, so agreement is
    coefficient-rounding-level, not bitwise."""
    from videocof_tpu.utils.colorspace import i420_to_rgb01

    idx = [0, 7, 19]
    i420 = runtime.decode_frames_i420(test_video, idx, 48, 64)
    assert i420.shape == (3, 72, 64) and i420.dtype == np.uint8
    rgb01 = i420_to_rgb01(i420[None])[0]                 # [3, T, H, W] 0..1
    ref01 = (runtime.decode_frames(test_video, idx, 48, 64)
             .transpose(1, 0, 2, 3) + 1.0) / 2.0
    assert np.abs(rgb01 - ref01).mean() < 0.02
    assert np.abs(rgb01 - ref01).max() < 0.12


def test_decode_i420_scatter_and_pad(test_video):
    """Caller-order scatter and repeat-last padding match decode_frames."""
    idx = [19, 0, 7]
    a = runtime.decode_frames_i420(test_video, idx, 48, 64)
    b = runtime.decode_frames_i420(test_video, sorted(idx), 48, 64)
    np.testing.assert_array_equal(a[1], b[0])
    np.testing.assert_array_equal(a[0], b[2])
    padded = runtime.decode_frames_i420(test_video, [29, 400, 401], 48, 64)
    np.testing.assert_array_equal(padded[1], padded[0])
    np.testing.assert_array_equal(padded[2], padded[0])
