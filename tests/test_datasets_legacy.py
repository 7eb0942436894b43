"""Legacy WebVid10M / VideoDataset loaders (reference
`videox_fun/data/dataset_video.py`)."""

import csv
import json

import numpy as np
import pytest

from videocof_tpu.data.datasets_legacy import (
    VideoDataset, WebVid10M, _linspace_indices,
    _resize_shortest_center_crop, legacy_random_mask)

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def clip_dir(tmp_path):
    root = tmp_path / "clips"
    root.mkdir()
    for name, frames in [("vid0", 24), ("vid1", 6)]:
        p = str(root / f"{name}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        assert w.isOpened(), "no mp4 codec in this cv2 build"
        for i in range(frames):
            frame = np.full((48, 64, 3), (i * 9) % 256, np.uint8)
            w.write(frame)
        w.release()
    return root


def _write_csv(tmp_path):
    csv_path = str(tmp_path / "webvid.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["videoid", "name", "page_dir"])
        wr.writeheader()
        wr.writerow({"videoid": "vid0", "name": "a cat", "page_dir": "g0"})
        wr.writerow({"videoid": "vid1", "name": "a dog", "page_dir": "g1"})
    return csv_path


def test_webvid_video_mode(clip_dir, tmp_path):
    ds = WebVid10M(_write_csv(tmp_path), str(clip_dir), sample_size=32,
                   sample_stride=2, sample_n_frames=8, seed=0)
    assert len(ds) == 2
    s = ds[0]
    pix = s["pixel_values"]
    # reference layout for this family: [T, C, H, W] float in [-1, 1]
    assert pix.shape == (8, 3, 32, 32) and pix.dtype == np.float32
    assert pix.min() >= -1.0 and pix.max() <= 1.0
    assert s["text"] == "a cat"


def test_webvid_short_clip_repeats_frames(clip_dir, tmp_path):
    # vid1 has 6 frames < (16-1)*4+1: linspace must repeat, not fail
    ds = WebVid10M(_write_csv(tmp_path), str(clip_dir), sample_size=32,
                   sample_stride=4, sample_n_frames=16, seed=1)
    assert ds[1]["pixel_values"].shape == (16, 3, 32, 32)


def test_webvid_bucket_and_image_modes(clip_dir, tmp_path):
    bucket = WebVid10M(_write_csv(tmp_path), str(clip_dir), sample_size=32,
                       sample_n_frames=4, enable_bucket=True, seed=0)
    raw = bucket[0]["pixel_values"]
    assert raw.shape == (4, 48, 64, 3) and raw.dtype == np.uint8

    img = WebVid10M(_write_csv(tmp_path), str(clip_dir), sample_size=32,
                    is_image=True, seed=0)
    one = img[0]["pixel_values"]
    assert one.shape == (3, 32, 32)


def test_webvid_inpaint_mask(clip_dir, tmp_path):
    ds = WebVid10M(_write_csv(tmp_path), str(clip_dir), sample_size=32,
                   sample_n_frames=8, enable_inpaint=True, seed=3)
    s = ds[0]
    mask, mpix, pix = s["mask"], s["mask_pixel_values"], s["pixel_values"]
    assert mask.shape == (8, 1, 32, 32) and set(np.unique(mask)) <= {0, 1}
    # masked region is -1, unmasked equals pixels (reference :148-151)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.broadcast_to(m, pix.shape) * mpix,
        np.broadcast_to(m, pix.shape) * -1.0, atol=1e-6)
    np.testing.assert_allclose(np.where(m, pix, mpix), pix, atol=1e-6)


def test_videodataset_json_and_retry(clip_dir, tmp_path):
    ann = [{"file_path": "vid0.mp4", "text": "hello"},
           {"file_path": "missing.mp4", "text": "broken"}]
    jp = str(tmp_path / "ann.json")
    json.dump(ann, open(jp, "w"))
    ds = VideoDataset(jp, str(clip_dir), sample_size=32, sample_stride=2,
                      sample_n_frames=4, seed=0)
    s = ds[0]
    assert s["pixel_values"].shape == (4, 3, 32, 32)
    assert s["text"] == "hello"
    # the broken item retries with a random resample and still returns
    s2 = ds[1]
    assert s2["pixel_values"].shape == (4, 3, 32, 32)


def test_linspace_indices_match_reference_formula():
    rng = np.random.default_rng(0)
    for total, n, stride in [(24, 8, 2), (6, 16, 4), (100, 16, 4), (1, 4, 4)]:
        idx = _linspace_indices(total, n, stride, rng)
        assert idx.shape == (n,)
        assert idx.min() >= 0 and idx.max() < total
        clip = min(total, (n - 1) * stride + 1)
        assert idx.max() - idx.min() <= clip - 1


def test_legacy_mask_modes_cover_reference():
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(64):
        m = legacy_random_mask((8, 3, 16, 16), rng)
        assert m.shape == (8, 1, 16, 16)
        if not m[0].any() and m[1:].all():
            seen.add("after_first")
        elif not m[0].any() and not m[-1].any() and m[1:-1].all():
            seen.add("interior")
        elif (m == m[0]).all() and 0 < m.mean() < 1:
            seen.add("static_rect")
        elif m.any():
            seen.add("band_rect")
    assert {"after_first", "interior", "static_rect", "band_rect"} <= seen


def test_resize_shortest_center_crop_semantics():
    # 48x64 -> shortest side 32 => 32x43 resized, center-cropped to 32x32
    frames = np.zeros((2, 48, 64, 3), np.uint8)
    frames[:, :, 32] = 255      # vertical stripe at x=32 (center-ish)
    out = _resize_shortest_center_crop(frames, (32, 32))
    assert out.shape == (2, 32, 32, 3)
    assert out.max() > 0        # center stripe survives the crop
    # non-square target with padding: crop wider than the resized frame
    out2 = _resize_shortest_center_crop(frames, (32, 64))
    assert out2.shape == (2, 32, 64, 3)
    assert (out2[:, :, :8] == 0).all() and (out2[:, :, -8:] == 0).all()


@pytest.fixture()
def image_json(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    items = []
    for name, (h, w) in [("a", (48, 64)), ("b", (80, 40))]:
        rgb = np.zeros((h, w, 3), np.uint8)
        rgb[..., 0] = 200   # R=200 marker to catch BGR/RGB swaps
        cv2.imwrite(str(img_dir / f"{name}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        items.append({"file_path": f"{name}.png", "text": f"img {name}"})
    items.append({"file_path": "missing.png", "text": "broken"})
    json_path = str(tmp_path / "cc.json")
    with open(json_path, "w") as f:
        json.dump(items, f)
    return json_path, str(img_dir)


def test_cc15m_transform_mode(image_json):
    from videocof_tpu.data import CC15M
    json_path, img_dir = image_json
    ds = CC15M(json_path, img_dir, resolution=32, seed=0)
    assert len(ds) == 3
    s = ds[0]
    # [C, H, W] float32 in [-1, 1]; R=200 -> 200/127.5 - 1
    assert s["pixel_values"].shape == (3, 32, 32)
    assert s["pixel_values"].dtype == np.float32
    np.testing.assert_allclose(s["pixel_values"][0], 200 / 127.5 - 1,
                               atol=1e-6)
    np.testing.assert_allclose(s["pixel_values"][1:], -1.0, atol=1e-6)
    assert s["text"] == "img a"
    # tuple resolution
    s2 = CC15M(json_path, img_dir, resolution=(32, 48), seed=0)[1]
    assert s2["pixel_values"].shape == (3, 32, 48)


def test_cc15m_bucket_and_retry(image_json):
    from videocof_tpu.data import CC15M
    json_path, img_dir = image_json
    ds = CC15M(json_path, img_dir, resolution=32, enable_bucket=True, seed=0)
    s = ds[0]
    assert s["pixel_values"].shape == (48, 64, 3)
    assert s["pixel_values"].dtype == np.uint8
    assert s["pixel_values"][0, 0, 0] == 200      # RGB order preserved
    # the broken item resamples to a readable one instead of raising
    s_broken = ds[2]
    assert s_broken["idx"] in (0, 1)
