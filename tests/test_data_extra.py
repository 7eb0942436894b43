"""Non-CoT dataset family, camera Plücker embeddings, video-io helpers,
remote-client controller."""

import json
import os

import numpy as np
import pytest

from videocof_tpu.data.camera import (CameraPose, plucker_rays,
                                      pose_params_to_embedding,
                                      process_pose_file, relative_poses)


# --------------------------------------------------------------------- camera

def _pose_entry(frame_id, fx, fy, cx, cy, w2c34):
    return [frame_id, fx, fy, cx, cy, 0.0, 0.0] + list(
        np.asarray(w2c34, np.float64).reshape(-1))


def test_relative_poses_first_is_identity():
    rng = np.random.default_rng(0)
    cams = []
    for _ in range(4):
        # random rotation (QR) + translation
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        w2c = np.concatenate([q, rng.normal(size=(3, 1))], axis=1)
        cams.append(CameraPose.from_entry(
            _pose_entry(0, 0.5, 0.9, 0.5, 0.5, w2c)))
    rel = relative_poses(cams)
    assert rel.shape == (4, 4, 4)
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-6)
    # relative pose i = w2c0 @ c2w_i
    expect = cams[0].w2c @ cams[2].c2w
    np.testing.assert_allclose(rel[2], expect, atol=1e-5)


def test_plucker_rays_identity_camera():
    H, W = 8, 12
    K = np.array([[10.0, 10.0, W / 2, H / 2]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[None]
    p = plucker_rays(K, c2w, H, W)
    assert p.shape == (1, H, W, 6)
    d = p[0, :, :, 3:]
    # directions are unit length
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # origin at 0 => moment o x d vanishes
    np.testing.assert_allclose(p[0, :, :, :3], 0.0, atol=1e-6)
    # center pixel looks along +z
    cd = d[H // 2, W // 2]
    assert cd[2] > 0.99
    # translation shows up as a nonzero moment
    c2w_t = c2w.copy()
    c2w_t[0, :3, 3] = [1.0, 0.0, 0.0]
    p_t = plucker_rays(K, c2w_t, H, W)
    assert np.abs(p_t[0, :, :, :3]).max() > 0.1
    # same directions (pure translation)
    np.testing.assert_allclose(p_t[0, :, :, 3:], d, atol=1e-6)


def test_process_pose_file_roundtrip(tmp_path):
    rows = []
    for i in range(5):
        w2c = np.eye(4)[:3]
        w2c[2, 3] = 0.1 * i
        rows.append(_pose_entry(i, 0.6, 1.0, 0.5, 0.5, w2c))
    path = str(tmp_path / "pose.txt")
    with open(path, "w") as f:
        f.write("https://example/video\n")
        for r in rows:
            f.write(" ".join(str(x) for x in r) + "\n")
    emb = process_pose_file(path, width=16, height=8)
    assert emb.shape == (5, 8, 16, 6)
    assert np.isfinite(emb).all()
    # return_poses gives back the raw rows
    back = process_pose_file(path, return_poses=True)
    assert len(back) == 5 and back[3][0] == 3.0
    # direct params API agrees
    emb2 = pose_params_to_embedding(rows, width=16, height=8)
    np.testing.assert_allclose(emb, emb2, atol=1e-6)


# ----------------------------------------------------------- dataset variants

@pytest.fixture(scope="module")
def media_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    paths = {}
    for name in ("clip_a", "clip_b"):
        p = str(root / f"{name}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for _ in range(20):
            w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()
        paths[name] = p
    img = str(root / "still.png")
    cv2.imwrite(img, rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    paths["img"] = img
    pose = str(root / "pose.txt")
    with open(pose, "w") as f:
        f.write("header\n")
        for i in range(6):
            w2c = np.eye(4)[:3].copy()
            w2c[0, 3] = 0.05 * i
            row = [i, 0.5, 0.9, 0.5, 0.5, 0, 0] + list(w2c.reshape(-1))
            f.write(" ".join(str(float(x)) for x in row) + "\n")
    paths["pose"] = pose
    paths["root"] = str(root)
    return paths


def test_image_video_dataset(media_root, tmp_path):
    from videocof_tpu.data import ImageVideoDataset
    items = [
        {"file_path": media_root["clip_a"], "text": "a video", "type": "video"},
        {"file_path": media_root["img"], "text": "an image", "type": "image"},
    ]
    ann = str(tmp_path / "ann.json")
    json.dump(items, open(ann, "w"))
    ds = ImageVideoDataset(ann, video_sample_size=32,
                           video_sample_n_frames=5, image_sample_size=32,
                           text_drop_ratio=0.0)
    assert len(ds) == 2
    v = ds[0]
    assert v["pixel_values"].shape == (3, 5, 32, 32)
    assert v["type"] == "video" and v["text"] == "a video"
    assert v["pixel_values"].min() >= -1.0 and v["pixel_values"].max() <= 1.0
    im = ds[1]
    assert im["pixel_values"].shape == (3, 1, 32, 32)
    # video_repeat balancing: images once + videos repeated
    ds3 = ImageVideoDataset(ann, video_repeat=3, video_sample_size=32,
                            video_sample_n_frames=2, image_sample_size=32)
    assert len(ds3) == 1 + 3


def test_image_video_dataset_csv(media_root, tmp_path):
    from videocof_tpu.data import ImageVideoDataset
    ann = str(tmp_path / "ann.csv")
    with open(ann, "w") as f:
        f.write("file_path,text,type\n")
        f.write(f"{media_root['img']},csv caption,image\n")
    ds = ImageVideoDataset(ann, image_sample_size=16, text_drop_ratio=0.0)
    s = ds[0]
    assert s["text"] == "csv caption"
    assert s["pixel_values"].shape == (3, 1, 16, 16)


def test_control_dataset_camera_and_video(media_root, tmp_path):
    from videocof_tpu.data import ImageVideoControlDataset
    items = [
        {"file_path": media_root["clip_a"], "text": "cam", "type": "video",
         "control_file_path": media_root["pose"]},
        {"file_path": media_root["clip_a"], "text": "vid", "type": "video",
         "control_file_path": media_root["clip_b"]},
    ]
    ann = str(tmp_path / "ann.json")
    json.dump(items, open(ann, "w"))
    ds = ImageVideoControlDataset(ann, video_sample_size=24,
                                  video_sample_n_frames=4,
                                  enable_camera_info=True,
                                  text_drop_ratio=0.0)
    cam = ds[0]
    # pose txt -> Plücker [T, 6, H, W], interpolated over the full clip then
    # picked at the SAME sampled indices as the main frames
    assert cam["control_camera_values"].shape == (4, 6, 24, 24)
    assert np.isfinite(cam["control_camera_values"]).all()
    assert (cam["control_pixel_values"] == 0).all()
    vid = ds[1]
    assert vid["control_camera_values"] is None
    assert vid["control_pixel_values"].shape == (3, 4, 24, 24)
    assert np.abs(vid["control_pixel_values"]).max() > 0
    # alignment: the control stream must be read at the main clip's sampled
    # frame indices (reference reads both at one shared batch_index,
    # dataset_image_video.py:1834,1843-1845)
    from videocof_tpu.data.buckets import resize_center_crop
    from videocof_tpu.data.dataset import _read_frames_at
    idx = list(vid["frame_indices"])
    expect = resize_center_crop(
        _read_frames_at(media_root["clip_b"], idx), 24, 24)
    expect = expect.transpose(3, 0, 1, 2).astype(np.float32) \
        * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(vid["control_pixel_values"], expect,
                               atol=1e-6)


def test_video_edit_dataset(media_root, tmp_path):
    from videocof_tpu.data import VideoEditDataset
    items = [{"original_video": media_root["clip_a"],
              "edited_video": media_root["clip_b"],
              "edit_instruction": "turn day into night"}]
    ann = str(tmp_path / "ann.json")
    json.dump(items, open(ann, "w"))
    ds = VideoEditDataset(ann, height=32, width=32, source_frames=5,
                          edit_frames=4, text_drop_ratio=0.0)
    s = ds[0]
    assert s["pixel_src"].shape == (3, 5, 32, 32)
    assert s["pixel_tgt"].shape == (3, 4, 32, 32)
    assert s["text"].startswith("A video sequence showing two parts")
    assert "turn day into night" in s["text"]


def test_video_edit_reasoning_alias(media_root, tmp_path):
    from videocof_tpu.data import VideoEditReasoningDataset
    items = [{"original_video": media_root["clip_a"],
              "grounded_video": media_root["clip_b"],
              "edited_video": media_root["clip_b"],
              "edit_instruction": "remove the box"}]
    ann = str(tmp_path / "ann.json")
    json.dump(items, open(ann, "w"))
    ds = VideoEditReasoningDataset(ann, height=32, width=32,
                                   source_frames=5, target_frames=5,
                                   reasoning_frames=2, text_drop_ratio=0.0)
    s = ds[0]
    assert s["pixel_src"].shape == (3, 5, 32, 32)
    assert s["pixel_ground"].shape == (3, 2, 32, 32)


# ------------------------------------------------------------ video-io extras

def test_color_transfer_matches_stats():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    src = rng.integers(40, 90, (32, 32, 3), dtype=np.uint8)
    ref = rng.integers(120, 230, (32, 32, 3), dtype=np.uint8)
    from videocof_tpu.utils import color_transfer
    out = color_transfer(src, ref)
    assert out.shape == src.shape and out.dtype == np.uint8
    out_lab = cv2.cvtColor(out, cv2.COLOR_RGB2LAB).astype(np.float64)
    ref_lab = cv2.cvtColor(ref, cv2.COLOR_RGB2LAB).astype(np.float64)
    # matched first moments (loose: uint8 rounding + clip)
    np.testing.assert_allclose(out_lab.reshape(-1, 3).mean(0),
                               ref_lab.reshape(-1, 3).mean(0), atol=6.0)


def test_save_videos_grid(tmp_path):
    pytest.importorskip("cv2")
    from videocof_tpu.utils import save_videos_grid
    rng = np.random.default_rng(0)
    batch = rng.uniform(0, 1, (3, 3, 4, 16, 16)).astype(np.float32)
    path = str(tmp_path / "grid.mp4")
    save_videos_grid(batch, path, n_rows=2, fps=4)
    # mp4 written, or PNG-sequence fallback dir when no codec
    assert os.path.exists(path) or os.path.isdir(str(tmp_path / "grid"))
    # rescale path accepts [-1, 1]
    save_videos_grid(batch * 2 - 1, str(tmp_path / "g2.mp4"), rescale=True,
                     color_transfer_post_process=True)


def test_merge_video_audio_missing_inputs(tmp_path):
    from videocof_tpu.utils import merge_video_audio
    with pytest.raises(FileNotFoundError):
        merge_video_audio(str(tmp_path / "nope.mp4"), str(tmp_path / "a.aac"))


# --------------------------------------------------------------- client mode

def test_client_post_to_host(tmp_path):
    """VideoCoFClient drives a live API server end to end (tiny pipe)."""
    import threading
    from http.server import ThreadingHTTPServer

    import jax
    import jax.numpy as jnp

    cv2 = pytest.importorskip("cv2")
    from videocof_tpu.configs import (GenerationConfig, T5_TINY, VAE_TINY,
                                      WAN_TINY)
    from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.serving import VideoCoFClient, VideoCoFController
    from videocof_tpu.serving.api import make_handler

    DCFG = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY), VAE_TINY,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)
    controller = VideoCoFController(
        pipe, defaults=GenerationConfig(source_frames=9, reasoning_frames=4,
                                        num_inference_steps=1,
                                        guidance_scale=1.0))
    vid_path = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        client = VideoCoFClient(url=f"http://127.0.0.1:{port}")
        out_path = str(tmp_path / "out.mp4")
        resp = client.post_to_host("remove the dog", video_path=vid_path,
                                   save_path=out_path, seed_textbox=3,
                                   sample_step_slider=1)
        assert resp["message"] == "Success"
        assert len(resp["video_bytes"]) > 100
        assert os.path.getsize(out_path) == len(resp["video_bytes"])
    finally:
        server.shutdown()
