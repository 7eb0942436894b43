"""Data-layer tests: instruction parser, masks, buckets, CoT triplet dataset."""

import json
import numpy as np
import pytest

from videocof_tpu.data.instructions import (build_cot_prompt,
                                            derive_ground_object_from_instruction)
from videocof_tpu.data.masks import get_random_mask
from videocof_tpu.data.buckets import (ASPECT_RATIO_512,
                                       AspectRatioBatchSampler,
                                       get_closest_ratio, resize_center_crop)


def test_instruction_parser_modes():
    # spec: reference `dataset_image_video.py:260-297`
    assert derive_ground_object_from_instruction(
        "replace the red car with a blue truck") == "the red car"
    assert derive_ground_object_from_instruction(
        "swap the cat with a dog") == "the cat"
    assert derive_ground_object_from_instruction(
        "remove the man in the background") == "the man"
    assert derive_ground_object_from_instruction(
        "add a hat on the dog") == "the target area"
    assert derive_ground_object_from_instruction(
        "change the sky to sunset colors") == "the sky"
    assert derive_ground_object_from_instruction("") == "the target area"


def test_cot_prompt_template():
    p = build_cot_prompt("remove the dog")
    assert p.startswith("A video sequence showing three parts: "
                        "first the original scene, then grounded the dog")
    assert p.endswith("finally the same scene but remove the dog")


def test_mask_modes_shapes():
    rng = np.random.default_rng(0)
    for _ in range(30):
        m = get_random_mask((8, 3, 32, 48), rng=rng)
        assert m.shape == (8, 1, 32, 48)
        assert m.dtype == np.uint8
        assert set(np.unique(m)) <= {0, 1}
    m = get_random_mask((8, 3, 32, 48), image_start_only=True)
    assert m[0].sum() == 0 and (m[1:] == 1).all()
    m1 = get_random_mask((1, 3, 32, 48), rng=rng)
    assert m1.shape == (1, 1, 32, 48)


def test_bucket_lookup():
    (h, w), key = get_closest_ratio(480, 832)
    assert h / w == pytest.approx(float(key), abs=0.06)
    assert (h, w) in ASPECT_RATIO_512.values()


def test_batch_sampler_groups_same_bucket():
    shapes = [(480, 832)] * 5 + [(832, 480)] * 5
    bs = AspectRatioBatchSampler(shapes, batch_size=2, shuffle=False)
    for batch in bs:
        keys = {get_closest_ratio(*shapes[i])[1] for i in batch}
        assert len(keys) == 1


def test_resize_center_crop():
    frames = np.zeros((2, 100, 60, 3), np.uint8)
    out = resize_center_crop(frames, 48, 48)
    assert out.shape == (2, 48, 48, 3)


@pytest.fixture(scope="module")
def triplet_json(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    paths = {}
    for name in ("orig", "ground", "edit"):
        p = str(root / f"{name}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for _ in range(20):
            w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()
        paths[name] = p
    items = [{"original_video": paths["orig"],
              "grounded_video": paths["ground"],
              "edited_video": paths["edit"],
              "edit_instruction": "remove the box"}]
    jp = str(root / "train.json")
    with open(jp, "w") as f:
        json.dump(items, f)
    return jp


def test_cot_triplet_dataset(triplet_json):
    from videocof_tpu.data.dataset import CoTTripletDataset
    ds = CoTTripletDataset(triplet_json, height=32, width=48,
                           source_frames=9, target_frames=9,
                           reasoning_frames=4, text_drop_ratio=0.0)
    assert len(ds) == 1
    s = ds[0]
    assert s["pixel_src"].shape == (3, 9, 32, 48)
    assert s["pixel_ground"].shape == (3, 4, 32, 48)
    assert s["pixel_tgt"].shape == (3, 9, 32, 48)
    assert s["pixel_src"].min() >= -1.0 and s["pixel_src"].max() <= 1.0
    assert "grounded the box" in s["text"]
    cot = ds.cot_pixels(s)
    assert cot.shape == (3, 22, 32, 48)


def test_dataset_retry_on_bad_item(triplet_json, tmp_path):
    from videocof_tpu.data.dataset import CoTTripletDataset
    with open(triplet_json) as f:
        items = json.load(f)
    items.append({"original_video": "/nonexistent.mp4",
                  "edit_instruction": "x"})
    jp = str(tmp_path / "bad.json")
    with open(jp, "w") as f:
        json.dump(items, f)
    ds = CoTTripletDataset(jp, height=32, width=48, source_frames=4,
                           target_frames=4, reasoning_frames=2,
                           text_drop_ratio=0.0)
    # index 1 is broken; retry resamples to the good item
    s = ds[1]
    assert s["pixel_src"].shape == (3, 4, 32, 48)


def test_tokenizer_require_real_rejects_fallback():
    import pytest
    from videocof_tpu.data.tokenizer import WanTokenizer
    # bad checkpoint path + require_real -> hard error, never hash fallback
    with pytest.raises(RuntimeError, match="refusing the hash-fallback"):
        WanTokenizer("/nonexistent/umt5-dir", require_real=True)
    # without require_real: loud warning + fallback, still functional
    tok = WanTokenizer("/nonexistent/umt5-dir", require_real=False)
    assert tok.is_fallback
    ids, mask = tok(["hello world"], max_length=8)
    assert ids.shape == (1, 8) and mask[0].sum() == 3


def test_interpolate_ground_frames_linear():
    from videocof_tpu.data.dataset import interpolate_ground_frames
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 240, np.uint8)
    out = interpolate_ground_frames(a, b, total_steps=16,
                                    pick_indices=(0, 3, 6, 9, 12))
    assert out.shape == (5, 8, 8, 3) and out.dtype == np.uint8
    # align_corners linear: weight = idx/15
    want = [round(240 * i / 15) for i in (0, 3, 6, 9, 12)]
    got = [int(out[i, 0, 0, 0]) for i in range(5)]
    assert all(abs(g - w) <= 1 for g, w in zip(got, want)), (got, want)
    # mismatched sizes resize target to ground
    b2 = np.full((4, 6, 3), 200, np.uint8)
    out2 = interpolate_ground_frames(a, b2, total_steps=4,
                                     pick_indices=(0, 3))
    assert out2.shape == (2, 8, 8, 3)


def test_gray_mask_and_effects():
    from videocof_tpu.data.dataset import (apply_gray_overlay,
                                           apply_gray_region_effect,
                                           build_gray_mask)
    frame = np.zeros((6, 6, 3), np.uint8)
    frame[:3] = 128                      # flat gray in band -> masked
    frame[3:] = [200, 40, 90]            # saturated -> not masked
    m = build_gray_mask(frame)
    assert m[:3].all() and not m[3:].any()

    red = apply_gray_region_effect(frame[None], "red")[0]
    assert (red[:3] == [255, 0, 0]).all()
    assert (red[3:] == [200, 40, 90]).all()

    blk = apply_gray_region_effect(frame[None], "black")[0]
    assert (blk[:3] == 128).all() and (blk[3:] == 0).all()

    src = np.full((2, 6, 6, 3), 100, np.uint8)
    ov = apply_gray_overlay(src, frame[None].repeat(2, 0), alpha=0.5,
                            gray_value=0.5, num_frames=1)
    # first frame, gray region: 0.5*100/255 + 0.5*0.5 -> ~96... compute:
    want = round((0.5 * (100 / 255.0) + 0.5 * 0.5) * 255.0)
    assert abs(int(ov[0, 0, 0, 0]) - want) <= 1
    # unmasked rows and the second frame untouched
    assert (ov[0, 3:] == 100).all() and (ov[1] == 100).all()


def test_dataset_gradual_and_gray_modes(triplet_json):
    from videocof_tpu.data.dataset import CoTTripletDataset
    ds = CoTTripletDataset(triplet_json, height=32, width=48,
                           source_frames=6, target_frames=6,
                           reasoning_frames=4, text_drop_ratio=0.0,
                           gradual_ground=True, gray_viz="red")
    s = ds[0]
    # gradual mode: reasoning_frames interpolated grounding frames
    assert s["pixel_ground"].shape == (3, 4, 32, 48)
    # first interpolated frame == grounded video's first frame (weight 0)
    ds2 = CoTTripletDataset(triplet_json, height=32, width=48,
                            source_frames=6, target_frames=6,
                            reasoning_frames=4, text_drop_ratio=0.0,
                            gray_viz="overlay")
    s2 = ds2[0]
    # overlay mode returns the (modified) SOURCE stream as grounding
    # (reference `:1541-1546`)
    assert s2["pixel_ground"].shape == (3, 6, 32, 48)
    with pytest.raises(ValueError, match="gray_viz"):
        CoTTripletDataset(triplet_json, gray_viz="sparkle")
