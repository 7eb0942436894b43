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
