"""Serving API + CLI end-to-end tests (tiny configs, synthetic video)."""

import base64
import json
import os
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
from videocof_tpu.pipeline import WanPipeline
from videocof_tpu.serving import VideoCoFController
from videocof_tpu.configs import GenerationConfig


@pytest.fixture(scope="module")
def tiny_pipe():
    DCFG = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                            text_dim=T5_TINY.dim)
    return WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY), VAE_TINY,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()
    return path


@pytest.fixture(scope="module")
def controller(tiny_pipe):
    return VideoCoFController(
        tiny_pipe,
        defaults=GenerationConfig(source_frames=9, reasoning_frames=4,
                                  num_inference_steps=2,
                                  guidance_scale=1.0))


def test_controller_generate(controller, test_video):
    out = controller.generate(video_path=test_video, prompt="remove the box",
                              seed=1)
    assert out["videos"].shape[1] == 3
    assert "grounded the box" in out["prompt"]
    b64 = controller.encode_video_base64(out["videos"])
    assert len(base64.b64decode(b64)) > 100


def test_http_api_roundtrip(controller, test_video):
    from videocof_tpu.serving.api import make_handler, ENDPOINT
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        # web UI page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
            assert "VideoCoF-TPU" in page and "infer_forward" in page
        # inference
        with open(test_video, "rb") as f:
            vid_b64 = base64.b64encode(f.read()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({
                "prompt_textbox": "remove the dog",
                "source_video": vid_b64,
                "seed_textbox": 3,
                "sample_step_slider": 2,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.load(r)
        assert resp["message"] == "Success"
        assert len(base64.b64decode(resp["base64_encoding"])) > 100
        # bad request probe
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({"prompt_textbox": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # metrics: the successful generation above is counted, with timing
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics") as r:
            text = r.read().decode()
        assert "videocof_requests_total 2" in text
        assert "videocof_failures_total 1" in text
        assert "videocof_generate_seconds_count 1" in text
        assert "videocof_busy 0" in text
        # oversized body is rejected up front (413), not read
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}", data=b"{}",
            headers={"Content-Type": "application/json",
                     "Content-Length": str(10 ** 12)})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
        except Exception:
            pass  # some urllib versions abort the send on mismatched length
    finally:
        server.shutdown()


def test_cli_i2v_start_image(tmp_path, monkeypatch):
    """--start_image routes through WanPipeline.image_to_video (i2v DiT:
    channel-concat conditioning, Wan-i2v mask fold)."""
    import jax
    import jax.numpy as jnp

    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli
    from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
    from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(model_type="i2v", in_dim=2 * vcfg.z_dim + 4,
                            out_dim=vcfg.z_dim, text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg), dcfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg), vcfg,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)

    from PIL import Image
    img_path = str(tmp_path / "start.png")
    Image.fromarray(np.random.default_rng(0).integers(
        0, 256, (32, 32, 3)).astype(np.uint8)).save(img_path)

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: pipe)
    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--start_image", img_path, "--prompt", "animate it",
        "--output_dir", out_dir, "--num_frames", "9", "--random_init",
        "--num_inference_steps", "1"])
    cli.main()
    assert "gen_start.mp4" in os.listdir(out_dir)


def test_cli_t2v_prompt_only(tiny_pipe, tmp_path, monkeypatch):
    """--t2v generates from a prompt alone (no source video) through
    WanPipeline.text_to_video — the reference Wan2_2Pipeline flow."""
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    out_dir = str(tmp_path / "out_t2v")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--t2v", "--prompt", "a red fox in the snow",
        "--output_dir", out_dir, "--num_frames", "5", "--height", "32",
        "--width", "32", "--random_init", "--num_inference_steps", "1"])
    cli.main()
    files = os.listdir(out_dir)
    assert "gen_a_red_fox_in_the_snow.mp4" in files
    # resume: a second run skips the finished item
    cli.main()


def test_cli_fast_infer_e2e(tiny_pipe, test_video, tmp_path, monkeypatch):
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--video_path", test_video, "--prompt",
        "remove the red ball", "--output_dir", out_dir,
        "--source_frames", "9", "--reasoning_frames", "4", "--repeat_rope",
        "--random_init", "--num_inference_steps", "2"])
    cli.main()
    files = sorted(os.listdir(out_dir))
    base = os.path.splitext(os.path.basename(test_video))[0]
    assert f"gen_{base}.mp4" in files
    assert f"gen_{base}_reason_edit.mp4" in files
    assert f"gen_{base}_compare.mp4" in files
    assert f"gen_{base}_info.txt" in files
    # resume: second run skips everything
    cli.main()


def test_lora_merge_state_tracking(controller):
    rng = np.random.default_rng(0)
    import tempfile, safetensors.numpy
    d = WAN_TINY.dim
    sd = {"diffusion_model.blocks.0.self_attn.q.lora_A.weight":
          rng.standard_normal((2, d)).astype(np.float32) * 0.01,
          "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
          rng.standard_normal((d, 2)).astype(np.float32) * 0.01}
    with tempfile.NamedTemporaryFile(suffix=".safetensors") as f:
        safetensors.numpy.save_file(sd, f.name)
        before = np.asarray(
            controller.pipeline.dit_params["blocks"]["self_attn"]["q"]["kernel"])
        controller.ensure_lora(f.name)
        after = np.asarray(
            controller.pipeline.dit_params["blocks"]["self_attn"]["q"]["kernel"])
        assert np.abs(after - before).max() > 0
        controller.ensure_lora(None)  # unmerge all
        restored = np.asarray(
            controller.pipeline.dit_params["blocks"]["self_attn"]["q"]["kernel"])
        np.testing.assert_allclose(restored, before, atol=1e-6)


def test_comfyui_nodes(tiny_pipe):
    """The ComfyUI hook registers duck-typed nodes and runs an edit
    end-to-end on the tiny pipe (the reference's comfyui import is a
    dangling stub; ours is real)."""
    from videocof_tpu.comfyui import (NODE_CLASS_MAPPINGS,
                                      NODE_DISPLAY_NAME_MAPPINGS)
    assert set(NODE_CLASS_MAPPINGS) == set(NODE_DISPLAY_NAME_MAPPINGS)
    edit_cls = NODE_CLASS_MAPPINGS["VideoCoFEdit"]
    # node contract fields ComfyUI introspects
    assert edit_cls.RETURN_TYPES == ("IMAGE",)
    assert callable(getattr(edit_cls, edit_cls.FUNCTION))
    spec = edit_cls.INPUT_TYPES()
    assert "frames" in spec["required"] and "prompt" in spec["required"]

    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (9, 32, 32, 3)).astype(np.float32)
    (out,) = edit_cls().edit(tiny_pipe, frames, "remove the dog",
                             steps=1, guidance_scale=1.0, seed=3,
                             reasoning_frames=4)
    out = np.asarray(out)
    assert out.ndim == 4 and out.shape[-1] == 3
    assert out.shape[0] == 9            # edit segment matches source length
    assert 0.0 <= out.min() and out.max() <= 1.0

    loader = NODE_CLASS_MAPPINGS["VideoCoFModelLoader"]
    assert "quantize" in loader.INPUT_TYPES()["required"]


def test_cli_teaser_batch_mode(tiny_pipe, test_video, tmp_path, monkeypatch):
    """--test_json batch mode (the reference's teaser eval flow,
    `scripts/parallel_infer.sh`): per-item outputs named
    gen_{task}_{id}.mp4, idempotent re-run skips completed items."""
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli

    items = [
        {"task_type": "obj_rem", "sample_id": 1,
         "source_video_path": test_video,
         "edit_instruction": "remove the red ball"},
        {"task_type": "local_style", "sample_id": 2,
         "source_video_path": test_video,
         "edit_instruction": "make the scene look like a watercolor"},
    ]
    tj = str(tmp_path / "teaser.json")
    json.dump(items, open(tj, "w"))
    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--test_json", tj, "--output_dir", out_dir,
        "--source_frames", "9", "--reasoning_frames", "4", "--repeat_rope",
        "--random_init", "--num_inference_steps", "1"])
    cli.main()
    files = set(os.listdir(out_dir))
    assert {"gen_obj_rem_1.mp4", "gen_local_style_2.mp4"} <= files
    # idempotent batch re-run: nothing new is generated
    mtimes = {f: os.path.getmtime(os.path.join(out_dir, f)) for f in files}
    cli.main()
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, f)) == m


def test_cli_infer_standard_path_e2e(tiny_pipe, test_video, tmp_path,
                                     monkeypatch):
    """The 50-step standard CLI twin (reduced to 2 steps): CFG guidance,
    TeaCache flag plumbing, resume."""
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.infer as cli

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    out_dir = str(tmp_path / "out50")
    monkeypatch.setattr(sys, "argv", [
        "infer", "--video_path", test_video, "--prompt",
        "remove the red ball", "--output_dir", out_dir,
        "--source_frames", "9", "--reasoning_frames", "4", "--repeat_rope",
        "--random_init", "--num_inference_steps", "2",
        "--guidance_scale", "3.0", "--disable_teacache"])
    cli.main()
    base = os.path.splitext(os.path.basename(test_video))[0]
    files = sorted(os.listdir(out_dir))
    assert f"gen_{base}.mp4" in files
    # resume skips
    cli.main()


def test_http_api_reference_payload_fields(controller, test_video):
    """Fields a reference client sends beyond the basics are honored:
    negative_prompt_textbox, sampler_dropdown (reference names map to our
    scheduler keys)."""
    from videocof_tpu.serving.api import make_handler, ENDPOINT
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with open(test_video, "rb") as f:
            vid_b64 = base64.b64encode(f.read()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({
                "prompt_textbox": "remove the dog",
                "negative_prompt_textbox": "blurry, low quality",
                "sampler_dropdown": "Flow_DPM++",
                "source_video": vid_b64,
                "seed_textbox": 3,
                "sample_step_slider": 2,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.load(r)
        assert resp["message"] == "Success"
    finally:
        server.shutdown()


def test_healthz_degraded_on_stuck_generation(controller):
    """A generation running far past any legitimate compile (a wedged TPU
    tunnel blocks forever with no error) flips /healthz to 503 'degraded'
    so load balancers can route away."""
    import time
    from videocof_tpu.serving.api import make_handler, Metrics
    from http.server import ThreadingHTTPServer

    metrics = Metrics()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(controller, threading.Lock(),
                                       metrics))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        with metrics._lock:
            metrics.generating_since = time.time() - 99999
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                   timeout=30)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert json.load(e)["status"] == "degraded"
        with metrics._lock:
            metrics.generating_since = None
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics") as r:
            assert "videocof_generating_for_seconds 0.0" in r.read().decode()
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def moe_pipe():
    from videocof_tpu.pipeline import Wan22Pipeline
    DCFG = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                            text_dim=T5_TINY.dim)
    return Wan22Pipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY), VAE_TINY,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32,
        dit_params_2=wan_dit.init_wan_dit(jax.random.PRNGKey(4), DCFG),
        boundary=0.9)


def test_http_api_moe_generation(moe_pipe, test_video, tmp_path):
    """VERDICT r2 #7: a Wan2.2 MoE pipeline served through the HTTP API —
    the full knob set rides the payload: per-expert guidance
    (guidance_scale_2), TeaCache (enable_teacache/threshold/skip-start,
    reference field names `videox_fun/api/api.py:123-127`), cfg-skip, and a
    LoRA that the controller merges into BOTH experts."""
    import tempfile, safetensors.numpy
    from videocof_tpu.serving.api import make_handler, ENDPOINT
    from http.server import ThreadingHTTPServer

    controller = VideoCoFController(
        moe_pipe, model_name="Wan2.2-T2V-A14B",
        defaults=GenerationConfig(source_frames=9, reasoning_frames=4,
                                  num_inference_steps=4,
                                  guidance_scale=5.0))
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    d = WAN_TINY.dim
    sd = {"diffusion_model.blocks.0.self_attn.q.lora_A.weight":
          rng.standard_normal((2, d)).astype(np.float32) * 0.01,
          "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
          rng.standard_normal((d, 2)).astype(np.float32) * 0.01}
    lora_path = str(tmp_path / "adapter.safetensors")
    safetensors.numpy.save_file(sd, lora_path)

    try:
        with open(test_video, "rb") as f:
            vid_b64 = base64.b64encode(f.read()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({
                "prompt_textbox": "remove the dog",
                "source_video": vid_b64,
                "seed_textbox": 3,
                "sample_step_slider": 4,
                "cfg_scale_slider": 5.0,
                "guidance_scale_2": 3.0,
                "enable_teacache": True,
                "teacache_threshold": 0.1,
                "num_skip_start_steps": 0,
                "cfg_skip_ratio": 0.25,
                "cfg_sequential": True,
                "lora_model_path": lora_path,
                "lora_alpha_slider": 0.8,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.load(r)
        assert resp["message"] == "Success"
        assert len(base64.b64decode(resp["base64_encoding"])) > 100
        # the LoRA was merged into BOTH experts and is tracked
        assert controller._merged_loras == {lora_path: 0.8}
        # the sequential-CFG payload knob reached the pipeline
        assert controller.pipeline.cfg_sequential is True
        # ...and does NOT leak into a request that omits the key: the next
        # generation resets to the pipeline's construction-time default
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({
                "prompt_textbox": "remove the dog",
                "source_video": vid_b64,
                "seed_textbox": 3,
                "sample_step_slider": 2,
                "cfg_scale_slider": 1.0,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=600) as r:
            assert json.load(r)["message"] == "Success"
        assert controller.pipeline.cfg_sequential is False
    finally:
        controller.pipeline.cfg_sequential = False
        controller.ensure_lora(None)   # restore the shared fixture
        server.shutdown()


def test_http_api_t2v_generation(moe_pipe):
    """A `"t2v": true` payload generates from the prompt alone (no source
    video) through pipeline.text_to_video, with shape fields honored and
    per-expert guidance on the MoE pipeline."""
    from videocof_tpu.serving.api import make_handler, ENDPOINT
    from http.server import ThreadingHTTPServer

    controller = VideoCoFController(
        moe_pipe,
        defaults=GenerationConfig(num_inference_steps=2,
                                  guidance_scale=5.0))
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({
                "t2v": True,
                "prompt_textbox": "a red fox in the snow",
                "height": 32, "width": 32, "num_frames": 5,
                "seed_textbox": 3,
                "sample_step_slider": 2,
                "cfg_scale_slider": 5.0,
                "guidance_scale_2": 3.0,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.load(r)
        assert resp["message"] == "Success"
        assert len(base64.b64decode(resp["base64_encoding"])) > 100
    finally:
        server.shutdown()


def test_moe_lora_merges_both_experts(moe_pipe):
    """ensure_lora on a MoE pipeline mutates BOTH expert trees in lockstep
    and unmerge restores both (high-noise steps must never run un-adapted
    weights)."""
    import tempfile, safetensors.numpy
    controller = VideoCoFController(moe_pipe)
    rng = np.random.default_rng(7)
    d = WAN_TINY.dim
    sd = {"diffusion_model.blocks.0.self_attn.q.lora_A.weight":
          rng.standard_normal((2, d)).astype(np.float32) * 0.01,
          "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
          rng.standard_normal((d, 2)).astype(np.float32) * 0.01}
    with tempfile.NamedTemporaryFile(suffix=".safetensors") as f:
        safetensors.numpy.save_file(sd, f.name)
        key = lambda p: np.asarray(
            p["blocks"]["self_attn"]["q"]["kernel"])
        b1 = key(moe_pipe.dit_params)
        b2 = key(moe_pipe.dit_params_2)
        controller.ensure_lora(f.name)
        assert np.abs(key(moe_pipe.dit_params) - b1).max() > 0
        assert np.abs(key(moe_pipe.dit_params_2) - b2).max() > 0
        controller.ensure_lora(None)
        np.testing.assert_allclose(key(moe_pipe.dit_params), b1, atol=1e-6)
        np.testing.assert_allclose(key(moe_pipe.dit_params_2), b2,
                                   atol=1e-6)


def test_moe_model_switch_dual_dir(moe_pipe, tmp_path, monkeypatch):
    """The model-switch endpoint accepts a Wan2.2 dual-expert checkpoint
    dir (low_noise_model/ + high_noise_model/) and swaps BOTH experts; the
    factory recognizes the same layout (`is_wan22_moe_dir`)."""
    from videocof_tpu.factory import is_wan22_moe_dir
    from videocof_tpu.utils.checkpoint import save_dit_safetensors
    from videocof_tpu.serving.api import make_handler, UPDATE_ENDPOINT
    from http.server import ThreadingHTTPServer

    ckpt = tmp_path / "wan22"
    (ckpt / "low_noise_model").mkdir(parents=True)
    (ckpt / "high_noise_model").mkdir()
    assert not is_wan22_moe_dir(str(tmp_path))
    assert is_wan22_moe_dir(str(ckpt))

    orig1 = jax.tree.map(np.asarray, moe_pipe.dit_params)
    orig2 = jax.tree.map(np.asarray, moe_pipe.dit_params_2)
    save_dit_safetensors(
        str(ckpt / "low_noise_model" / "model.safetensors"),
        jax.tree.map(lambda a: a * 2.0, moe_pipe.dit_params),
        moe_pipe.dit_cfg)
    save_dit_safetensors(
        str(ckpt / "high_noise_model" / "model.safetensors"),
        jax.tree.map(lambda a: a * 3.0, moe_pipe.dit_params_2),
        moe_pipe.dit_cfg)

    controller = VideoCoFController(moe_pipe)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    monkeypatch.setenv("VIDEOCOF_MODEL_DIRS", str(tmp_path))
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{UPDATE_ENDPOINT}",
            data=json.dumps({"diffusion_transformer_path":
                             str(ckpt)}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.load(r)["message"] == "Success"
        np.testing.assert_allclose(
            np.asarray(moe_pipe.dit_params["text_mlp"]["fc1"]["kernel"]),
            2.0 * orig1["text_mlp"]["fc1"]["kernel"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(moe_pipe.dit_params_2["text_mlp"]["fc1"]["kernel"]),
            3.0 * orig2["text_mlp"]["fc1"]["kernel"], rtol=1e-6)
    finally:
        moe_pipe.dit_params = jax.tree.map(jnp.asarray, orig1)
        moe_pipe.dit_params_2 = jax.tree.map(jnp.asarray, orig2)
        server.shutdown()


def test_single_expert_swap_unmerges_lora_first(moe_pipe, tmp_path):
    """A single-expert weight swap on a MoE pipeline must leave the
    surviving high-noise expert PRISTINE: fused LoRA deltas are unmerged
    BEFORE the swap clears the merge tracker (otherwise dit_params_2 keeps
    the deltas forever and the next ensure_lora merges them a second
    time)."""
    import safetensors.numpy
    from videocof_tpu.utils.checkpoint import save_dit_safetensors

    controller = VideoCoFController(moe_pipe)
    orig1 = jax.tree.map(np.asarray, moe_pipe.dit_params)
    orig2 = jax.tree.map(np.asarray, moe_pipe.dit_params_2)
    key = lambda p: np.asarray(p["blocks"]["self_attn"]["q"]["kernel"])

    ck = tmp_path / "single_expert"
    ck.mkdir()
    save_dit_safetensors(
        str(ck / "model.safetensors"),
        jax.tree.map(lambda a: a * 2.0, moe_pipe.dit_params),
        moe_pipe.dit_cfg)

    rng = np.random.default_rng(7)
    d = WAN_TINY.dim
    sd = {"diffusion_model.blocks.0.self_attn.q.lora_A.weight":
          rng.standard_normal((2, d)).astype(np.float32) * 0.01,
          "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
          rng.standard_normal((d, 2)).astype(np.float32) * 0.01}
    lora_path = str(tmp_path / "adapter.safetensors")
    safetensors.numpy.save_file(sd, lora_path)
    try:
        controller.ensure_lora(lora_path)
        assert np.abs(key(moe_pipe.dit_params_2) - key(orig2)).max() > 0
        controller.update_diffusion_transformer(str(ck))
        # swapped expert carries the new weights; surviving expert is
        # back to pristine (deltas unmerged, not orphaned)
        np.testing.assert_allclose(
            key(moe_pipe.dit_params), 2.0 * key(orig1), rtol=1e-6)
        np.testing.assert_allclose(key(moe_pipe.dit_params_2), key(orig2),
                                   atol=1e-6)
        assert controller._merged_loras == {}
    finally:
        moe_pipe.dit_params = jax.tree.map(jnp.asarray, orig1)
        moe_pipe.dit_params_2 = jax.tree.map(jnp.asarray, orig2)


def test_generate_t2v_resolves_teacache_alias():
    """generate_t2v applies the model_name -> TeaCache-coefficient alias
    the same way generate() does (it used to fall back to the 14b
    polynomial for every served t2v request)."""
    from videocof_tpu.models.teacache import get_teacache_coefficients
    captured = {}

    class FakeOut:
        videos = np.zeros((1, 3, 1, 8, 8), np.float32)
        ground_videos = None
        edit_videos = videos

    class FakePipe:
        cfg_sequential = False

        def text_to_video(self, prompt, **kw):
            captured.update(kw)
            return FakeOut()

    c = VideoCoFController(FakePipe(), model_name="Wan2.1-T2V-1.3B")
    c.generate_t2v("a fox", enable_teacache=True)
    want = get_teacache_coefficients("Wan2.1-T2V-1.3B")
    assert want is not None
    assert captured["teacache_coefficients"] == want


def test_webui_exposes_full_knob_set():
    """VERDICT r2 #9: the page reaches every feature its own API honors —
    LoRA path/weight, TeaCache toggle+threshold+skip-start, cfg-skip,
    sampler, negative prompt, per-expert guidance, model-switch."""
    from videocof_tpu.serving.webui import INDEX_HTML
    for field in ("lora_model_path", "lora_alpha_slider", "enable_teacache",
                  "teacache_threshold", "num_skip_start_steps",
                  "cfg_skip_ratio", "sampler_dropdown",
                  "negative_prompt_textbox", "guidance_scale_2",
                  "update_diffusion_transformer", "Flow_Unipc",
                  "Flow_DPM++"):
        assert field in INDEX_HTML, field


def test_http_api_update_diffusion_transformer(controller, tmp_path,
                                               monkeypatch):
    """Model-switch endpoint twin of `videox_fun/api/api.py:23-39`:
    hot-swaps the resident DiT weights from an allowlisted checkpoint path,
    clears the LoRA merge state, no-ops on 'none', and refuses paths
    outside VIDEOCOF_MODEL_DIRS."""
    from videocof_tpu.serving.api import (make_handler, UPDATE_ENDPOINT,
                                          LEGACY_UPDATE_ENDPOINT)
    from videocof_tpu.utils.checkpoint import save_dit_safetensors
    from http.server import ThreadingHTTPServer

    pipe = controller.pipeline
    orig = pipe.dit_params
    # the swap DELETES the old device buffers (HBM headroom for the 14B
    # deployment) — snapshot reference values to host first
    orig_host = jax.tree.map(np.asarray, orig)
    scaled = jax.tree.map(lambda a: a * 2.0, orig)
    ckpt = str(tmp_path / "dit_v2.safetensors")
    save_dit_safetensors(ckpt, scaled, pipe.dit_cfg)

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(endpoint, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{endpoint}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, json.load(r)
        except urllib.error.HTTPError as e:
            return e.code, json.load(e)

    try:
        # not allowlisted -> 403, weights untouched
        monkeypatch.delenv("VIDEOCOF_MODEL_DIRS", raising=False)
        code, out = post(UPDATE_ENDPOINT,
                         {"diffusion_transformer_path": ckpt})
        assert code == 403
        assert pipe.dit_params is orig

        # allowlisted -> Success, weights swapped, LoRA state cleared
        monkeypatch.setenv("VIDEOCOF_MODEL_DIRS", str(tmp_path))
        controller._merged_loras["stale"] = 1.0
        code, out = post(LEGACY_UPDATE_ENDPOINT,
                         {"diffusion_transformer_path": ckpt})
        assert code == 200 and out["message"] == "Success"
        assert controller._merged_loras == {}
        np.testing.assert_allclose(
            np.asarray(pipe.dit_params["text_mlp"]["fc1"]["kernel"]),
            2.0 * orig_host["text_mlp"]["fc1"]["kernel"],
            rtol=1e-6)
        # the OLD device tree was released (no transient 2x HBM hold)
        assert all(leaf.is_deleted() for leaf in jax.tree.leaves(orig)
                   if isinstance(leaf, jax.Array))

        # 'none' / missing field is a no-op Success (reference default)
        swapped = pipe.dit_params
        code, out = post(UPDATE_ENDPOINT, {})
        assert code == 200 and out["message"] == "Success"
        assert pipe.dit_params is swapped

        # unreadable checkpoint inside the allowlist -> reference-style
        # 200 "Error. error information is ..." reply
        code, out = post(UPDATE_ENDPOINT,
                         {"diffusion_transformer_path":
                          str(tmp_path / "missing.safetensors")})
        assert code == 200 and out["message"].startswith("Error.")
    finally:
        pipe.dit_params = jax.tree.map(jnp.asarray, orig_host)
        controller._merged_loras.clear()
        server.shutdown()


# ------------------------------------------------- non-Wan family serving

def test_family_detection(tmp_path):
    """factory.detect_family reads diffusers config.json _class_name at the
    dir root or under transformer/; Wan dirs (no diffusers config) and
    plain files stay 'wan'."""
    from videocof_tpu.factory import detect_family
    assert detect_family("") == "wan"
    assert detect_family(str(tmp_path / "nope")) == "wan"
    d = tmp_path / "cog"
    d.mkdir()
    (d / "config.json").write_text(
        json.dumps({"_class_name": "CogVideoXTransformer3DModel"}))
    assert detect_family(str(d)) == "cogvideox"
    d2 = tmp_path / "flux"
    (d2 / "transformer").mkdir(parents=True)
    (d2 / "transformer" / "config.json").write_text(
        json.dumps({"_class_name": "FluxTransformer2DModel"}))
    assert detect_family(str(d2)) == "flux"
    d3 = tmp_path / "wanlike"
    d3.mkdir()
    (d3 / "config.json").write_text(json.dumps({"_class_name": "Other"}))
    assert detect_family(str(d3)) == "wan"


@pytest.fixture(scope="module")
def cog_controller():
    from videocof_tpu.models import cogvideox as cog
    from videocof_tpu.models import cogvideox_vae as cvae
    from videocof_tpu.pipeline import CogVideoXPipeline
    dcfg = cog.COGVIDEOX_TINY.replace(use_rotary_positional_embeddings=True)
    vcfg = cvae.COGVIDEOX_VAE_TINY
    pipe = CogVideoXPipeline(
        cog.init_cogvideox(jax.random.PRNGKey(0), dcfg), dcfg,
        cvae.init_cogvideox_vae(jax.random.PRNGKey(1), vcfg), vcfg)
    return VideoCoFController(pipe)


def test_family_controller_generate_media(cog_controller):
    assert cog_controller.family == "cogvideox"
    rng = np.random.default_rng(0)
    txt = rng.standard_normal(
        (1, 8, cog_controller.pipeline.dit_cfg.text_embed_dim)
    ).astype(np.float32)
    out = cog_controller.generate_media(
        txt, negative_embeddings=np.zeros_like(txt), height=16, width=16,
        num_frames=9, num_inference_steps=2, guidance_scale=6.0, seed=3)
    assert out["videos"].shape == (1, 3, 9, 16, 16)
    assert np.isfinite(out["videos"]).all()
    # a Wan controller refuses the media surface
    with pytest.raises(RuntimeError):
        VideoCoFController(object()).generate_media(txt)


def test_family_http_generate(cog_controller, tmp_path, monkeypatch):
    """VERDICT r3 #7: generate through CogVideoX over HTTP — embeddings-in
    contract, base64 mp4 out; .npz embeddings_path honors the asset
    allowlist."""
    import io
    pytest.importorskip("cv2")
    from http.server import ThreadingHTTPServer
    from videocof_tpu.serving.api import ENDPOINT, make_handler

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(cog_controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(payload, timeout=600):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, json.load(r)
        except urllib.error.HTTPError as e:
            return e.code, json.load(e)

    rng = np.random.default_rng(1)
    txt = rng.standard_normal(
        (1, 8, cog_controller.pipeline.dit_cfg.text_embed_dim)
    ).astype(np.float32)

    def b64_npy(a):
        buf = io.BytesIO()
        np.save(buf, a, allow_pickle=False)
        return base64.b64encode(buf.getvalue()).decode()

    try:
        # inline base64 .npy embeddings -> mp4 out
        code, out = post({
            "text_embeddings": b64_npy(txt),
            "negative_embeddings": b64_npy(np.zeros_like(txt)),
            "height": 16, "width": 16, "num_frames": 9,
            "sample_step_slider": 2, "cfg_scale_slider": 6.0,
            "seed_textbox": 3})
        assert code == 200 and out["message"] == "Success", out
        assert out["family"] == "cogvideox"
        assert len(base64.b64decode(out["base64_encoding"])) > 100

        # missing embeddings -> 400
        code, out = post({"height": 16})
        assert code == 400

        # embeddings_path outside the allowlist -> 403
        npz = str(tmp_path / "emb.npz")
        np.savez(npz, text_embeddings=txt,
                 negative_embeddings=np.zeros_like(txt))
        monkeypatch.delenv("VIDEOCOF_ASSET_DIRS", raising=False)
        code, out = post({"embeddings_path": npz, "height": 16,
                          "width": 16, "num_frames": 9,
                          "sample_step_slider": 2})
        assert code == 403

        # allowlisted .npz path -> Success
        monkeypatch.setenv("VIDEOCOF_ASSET_DIRS", str(tmp_path))
        code, out = post({"embeddings_path": npz, "height": 16,
                          "width": 16, "num_frames": 9,
                          "sample_step_slider": 2, "cfg_scale_slider": 6.0})
        assert code == 200 and out["message"] == "Success", out
        assert len(base64.b64decode(out["base64_encoding"])) > 100
    finally:
        server.shutdown()


def test_family_switch_via_controller(tmp_path):
    """Cross-family model switch: a Wan controller pointed at a diffusers
    Flux checkpoint dir rebuilds the pipeline through the factory (and
    releases the old DiT device tree)."""
    safetensors = pytest.importorskip("safetensors")
    from safetensors.numpy import save_file
    from videocof_tpu.models import flux as flux_lib

    DCFG = WAN_TINY.replace(in_dim=VAE_TINY.z_dim, out_dim=VAE_TINY.z_dim,
                            text_dim=T5_TINY.dim)
    pipe = WanPipeline(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), DCFG), DCFG,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), VAE_TINY), VAE_TINY,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        dtype=jnp.float32)
    old_params = pipe.dit_params
    controller = VideoCoFController(pipe)
    assert controller.family == "wan"

    # tiny Flux checkpoint dir (key layout from test_family_loaders)
    cfg0 = flux_lib.FLUX_TINY
    rng = np.random.default_rng(1)
    d = cfg0.inner_dim

    def lin(din, dout):
        return rng.standard_normal((dout, din)).astype(np.float32)

    def vec(n):
        return rng.standard_normal(n).astype(np.float32)

    sd = {
        "x_embedder.weight": lin(cfg0.in_channels, d),
        "x_embedder.bias": vec(d),
        "context_embedder.weight": lin(cfg0.joint_attention_dim, d),
        "context_embedder.bias": vec(d),
        "time_text_embed.timestep_embedder.linear_1.weight": lin(256, d),
        "time_text_embed.timestep_embedder.linear_1.bias": vec(d),
        "time_text_embed.timestep_embedder.linear_2.weight": lin(d, d),
        "time_text_embed.timestep_embedder.linear_2.bias": vec(d),
        "time_text_embed.text_embedder.linear_1.weight":
            lin(cfg0.pooled_projection_dim, d),
        "time_text_embed.text_embedder.linear_1.bias": vec(d),
        "time_text_embed.text_embedder.linear_2.weight": lin(d, d),
        "time_text_embed.text_embedder.linear_2.bias": vec(d),
        "norm_out.linear.weight": lin(d, 2 * d),
        "norm_out.linear.bias": vec(2 * d),
        "proj_out.weight": lin(d, cfg0.out_channels),
        "proj_out.bias": vec(cfg0.out_channels),
    }
    hd = cfg0.attention_head_dim
    for i in range(cfg0.num_layers):
        pre = f"transformer_blocks.{i}"
        sd[f"{pre}.norm1.linear.weight"] = lin(d, 6 * d)
        sd[f"{pre}.norm1.linear.bias"] = vec(6 * d)
        sd[f"{pre}.norm1_context.linear.weight"] = lin(d, 6 * d)
        sd[f"{pre}.norm1_context.linear.bias"] = vec(6 * d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            sd[f"{pre}.attn.{nm}.weight"] = lin(d, d)
            sd[f"{pre}.attn.{nm}.bias"] = vec(d)
        sd[f"{pre}.attn.to_out.0.weight"] = lin(d, d)
        sd[f"{pre}.attn.to_out.0.bias"] = vec(d)
        sd[f"{pre}.attn.to_add_out.weight"] = lin(d, d)
        sd[f"{pre}.attn.to_add_out.bias"] = vec(d)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{pre}.attn.{nm}.weight"] = vec(hd)
        for ff in ("ff", "ff_context"):
            sd[f"{pre}.{ff}.net.0.proj.weight"] = lin(d, 4 * d)
            sd[f"{pre}.{ff}.net.0.proj.bias"] = vec(4 * d)
            sd[f"{pre}.{ff}.net.2.weight"] = lin(4 * d, d)
            sd[f"{pre}.{ff}.net.2.bias"] = vec(d)
    for i in range(cfg0.num_single_layers):
        pre = f"single_transformer_blocks.{i}"
        sd[f"{pre}.norm.linear.weight"] = lin(d, 3 * d)
        sd[f"{pre}.norm.linear.bias"] = vec(3 * d)
        for nm in ("to_q", "to_k", "to_v"):
            sd[f"{pre}.attn.{nm}.weight"] = lin(d, d)
            sd[f"{pre}.attn.{nm}.bias"] = vec(d)
        for nm in ("norm_q", "norm_k"):
            sd[f"{pre}.attn.{nm}.weight"] = vec(hd)
        sd[f"{pre}.proj_mlp.weight"] = lin(d, 4 * d)
        sd[f"{pre}.proj_mlp.bias"] = vec(4 * d)
        sd[f"{pre}.proj_out.weight"] = lin(5 * d, d)
        sd[f"{pre}.proj_out.bias"] = vec(d)

    ckpt = tmp_path / "flux_ckpt"
    ckpt.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(ckpt / "diffusion_pytorch_model.safetensors"))
    (ckpt / "config.json").write_text(json.dumps({
        "_class_name": "FluxTransformer2DModel",
        "patch_size": cfg0.patch_size, "in_channels": cfg0.in_channels,
        "out_channels": None, "num_layers": cfg0.num_layers,
        "num_single_layers": cfg0.num_single_layers,
        "attention_head_dim": cfg0.attention_head_dim,
        "num_attention_heads": cfg0.num_attention_heads,
        "joint_attention_dim": cfg0.joint_attention_dim,
        "pooled_projection_dim": cfg0.pooled_projection_dim,
        "guidance_embeds": False,
        "axes_dims_rope": list(cfg0.axes_dims_rope)}))

    controller.update_diffusion_transformer(str(ckpt))
    assert controller.family == "flux"
    # old Wan DiT device buffers were released
    assert all(leaf.is_deleted() for leaf in jax.tree.leaves(old_params)
               if isinstance(leaf, jax.Array))
    # the switched pipeline generates (latents out: no VAE resident)
    rng2 = np.random.default_rng(2)
    txt = rng2.standard_normal(
        (1, 4, cfg0.joint_attention_dim)).astype(np.float32)
    pooled = rng2.standard_normal(
        (1, cfg0.pooled_projection_dim)).astype(np.float32)
    out = controller.generate_media(txt, pooled_projections=pooled,
                                    height=32, width=32,
                                    num_inference_steps=2, seed=0)
    assert out["images"].shape[0] == 1
    assert np.isfinite(out["images"]).all()


def test_cli_edit_with_i420_upload(tiny_pipe, tmp_path, monkeypatch):
    """VIDEOCOF_UPLOAD_YUV420=1 routes the CLI's source clip through the
    codec-native I420 loader (half the u8 RGB upload bytes); the pipeline
    upsamples chroma on device and the full edit + side-by-side outputs
    land."""
    cv2 = pytest.importorskip("cv2")
    import videocof_tpu.cli._common as common
    import videocof_tpu.cli.fast_infer as cli

    clip = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 12, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
    w.release()

    monkeypatch.setattr(common, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setattr(cli, "build_pipeline_from_args",
                        lambda args, dtype=None, **kw: tiny_pipe)
    monkeypatch.setenv("VIDEOCOF_UPLOAD_YUV420", "1")
    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "fast_infer", "--video_path", clip, "--prompt", "remove the cat",
        "--output_dir", out_dir, "--source_frames", "9",
        "--reasoning_frames", "4", "--random_init",
        "--num_inference_steps", "1"])
    cli.main()
    files = os.listdir(out_dir)
    assert "gen_clip.mp4" in files
    assert "gen_clip_compare.mp4" in files


def test_http_api_embeddings_payload_against_wan_is_clear_400(controller):
    """An embeddings-in (non-Wan family) payload posted while a Wan pipeline
    is resident must name the mismatch, not fail on missing video fields."""
    from videocof_tpu.serving.api import make_handler, ENDPOINT
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(controller, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}",
            data=json.dumps({"embeddings_path": "assets/embeds.npz",
                             "height": 32, "width": 32}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                code, out = r.status, json.load(r)
        except urllib.error.HTTPError as e:
            code, out = e.code, json.load(e)
        assert code == 400
        assert "resident pipeline is Wan" in out["message"]
    finally:
        server.shutdown()


@pytest.fixture()
def restore_dit_params(controller):
    """Family-switch tests delete the shared tiny pipe's DiT device buffers
    (_switch_family_pipeline frees the old tree to cap peak HBM); snapshot
    them and restore afterwards so later tests can still generate."""
    import jax
    import jax.numpy as jnp

    pipe = controller.pipeline
    snap = {a: jax.tree.map(np.asarray, getattr(pipe, a))
            for a in ("dit_params", "dit_params_2")
            if getattr(pipe, a, None) is not None}
    yield
    for a, tree in snap.items():
        setattr(pipe, a, jax.tree.map(jnp.asarray, tree))


def test_family_switch_back_to_wan_preserves_load_kwargs(controller,
                                                         monkeypatch,
                                                         tmp_path,
                                                         restore_dit_params):
    """A cross-family round trip (Wan -> CogVideoX -> Wan) must rebuild the
    Wan pipeline with its ORIGINAL load kwargs (quantize etc.): dropping
    them would reload a 14B fp8 deployment as bf16 and OOM the chip."""
    import videocof_tpu.factory as factory
    from videocof_tpu.pipeline.image_pipelines import CogVideoXPipeline

    controller.wan_load_kwargs = {"quantize": "fp8", "boundary": 0.9}
    wan_pipe = controller.pipeline
    fake_cog = object.__new__(CogVideoXPipeline)

    seen = {}
    monkeypatch.setattr(factory, "detect_family",
                        lambda p: "cogvideox" if "cog" in p else "wan")
    monkeypatch.setattr(
        factory, "load_family_pipeline",
        lambda path, dtype, family, quantize=None: (
            seen.setdefault("fam", family),
            seen.setdefault("fam_quantize", quantize),
            fake_cog)[2])
    monkeypatch.setattr(
        factory, "load_pipeline",
        lambda path, dtype, **kw: (seen.setdefault("wan_kw", kw),
                                   wan_pipe)[1])
    monkeypatch.setenv("VIDEOCOF_MODEL_DIRS", str(tmp_path))

    cog_dir = tmp_path / "cog_model"
    wan_dir = tmp_path / "wan_model"
    cog_dir.mkdir(), wan_dir.mkdir()

    controller.update_diffusion_transformer(str(cog_dir))
    assert controller.family == "cogvideox" and seen["fam"] == "cogvideox"
    # the deployment-level quantize intent rides the cross-family switch
    assert seen["fam_quantize"] == "fp8"
    controller.update_diffusion_transformer(str(wan_dir))
    assert controller.pipeline is wan_pipe
    assert seen["wan_kw"] == {"quantize": "fp8", "boundary": 0.9}


def test_concurrent_requests_serialize_on_busy_lock(controller, test_video,
                                                    monkeypatch):
    """Two simultaneous infer_forward POSTs against ONE resident pipeline:
    the per-chip busy lock serializes the generations (never >1 in flight),
    both succeed, and /metrics counts are consistent afterwards."""
    import time as _t

    from videocof_tpu.serving.api import ENDPOINT, Metrics, make_handler
    from http.server import ThreadingHTTPServer

    metrics = Metrics()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(controller, threading.Lock(),
                                       metrics))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    active, max_active = [0], [0]
    orig = controller.generate

    def tracked(*a, **kw):
        active[0] += 1
        max_active[0] = max(max_active[0], active[0])
        try:
            _t.sleep(0.3)       # widen any would-be overlap window
            return orig(*a, **kw)
        finally:
            active[0] -= 1

    monkeypatch.setattr(controller, "generate", tracked)

    with open(test_video, "rb") as f:
        vid_b64 = base64.b64encode(f.read()).decode()
    payload = json.dumps({"prompt_textbox": "remove the dog",
                          "source_video": vid_b64, "seed_textbox": 3,
                          "sample_step_slider": 2}).encode()

    results = [None, None]

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{ENDPOINT}", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            results[i] = json.load(r)

    try:
        threads = [threading.Thread(target=post, args=(i,)) for i in (0, 1)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert all(r and r["message"] == "Success" for r in results)
        assert max_active[0] == 1, "generations overlapped past the lock"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics") as r:
            text = r.read().decode()
        assert "videocof_requests_total 2" in text
        assert "videocof_generate_seconds_count 2" in text
        assert "videocof_failures_total 0" in text
        assert "videocof_busy 0" in text
    finally:
        server.shutdown()


def test_inferred_quantize_scoped_to_families_that_need_it(
        controller, monkeypatch, tmp_path, restore_dit_params):
    """Quantization INFERRED from the resident Wan params (no explicit
    --quantize) must NOT silently downgrade a CogVideoX-class load that
    fits bf16, must carry to Flux-dev-class targets, and must survive the
    Wan round-trip (advisor round-4 finding)."""
    import videocof_tpu.factory as factory
    from videocof_tpu.pipeline.image_pipelines import (CogVideoXPipeline,
                                                       FluxPipeline)
    from videocof_tpu.serving.controller import VideoCoFController

    controller.wan_load_kwargs = {}      # no explicit --quantize
    controller._inferred_quantize = None
    wan_pipe = controller.pipeline
    monkeypatch.setattr(VideoCoFController, "_params_quantized",
                        lambda self: True)

    def fam_of(p):
        for f in ("cog", "flux"):
            if f in p:
                return {"cog": "cogvideox", "flux": "flux"}[f]
        return "wan"

    seen = {}
    fakes = {"cogvideox": object.__new__(CogVideoXPipeline),
             "flux": object.__new__(FluxPipeline)}
    monkeypatch.setattr(factory, "detect_family", fam_of)
    monkeypatch.setattr(
        factory, "load_family_pipeline",
        lambda path, dtype, family, quantize=None: (
            seen.__setitem__(family, quantize), fakes[family])[1])
    monkeypatch.setattr(
        factory, "load_pipeline",
        lambda path, dtype, **kw: (seen.__setitem__("wan_kw", kw),
                                   wan_pipe)[1])
    monkeypatch.setenv("VIDEOCOF_MODEL_DIRS", str(tmp_path))
    for d in ("cog_m", "flux_m", "wan_m"):
        (tmp_path / d).mkdir()

    controller.update_diffusion_transformer(str(tmp_path / "cog_m"))
    assert seen["cogvideox"] is None         # bf16-fitting family: no fp8
    controller.update_diffusion_transformer(str(tmp_path / "flux_m"))
    assert seen["flux"] == "fp8"             # 12B-class: inferred fp8 rides
    controller.update_diffusion_transformer(str(tmp_path / "wan_m"))
    assert seen["wan_kw"] == {"quantize": "fp8"}  # round-trip stays fp8


def test_wan22_uint8_input_matches_float(moe_pipe):
    """Wan22Pipeline must route uint8 video through the fused in-program
    prep (convert deferred) and equal the prenormalized float path — the
    MoE __call__ used to eagerly convert, silently bypassing the
    one-program u8 prep."""
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (1, 3, 9, 32, 32), dtype=np.uint8)
    f32 = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    kw = dict(source_frames=9, reasoning_frames=4, num_inference_steps=2,
              seed=3)
    a = moe_pipe(f32, "remove the box", **kw)
    b = moe_pipe(u8, "remove the box", **kw)
    np.testing.assert_allclose(a.videos, b.videos, atol=2e-2)
