"""Camera adapter model + WorkerPool serving fan-out (the two modules that
had no direct tests)."""

import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ camera adapter

def test_camera_adapter_shapes_and_grid_alignment():
    """Plücker-ray maps [B, 24, F, H, W] -> features on the DiT patch grid
    (8x pixel-unshuffle then stride-2 conv = /16 spatial, the (2,2) patch
    over /8 latents)."""
    from videocof_tpu.models import camera_adapter as ca

    params = ca.init_camera_adapter(jax.random.PRNGKey(0), in_dim=24,
                                    out_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 3, 64, 96))
    y = ca.camera_adapter_forward(params, x)
    assert y.shape == (2, 64, 3, 4, 6)   # 64/8/2, 96/8/2
    assert np.isfinite(np.asarray(y)).all()
    # frames are processed independently (per-frame 2D convs)
    y0 = ca.camera_adapter_forward(params, x[:, :, :1])
    np.testing.assert_allclose(np.asarray(y[:, :, :1]), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_pixel_unshuffle_matches_torch_layout():
    torch = pytest.importorskip("torch")
    from videocof_tpu.models.camera_adapter import pixel_unshuffle

    x = np.random.default_rng(0).standard_normal((2, 3, 8, 12)
                                                 ).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 4))
    ref = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 4).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_y_camera_hook_changes_dit_output():
    """The y_camera features add onto the patch embeddings
    (`wan_transformer3d.py:871-874`); supplying them must change the
    forward, and zero features must be a no-op."""
    from videocof_tpu.configs import WAN_TINY
    from videocof_tpu.models import wan_dit

    cfg = WAN_TINY
    params = wan_dit.init_wan_dit(jax.random.PRNGKey(0), cfg, jnp.float32)
    f, h, w = 3, 2, 2
    pt, ph, pw = cfg.patch_size
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.in_dim, f * pt, h * ph, w * pw))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_len, cfg.text_dim))
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w))
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    base, _ = wan_dit.wan_dit_forward_with_residual(
        params, cfg, x, t, ctx, cos, sin)
    cam = jax.random.normal(jax.random.PRNGKey(3),
                            (1, cfg.dim, f, h, w)) * 0.1
    with_cam, _ = wan_dit.wan_dit_forward_with_residual(
        params, cfg, x, t, ctx, cos, sin, y_camera=cam)
    assert np.abs(np.asarray(with_cam) - np.asarray(base)).max() > 1e-5
    zero, _ = wan_dit.wan_dit_forward_with_residual(
        params, cfg, x, t, ctx, cos, sin, y_camera=jnp.zeros_like(cam))
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------- WorkerPool

def _stub_server(fail_first: int = 0):
    """Minimal serving.api lookalike: counts requests, optionally fails the
    first N with 500, echoes the prompt."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"n": 0, "fails_left": fail_first, "lock": threading.Lock()}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = json.dumps({"status": "ok"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            with state["lock"]:
                state["n"] += 1
                fail = state["fails_left"] > 0
                if fail:
                    state["fails_left"] -= 1
            code = 500 if fail else 200
            body = json.dumps({"message": "err" if fail else "Success",
                               "prompt": req.get("prompt_textbox")}).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state


def test_worker_pool_fanout_retry_and_health():
    from videocof_tpu.serving.multihost import WorkerPool

    s1, st1 = _stub_server()
    s2, st2 = _stub_server(fail_first=1)   # first request 500s, then heals
    try:
        eps = [f"http://127.0.0.1:{s1.server_address[1]}",
               f"http://127.0.0.1:{s2.server_address[1]}"]
        pool = WorkerPool(eps, timeout=30, max_retries=2)
        assert sorted(pool.healthy()) == sorted(eps)

        payloads = [{"prompt_textbox": f"p{i}"} for i in range(6)]
        out = pool.map(payloads)
        assert [o["message"] for o in out] == ["Success"] * 6
        # results land at their payload indices regardless of which worker
        # served them
        assert [o["prompt"] for o in out] == [f"p{i}" for i in range(6)]
        # both workers actually served requests; the transient 500 was
        # retried on the same worker
        assert st1["n"] >= 1 and st2["n"] >= 2
    finally:
        s1.shutdown()
        s2.shutdown()
