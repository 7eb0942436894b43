"""HTTP inference API — twin of the reference FastAPI endpoint
(`videox_fun/api/api.py:90-226`: ``POST /videox_fun/infer_forward`` json ->
controller.generate -> base64 mp4). Built on the stdlib http.server (this
image ships no fastapi/uvicorn); the endpoint path and payload contract
mirror the reference so clients port over unchanged.

Request json:
  {"prompt_textbox": str, "source_video": <base64 mp4> | "source_video_path":
   str, "seed_textbox": int, "sample_step_slider": int,
   "cfg_scale_slider": float, "source_frames": int, "reasoning_frames": int}
Response json:
  {"message": "Success", "prompt": str, "base64_encoding": <base64 mp4>}

Run:  python -m videocof_tpu.serving.api --random_init --port 8188
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .controller import VideoCoFController

ENDPOINT = "/videocof/infer_forward"
LEGACY_ENDPOINT = "/videox_fun/infer_forward"
# model-switch endpoint (`videox_fun/api/api.py:23-39`)
UPDATE_ENDPOINT = "/videocof/update_diffusion_transformer"
LEGACY_UPDATE_ENDPOINT = "/videox_fun/update_diffusion_transformer"
MAX_BODY_BYTES = int(os.environ.get("VIDEOCOF_MAX_BODY_BYTES",
                                    512 * 1024 * 1024))


class Metrics:
    """Process-wide serving counters, exported in Prometheus text format at
    GET /metrics (the reference has no metrics surface; production serving
    needs one)."""

    def __init__(self):
        import time
        self._lock = threading.Lock()
        self.started = time.time()
        self.requests_total = 0
        self.failures_total = 0
        self.busy = 0                     # generations in flight or queued
        self.generating_since = None      # wall time the running gen began
        self.generate_seconds_sum = 0.0
        self.generate_seconds_count = 0

    def stuck_seconds(self) -> float:
        """How long the current generation has been running (0 if idle).
        A dead TPU tunnel blocks the first dispatch forever at 0% CPU with
        no error (observed); load balancers should watch /healthz for the
        'degraded' status this feeds."""
        import time
        with self._lock:
            t0 = self.generating_since
        return 0.0 if t0 is None else time.time() - t0

    def observe(self, seconds: float, ok: bool):
        with self._lock:
            self.requests_total += 1
            if not ok:
                self.failures_total += 1
            else:
                self.generate_seconds_sum += seconds
                self.generate_seconds_count += 1

    def render(self) -> str:
        import time
        with self._lock:
            lines = [
                "# TYPE videocof_requests_total counter",
                f"videocof_requests_total {self.requests_total}",
                "# TYPE videocof_failures_total counter",
                f"videocof_failures_total {self.failures_total}",
                "# TYPE videocof_busy gauge",
                f"videocof_busy {self.busy}",
                "# TYPE videocof_generate_seconds summary",
                f"videocof_generate_seconds_sum "
                f"{self.generate_seconds_sum:.3f}",
                f"videocof_generate_seconds_count "
                f"{self.generate_seconds_count}",
                "# TYPE videocof_uptime_seconds gauge",
                f"videocof_uptime_seconds {time.time() - self.started:.1f}",
                "# TYPE videocof_generating_for_seconds gauge",
                f"videocof_generating_for_seconds "
                f"{0.0 if self.generating_since is None else time.time() - self.generating_since:.1f}",
            ]
        return "\n".join(lines) + "\n"


def _allowed_roots():
    """Directories the API may read ``source_video_path`` from. Defaults to
    the repo's assets/ and the working directory's assets/; extend with
    VIDEOCOF_ASSET_DIRS (os.pathsep separated)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # NOTE: no tempdir here — uploaded videos reach the controller through
    # kwargs['video_path'] internally, and a world-writable /tmp in the
    # CLIENT-visible allowlist would let any peer read files staged there
    roots = [os.path.join(here, "assets"),
             os.path.join(os.getcwd(), "assets")]
    roots += os.environ.get("VIDEOCOF_ASSET_DIRS", "").split(os.pathsep)
    return roots


def _model_roots():
    """Directories the model-switch endpoint may load checkpoints from.
    EMPTY by default — remote weight swapping is disabled until the operator
    opts in via VIDEOCOF_MODEL_DIRS (os.pathsep separated). The reference
    exposes the endpoint unrestricted (`videox_fun/api/api.py:23-39`); an
    unauthenticated remote surface that re-points the resident weights at an
    arbitrary server-side path needs an explicit allowlist here."""
    dirs = os.environ.get("VIDEOCOF_MODEL_DIRS", "")
    return [d for d in dirs.split(os.pathsep) if d]


def make_handler(controller: VideoCoFController, lock: threading.Lock,
                 metrics: Metrics = None):
    metrics = metrics or Metrics()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print("[api]", fmt % args, file=sys.stderr)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                stuck = metrics.stuck_seconds()
                limit = float(os.environ.get("VIDEOCOF_STUCK_AFTER",
                                             "1800"))
                if stuck > limit:
                    # a generation has been running far beyond any legit
                    # compile: likely a wedged device transport
                    self._reply(503, {"status": "degraded",
                                      "generating_for_s": round(stuck, 1)})
                else:
                    self._reply(200, {"status": "ok",
                                      "generating_for_s": round(stuck, 1)})
            elif self.path == "/metrics":
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path in ("/", "/index.html"):
                from .webui import INDEX_HTML
                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"message": "not found"})

        def _update_transformer(self):
            """Model-switch endpoint twin (`videox_fun/api/api.py:23-39`):
            body {"diffusion_transformer_path": ...} hot-swaps the DiT
            weights. Reference reply contract: 200 with "Success" or
            "Error. error information is ..."; path 'none' is a no-op."""
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > MAX_BODY_BYTES:
                    self._reply(413, {"message": "request body too large"})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                self._reply(400, {"message": f"bad request: {e}"})
                return
            path = req.get("diffusion_transformer_path", "none")
            if path and path != "none":
                real = os.path.realpath(str(path))
                roots = [os.path.realpath(r) for r in _model_roots()]
                if not any(real == r or real.startswith(r + os.sep)
                           for r in roots):
                    self._reply(403, {"message":
                                      "diffusion_transformer_path outside "
                                      "VIDEOCOF_MODEL_DIRS (remote weight "
                                      "swap requires an operator allowlist)"})
                    return
                path = real
            try:
                with lock:  # weight swap excludes in-flight generations
                    controller.update_diffusion_transformer(path)
                self._reply(200, {"message": "Success"})
            except Exception as e:
                import traceback
                traceback.print_exc()
                self._reply(200, {"message":
                                  f"Error. error information is {e}"})

        def _infer_media(self, req: dict, t0: float):
            """Generation for the non-Wan families (controller.family is
            'cogvideox' / 'flux' / 'qwenimage'). Text embeddings arrive
            PRECOMPUTED — base64 .npy fields (``text_embeddings``,
            ``negative_embeddings``, ``pooled_projections``) or an
            allowlisted server-side ``embeddings_path`` .npz with those
            keys. Replies: ``base64_encoding`` (mp4) for video output,
            ``base64_image`` (png) for decoded images, ``base64_latents``
            (.npy) when no VAE decoder is resident."""
            import io as _io
            import time as _time

            import numpy as np

            def _np_b64(s):
                return np.load(_io.BytesIO(base64.b64decode(s)),
                               allow_pickle=False)

            try:
                emb = neg = pooled = None
                if req.get("embeddings_path"):
                    path = os.path.realpath(req["embeddings_path"])
                    roots = [os.path.realpath(r)
                             for r in _allowed_roots() if r]
                    if not any(path == r or path.startswith(r + os.sep)
                               for r in roots):
                        metrics.observe(0.0, ok=False)
                        self._reply(403, {"message":
                                          "embeddings_path outside the "
                                          "allowed asset directories"})
                        return
                    with np.load(path, allow_pickle=False) as z:
                        emb = z["text_embeddings"]
                        neg = (z["negative_embeddings"]
                               if "negative_embeddings" in z else None)
                        pooled = (z["pooled_projections"]
                                  if "pooled_projections" in z else None)
                if req.get("text_embeddings"):
                    emb = _np_b64(req["text_embeddings"])
                if req.get("negative_embeddings"):
                    neg = _np_b64(req["negative_embeddings"])
                if req.get("pooled_projections"):
                    pooled = _np_b64(req["pooled_projections"])
                if emb is None:
                    metrics.observe(0.0, ok=False)
                    self._reply(400, {"message":
                                      "missing text_embeddings (base64 "
                                      ".npy) or embeddings_path (.npz)"})
                    return
                kwargs = dict(
                    text_embeddings=emb, negative_embeddings=neg,
                    seed=int(req.get("seed_textbox", 0)),
                    num_inference_steps=int(req["sample_step_slider"])
                    if "sample_step_slider" in req else None,
                    guidance_scale=float(req["cfg_scale_slider"])
                    if "cfg_scale_slider" in req else None,
                )
                if controller.family == "flux":
                    kwargs["pooled_projections"] = pooled
                for k in ("height", "width"):
                    if k in req:
                        kwargs[k] = int(req[k])
                if controller.family == "cogvideox":
                    if "num_frames" in req:
                        kwargs["num_frames"] = int(req["num_frames"])
                    if "sampler_dropdown" in req:
                        kwargs["scheduler"] = "ddim"  # only DDIM is served
                with metrics._lock:
                    metrics.busy += 1
                try:
                    with lock:
                        with metrics._lock:
                            metrics.generating_since = _time.time()
                        try:
                            result = controller.generate_media(**kwargs)
                        finally:
                            with metrics._lock:
                                metrics.generating_since = None
                finally:
                    with metrics._lock:
                        metrics.busy -= 1
                reply = {"message": "Success",
                         "family": controller.family}
                if result.get("videos") is not None:
                    reply["base64_encoding"] = \
                        controller.encode_video_base64(result["videos"])
                else:
                    img = np.asarray(result["images"])
                    if img.ndim >= 3 and img.shape[-3] == 3:
                        reply["base64_image"] = \
                            controller.encode_image_base64(img)
                    else:     # undecoded latents (no resident VAE)
                        reply["base64_latents"] = \
                            controller.encode_array_base64(img)
                metrics.observe(_time.time() - t0, ok=True)
                self._reply(200, reply)
            except Exception as e:
                import traceback
                traceback.print_exc()
                metrics.observe(_time.time() - t0, ok=False)
                self._reply(500, {"message": f"error: {e}"})

        def do_POST(self):
            if self.path in (UPDATE_ENDPOINT, LEGACY_UPDATE_ENDPOINT):
                self._update_transformer()
                return
            if self.path not in (ENDPOINT, LEGACY_ENDPOINT):
                self._reply(404, {"message": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > MAX_BODY_BYTES:
                    self._reply(413, {"message": "request body too large "
                                      f"({n} > {MAX_BODY_BYTES} bytes)"})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                self._reply(400, {"message": f"bad request: {e}"})
                return
            import time as _time
            t0 = _time.time()
            if controller.family != "wan":
                # CogVideoX / Flux / QwenImage: embeddings-in contract
                self._infer_media(req, t0)
                return
            if req.get("embeddings_path") or req.get("text_embeddings"):
                # embeddings-in payload against a Wan pipeline: the Wan
                # handler would ignore those fields and fail confusingly on
                # the missing video/prompt — name the real mismatch instead
                self._reply(400, {"message": "embeddings-in payload but the "
                                  "resident pipeline is Wan; switch to a "
                                  "CogVideoX/Flux/QwenImage checkpoint via "
                                  "update_diffusion_transformer first"})
                return
            tmp = None
            try:
                kwargs = dict(
                    prompt=req.get("prompt_textbox", ""),
                    seed=int(req.get("seed_textbox", 0)),
                    num_inference_steps=int(req["sample_step_slider"])
                    if "sample_step_slider" in req else None,
                    guidance_scale=float(req["cfg_scale_slider"])
                    if "cfg_scale_slider" in req else None,
                    source_frames=req.get("source_frames"),
                    reasoning_frames=req.get("reasoning_frames"),
                    negative_prompt=req.get("negative_prompt_textbox"),
                )
                # reference sampler_dropdown names -> our scheduler keys
                # ('Flow_Unipc' / 'Flow_DPM++' / 'Flow' / 'Euler')
                if req.get("sampler_dropdown"):
                    s = str(req["sampler_dropdown"]).lower()
                    kwargs["sampler"] = ("unipc" if "unipc" in s
                                         else "dpm++" if "dpm" in s
                                         else "euler")
                # TeaCache / cfg-skip knobs, reference API field names
                # (`videox_fun/api/api.py:123-127`)
                if "enable_teacache" in req:
                    kwargs["enable_teacache"] = bool(req["enable_teacache"])
                if "teacache_threshold" in req:
                    kwargs["teacache_threshold"] = float(
                        req["teacache_threshold"])
                if "num_skip_start_steps" in req:
                    kwargs["teacache_skip_start_steps"] = int(
                        req["num_skip_start_steps"])
                if "cfg_skip_ratio" in req:
                    kwargs["cfg_skip_ratio"] = float(req["cfg_skip_ratio"])
                # sequential CFG (two batch-1 dispatches; the HBM-tight 14B
                # deployment mode) — the controller applies it under the
                # generation lock
                if "cfg_sequential" in req:
                    kwargs["cfg_sequential"] = bool(req["cfg_sequential"])
                # MoE-only knob: per-expert guidance for the high-noise
                # phase (`pipeline_wan2_2.py:552-553`)
                if ("guidance_scale_2" in req and
                        getattr(controller.pipeline, "dit_params_2",
                                None) is not None):
                    kwargs["guidance_scale_2"] = float(
                        req["guidance_scale_2"])
                # LoRA merge-state handled under the generation lock below
                # (ensure_lora mutates pipeline weights); "none" unmerges,
                # mirroring the reference controller semantics
                lora_req = None
                if "lora_model_path" in req:
                    p = req["lora_model_path"]
                    lora_req = (None if not p or p == "none" else p,
                                float(req.get("lora_alpha_slider", 1.0)))
                t2v = bool(req.get("t2v"))
                if t2v:
                    # text-to-video: no source video; shape fields ride the
                    # payload (height/width/num_frames)
                    for k in ("height", "width", "num_frames"):
                        if k in req:
                            kwargs[k] = int(req[k])
                    # editing-only shape knobs don't apply to the t2v
                    # surface (TeaCache / cfg-skip ride it unchanged)
                    for k in ("source_frames", "reasoning_frames"):
                        kwargs.pop(k, None)
                elif req.get("source_video"):
                    tmp = tempfile.NamedTemporaryFile(suffix=".mp4",
                                                      delete=False)
                    tmp.write(base64.b64decode(req["source_video"]))
                    tmp.close()
                    kwargs["video_path"] = tmp.name
                elif req.get("source_video_path"):
                    # server-side path reads are restricted to the asset
                    # allowlist; remote peers cannot open arbitrary files
                    path = os.path.realpath(req["source_video_path"])
                    roots = [os.path.realpath(r)
                             for r in _allowed_roots() if r]
                    if not any(path == r or path.startswith(r + os.sep)
                               for r in roots):
                        metrics.observe(0.0, ok=False)
                        self._reply(403, {"message":
                                          "source_video_path outside the "
                                          "allowed asset directories"})
                        return
                    kwargs["video_path"] = path
                else:
                    metrics.observe(0.0, ok=False)
                    self._reply(400, {"message":
                                      "missing source_video[_path]"})
                    return
                # busy counts generations in flight or queued on the chip
                # lock; it is decremented BEFORE any reply is written so a
                # client that just got a response reads a settled gauge
                with metrics._lock:
                    metrics.busy += 1
                try:
                    with lock:  # one generation at a time per chip
                        with metrics._lock:
                            metrics.generating_since = _time.time()
                        try:
                            if lora_req is not None:
                                controller.ensure_lora(*lora_req)
                            result = (controller.generate_t2v(**kwargs)
                                      if t2v
                                      else controller.generate(**kwargs))
                        finally:
                            with metrics._lock:
                                metrics.generating_since = None
                finally:
                    with metrics._lock:
                        metrics.busy -= 1
                enc = controller.encode_video_base64(result["videos"])
                metrics.observe(_time.time() - t0, ok=True)
                self._reply(200, {"message": "Success",
                                  "prompt": result["prompt"],
                                  "base64_encoding": enc})
            except Exception as e:
                import traceback
                traceback.print_exc()
                metrics.observe(_time.time() - t0, ok=False)
                self._reply(500, {"message": f"error: {e}"})
            finally:
                # uploaded source video must not leak on failure paths
                if tmp is not None:
                    try:
                        os.unlink(tmp.name)
                    except OSError:
                        pass

    return Handler


def serve(controller: VideoCoFController, host: str = "127.0.0.1",
          port: int = 8188):
    server = ThreadingHTTPServer((host, port),
                                 make_handler(controller, threading.Lock()))
    print(f"[api] listening on {host}:{port}{ENDPOINT}", file=sys.stderr)
    server.serve_forever()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--quantize", type=str, default=None,
                   choices=[None, "fp8"])
    p.add_argument("--offload_t5", action="store_true")
    # Wan2.2 MoE: a model dir containing low_noise_model/ +
    # high_noise_model/ is auto-detected by the factory; these override
    p.add_argument("--high_noise_model", type=str, default=None)
    p.add_argument("--boundary", type=float, default=0.875)
    p.add_argument("--port", type=int, default=8188)
    # loopback by default: this is an unauthenticated surface; pass
    # --host 0.0.0.0 explicitly to expose it
    p.add_argument("--host", type=str, default="127.0.0.1")
    args = p.parse_args()

    from ..factory import load_pipeline
    load_kwargs = dict(random_init=args.random_init, quantize=args.quantize,
                       offload_t5=args.offload_t5,
                       high_noise_model=args.high_noise_model,
                       boundary=args.boundary)
    pipe = load_pipeline(args.model_name or "", **load_kwargs)
    # the controller re-applies these on a cross-family switch back to Wan
    serve(VideoCoFController(pipe, model_name=args.model_name,
                             wan_load_kwargs=load_kwargs),
          host=args.host, port=args.port)


if __name__ == "__main__":
    main()
