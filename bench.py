"""Headline benchmark: seconds per 4-step 480p chain-of-frames video edit.

Mirrors the reference fast path (`fast_infer.py`: 4-step UniPC, shift 3, CFG
off, 33 source + 4 reasoning frames at 480x832) on the Wan2.1-T2V-1.3B DiT
geometry (BASELINE.json config[0]; the 14B does not fit one 16 GB v5e chip in
bf16). Random bf16 weights — identical FLOP/byte profile to trained ones.

Measures the full edit: VAE encode -> 4 jitted DiT denoise steps (+ sampler
updates) -> VAE decode of ground+edit segments. Text encoding is excluded
(precomputed embeds; per-batch amortized in the reference serving path too).

Prints ONE json line:
  {"metric": "sec_per_video_4step_480p_1.3b", "value": ..., "unit": "s",
   "vs_baseline": ..., "model": ..., "per_step_s": ..., "mfu": ...,
   "stages": {encode, denoise, decode}, ...}
vs_baseline compares against the reference's published ~30 s/video on H100
(14B; `README.md:46,124` — see BASELINE.md). NOTE: that comparison is
1.3B-on-one-v5e vs 14B-on-H100 — per-FLOP roughly 10x less model work; the
honest per-chip efficiency number is `mfu` (measured DiT FLOP/s over the
v5e's 197 bf16 TFLOP/s peak).

On the default configuration the bench ALSO runs the flagship 14B fp8
end-to-end probe (subprocess, clean chip) and makes ITS number the headline —
apples-to-apples against the reference's 14B-on-H100 ~30 s/video — with the
1.3B fast-path record attached under "fast_1.3b". BENCH_14B=0 skips it.

Variants: BENCH_STEPS=50 BENCH_CFG=1  -> the reference standard path
          BENCH_TEACACHE=1            -> TeaCache on (the reference 50-step
                                         CLI default: threshold 0.10, skip
                                         first 5 steps)
          BENCH_TEACACHE_PIN=0.4      -> pin a realistic 40% skip plan
                                         (random weights over-skip)
          BENCH_4X=1                  -> 133-frame (4x) length extrapolation
          BENCH_SMALL=1               -> CPU smoke geometry
          BENCH_14B=0                 -> skip the 14B fp8 e2e headline probe
          BENCH_WALL_BUDGET=3300      -> whole-process wall budget (s): the
                                         1.3B record is ALWAYS printed as a
                                         complete JSON line the moment it is
                                         measured; the 14B phase only starts
                                         if >= BENCH_14B_MIN_REMAINING (900)
                                         seconds remain, and its subprocess
                                         timeout is clamped to the remainder
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t_main_start = time.time()
    import jax

    if os.environ.get("BENCH_SMALL") == "1":
        # CPU smoke: the axon sitecustomize force-selects the TPU tunnel
        # regardless of JAX_PLATFORMS env — the config knob after import is
        # what actually wins (CLAUDE.md / tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if os.environ.get("BENCH_SMALL") != "1":
        # Fail FAST if the remote TPU tunnel is wedged (observed: a dead
        # axon worker blocks the very first dispatch forever with 0% CPU —
        # better one clear error line than an indefinitely hung bench).
        # The probe runs in a SUBPROCESS so (a) a hung dispatch can be
        # killed cleanly (a hung in-process thread can't — round 3 died
        # with SIGABRT when sys.exit tore down under a live dispatch) and
        # (b) each retry gets a FRESH tunnel connection: the tunnel
        # demonstrably flaps on ~minutes timescales, so bounded retries
        # with backoff salvage runs a single-shot probe would abort.
        import subprocess

        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
        probe_src = ("import jax.numpy as jnp; "
                     "print(float(jnp.sum(jnp.ones((8, 8)))))")
        reason = None
        for attempt in range(1, attempts + 1):
            t0 = time.time()
            try:
                r = subprocess.run([sys.executable, "-c", probe_src],
                                   capture_output=True, text=True,
                                   timeout=timeout_s)
                if r.returncode == 0:
                    reason = None
                    log(f"device probe ok (attempt {attempt}, "
                        f"{time.time()-t0:.1f}s)")
                    break
                reason = (f"device probe exit {r.returncode}: "
                          f"{r.stderr.strip()[-300:]}")
            except subprocess.TimeoutExpired:
                reason = (f"TPU device probe did not complete within "
                          f"{timeout_s:.0f}s — remote tunnel unresponsive")
            log(f"probe attempt {attempt}/{attempts} failed: {reason}")
            if attempt < attempts:
                time.sleep(30.0 * attempt)
        if reason is not None:
            print(json.dumps({
                "metric": "sec_per_video_4step_480p_1.3b", "value": None,
                "unit": "s", "vs_baseline": None, "error": reason}))
            # flush + hard-exit: never tear down the interpreter under a
            # live JAX dispatch (round 3's SIGABRT / rc 134)
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(2)

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    log(f"jit cache: {enable_persistent_compilation_cache()}")

    from videocof_tpu.configs import (WAN21_T2V_1_3B, WanVAEConfig, T5Config)
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    height, width = 480, 832
    source_frames, reasoning_frames = 33, 4
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    do_cfg = os.environ.get("BENCH_CFG") == "1"
    guidance = 5.0 if do_cfg else 1.0
    teacache = os.environ.get("BENCH_TEACACHE") == "1"
    if os.environ.get("BENCH_4X") == "1":
        # 4x the 33-frame training length; the causal VAE needs T = 1 mod 4
        source_frames = 133

    # bf16 residual stream (the reference's autocast blocks keep x bf16 too;
    # closeness-tested vs fp32) + kernel-aligned token padding: both cut HBM
    # traffic on the DiT step. Override with BENCH_STREAM_DTYPE=float32.
    dit_cfg = WAN21_T2V_1_3B.replace(
        stream_dtype=os.environ.get("BENCH_STREAM_DTYPE", "bfloat16"),
        rope_dtype=os.environ.get("BENCH_ROPE_DTYPE", "bfloat16"),
        token_pad_multiple=128)
    vae_cfg = WanVAEConfig()
    t5_cfg = T5Config()

    small = os.environ.get("BENCH_SMALL") == "1"  # CPU smoke mode
    if small:
        height, width, source_frames = 96, 96, 9
        dit_cfg = dit_cfg.replace(num_layers=2, dim=384, ffn_dim=1024,
                                  num_heads=3)

    moe = os.environ.get("BENCH_MOE") == "1"  # Wan2.2 dual-expert variant

    t0 = time.time()
    # one jitted dispatch per model: eager init is hundreds of tunnel
    # round-trips on the axon transport
    dit_params = jax.jit(
        lambda k: wan_dit.init_wan_dit(k, dit_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    vae_params = jax.jit(
        lambda k: wan_vae.init_wan_vae(k, vae_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    log(f"init: {time.time()-t0:.1f}s; DiT params {n_params/1e9:.2f}B"
        + (" x2 experts (MoE)" if moe else ""))

    if moe:
        from videocof_tpu.pipeline import Wan22Pipeline
        dit_params_2 = jax.jit(
            lambda k: wan_dit.init_wan_dit(k, dit_cfg, dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(7))
        pipe = Wan22Pipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                             t5_params=None, t5_cfg=t5_cfg,
                             dtype=jnp.bfloat16, dit_params_2=dit_params_2,
                             boundary=0.875)
    else:
        pipe = WanPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                           t5_params=None, t5_cfg=t5_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # uint8 input like a real decoded clip (4x less host->device traffic)
    video = rng.integers(0, 256, (1, 3, source_frames, height, width),
                         dtype=np.uint8)
    embeds = jnp.zeros((1, dit_cfg.text_len, dit_cfg.text_dim), jnp.bfloat16)

    # the remote worker kills single XLA programs that run for many minutes;
    # the 50-step fused scan (~5 min in ONE program) trips it, and so does
    # the 4-step fused scan at the 4x geometry (107k tokens, ~13x the
    # attention FLOPs) — run long/large trajectories stepwise (one dispatch
    # per step). BENCH_FUSED overrides.
    est_tokens = (((source_frames - 1) // 4 + 1) * 2 + 1) * \
        (height // 16) * (width // 16)
    fused = os.environ.get("BENCH_FUSED")
    fused = ((fused == "1") if fused else
             (steps * (2 if do_cfg else 1) <= 16 and est_tokens <= 40_000))

    # BENCH_TEACACHE_PIN=<rate>: inject a fixed skip plan at a realistic
    # trained-weight skip rate instead of planning from the random bench
    # weights (which skip ~90% of steps at threshold 0.10 — an
    # unrepresentative best case; see BASELINE.md). Bresenham spread after
    # the 5-step warmup, like trained TeaCache's interleaved skips.
    pinned_rate = os.environ.get("BENCH_TEACACHE_PIN")
    forced_plan = None
    if teacache and pinned_rate:
        rate = float(pinned_rate)
        forced_plan, acc = [], 0.0
        for i in range(steps):
            acc += rate if i >= 5 else 0.0
            forced_plan.append(acc >= 1.0)
            acc -= int(acc)

    moe_kw = ({"guidance_scale_2": max(1.0, guidance - 1.5)} if moe else
              {"enable_teacache": teacache,
               "teacache_forced_plan": forced_plan,
               "teacache_coefficients": (
                   None if not teacache else __import__(
                       "videocof_tpu.models.teacache", fromlist=["x"]
                   ).TEACACHE_COEFFICIENTS["wan2.1-t2v-1.3b"])})

    def run():
        return pipe(video, prompt="bench", source_frames=source_frames,
                    reasoning_frames=reasoning_frames,
                    num_inference_steps=steps, guidance_scale=guidance,
                    negative_prompt="bench-neg" if do_cfg else "",
                    negative_prompt_embeds=embeds if do_cfg else None,
                    shift=3.0, sampler="unipc", repeat_rope=True, cot=True,
                    prompt_embeds=embeds, fused_sampling=fused, **moe_kw)

    t0 = time.time()
    out = run()  # compile + run
    log(f"first call (compile+run): {time.time()-t0:.1f}s; "
        f"out {out.videos.shape}")

    if os.environ.get("BENCH_PROFILE") == "1":
        import jax as _jax
        t0 = time.time()
        jvideo = _jax.device_put(video)
        jvideo.block_until_ready()
        log(f"profile: h2d upload ({video.nbytes/1e6:.0f}MB) "
            f"{time.time()-t0:.2f}s")
        # the cot path defers u8 conversion into the fused prep program, so
        # the pipeline's 'u8_in' cache entry may not exist — build our own
        jvideo = _jax.jit(
            lambda x: x.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0)(jvideo)
        t0 = time.time()
        lat = pipe.vae_encode(jvideo)
        lat.block_until_ready()
        log(f"profile: vae encode {time.time()-t0:.2f}s -> {lat.shape}")
        import videocof_tpu.models.wan_dit as _wd
        cc = (lat.shape[2] + 1, lat.shape[3] // 2, lat.shape[4] // 2)
        f_src = lat.shape[2]  # condition latent frames at this geometry
        cos, sin = _wd.make_rope_for_geometry(dit_cfg, cc, f_src=f_src,
                                              f_ground=1)
        step = pipe._step_fn(False, 1.0, f_src)
        full_lat = jnp.concatenate(
            [lat.astype(jnp.float32),
             jnp.zeros_like(lat[:, :, :1], jnp.float32)], axis=2)
        v, _ = step(pipe.dit_params, full_lat, 999.0, embeds,
                    jnp.asarray(cos), jnp.asarray(sin), None)
        v.block_until_ready()
        t0 = time.time()
        for _ in range(3):
            v, _ = step(pipe.dit_params, full_lat, 999.0, embeds,
                        jnp.asarray(cos), jnp.asarray(sin), None)
        v.block_until_ready()
        log(f"profile: dit step {(time.time()-t0)/3:.2f}s")
        t0 = time.time()
        dec = pipe.vae_decode(lat)
        dec.block_until_ready()
        log(f"profile: vae decode {time.time()-t0:.2f}s -> {dec.shape}")

    times = []
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        t0 = time.time()
        out = run()
        times.append(time.time() - t0)
    value = float(np.min(times))
    log(f"times: {[f'{t:.2f}' for t in times]}")

    # ---- per-stage walls + measured FLOP/s (all executables already
    # compiled by run(); each stage is one whole-program dispatch + block,
    # the only timing the async tunnel reports faithfully)
    from videocof_tpu.utils.profiling import dit_matmul_flops
    tc0 = vae_cfg.temporal_compression_ratio
    g_lat = (reasoning_frames - 1) // tc0 + 1
    jvideo_u8 = jax.device_put(video)
    t0 = time.time()
    # the production prep: u8 normalize + streaming encode + noise + concat
    # (ONE program under VIDEOCOF_ENCODE_FUSED=1, the default)
    lat_full = pipe.prepare_cot_latents(jvideo_u8, g_lat,
                                        jax.random.PRNGKey(0))
    jax.block_until_ready(lat_full)
    t_encode = time.time() - t0
    cond0 = (source_frames - 1) // tc0 + 1
    lat = lat_full[:, :, :cond0]  # the encoded-mu prefix

    tc = vae_cfg.temporal_compression_ratio
    cond = (source_frames - 1) // tc + 1
    ground = 1
    Tl = cond + ground + cond
    Hl, Wl = lat.shape[3], lat.shape[4]
    L_tokens = Tl * (Hl // 2) * (Wl // 2)

    full_lat = jnp.concatenate(
        [lat.astype(jnp.float32),
         jnp.zeros((1, lat.shape[1], ground + cond, Hl, Wl), jnp.float32)],
        axis=2)
    import videocof_tpu.models.wan_dit as _wd
    cos, sin = _wd.make_rope_for_geometry(dit_cfg, (Tl, Hl // 2, Wl // 2),
                                          f_src=cond, f_ground=ground)
    ctx_run = jnp.concatenate([embeds, embeds], 0) if do_cfg else embeds
    fkey = next((k for k in pipe._jit_cache if isinstance(k, tuple)
                 and k and k[0] == "fused"), None)
    skey = next((k for k in pipe._jit_cache if isinstance(k, tuple)
                 and k and k[0] == "seg"), None)
    if fkey is not None:
        fused_fn = pipe._jit_cache[fkey]

        def denoise_once():
            out = fused_fn(pipe.dit_params, full_lat, ctx_run,
                           jnp.asarray(cos), jnp.asarray(sin))
            jax.block_until_ready(out)
            return out, steps
    elif (skey is not None and not pipe._jit_cache[skey].thread_residual
          and pipe._jit_cache[skey].split > 0):
        # time one compiled segment of the segmented trajectory (the
        # production path for long runs) — no extra executable to compile
        seg_run = pipe._jit_cache[skey]
        k = min(seg_run.segment_steps, seg_run.split)
        xs_seg = {k2: v[:k] for k2, v in seg_run.xs_host.items()}
        carry0 = seg_run.init_carry(full_lat)

        def denoise_once():
            carry, _ = seg_run.seg_cfg(pipe.dit_params, carry0, None,
                                       xs_seg, ctx_run, jnp.asarray(cos),
                                       jnp.asarray(sin))
            jax.block_until_ready(carry)
            return full_lat, k
    else:
        step_fn = pipe._step_fn(do_cfg, guidance, cond)

        def denoise_once():
            v, _ = step_fn(pipe.dit_params, full_lat, 800.0, ctx_run,
                           jnp.asarray(cos), jnp.asarray(sin), None)
            jax.block_until_ready(v)
            return full_lat, 1  # one step's wall; scale below

    lat_out, n_steps = denoise_once()   # warm (already compiled by run())
    t0 = time.time()
    lat_out, n_steps = denoise_once()
    t_denoise_meas = time.time() - t0
    per_step = t_denoise_meas / n_steps
    t_denoise = per_step * steps

    t0 = time.time()
    # same segment shapes run() decoded, so the executables are cached
    pipe._decode_outputs(lat_out, True, cond, ground)
    t_decode = time.time() - t0

    # transport health: one 8 MB incompressible device->host fetch (shared
    # helper — the pipeline uses the same measurement to auto-select the
    # half-size I420 decode fetch on slow tunnels; see utils/transport.py).
    # The remote tunnel's bandwidth swings 0.2-32 MB/s across sessions and
    # dominates the decode stage, so the headline is only interpretable
    # next to this number.
    from videocof_tpu.utils import transport
    fetch_mbps = transport.measured_fetch_mbps(8, refresh=True)
    if not np.isfinite(fetch_mbps):
        fetch_mbps = None  # non-TPU platform: local memory, not a transport

    flops_step = dit_matmul_flops(dit_cfg, L_tokens) * (2 if do_cfg else 1)
    tflops = flops_step / per_step / 1e12
    peak = 197.0 if dev.platform == "tpu" else float("nan")  # v5e bf16 peak
    mfu = tflops / peak
    log(f"stages: encode {t_encode:.2f}s, denoise {t_denoise:.2f}s "
        f"({per_step:.2f}s/step, {tflops:.1f} TFLOP/s, MFU {mfu:.2f}), "
        f"decode {t_decode:.2f}s; tokens {L_tokens}")

    extra = {}
    if teacache:
        if forced_plan is not None:
            extra["teacache_skipped_steps"] = int(sum(forced_plan))
            extra["teacache_pinned_skip_rate"] = float(pinned_rate)
        else:
            from videocof_tpu.models import teacache as _tc
            from videocof_tpu.schedulers import get_scheduler as _gs
            sched = _gs("unipc")
            sched.set_timesteps(steps, shift=3.0)
            skips = _tc.plan_teacache_skips(
                pipe.dit_params, dit_cfg, sched.timesteps,
                _tc.TEACACHE_COEFFICIENTS["wan2.1-t2v-1.3b"], 0.10, 5)
            extra["teacache_skipped_steps"] = int(sum(skips))
            extra["teacache_note"] = ("random-weight skip plan; pass "
                                      "BENCH_TEACACHE_PIN=0.4 for a "
                                      "trained-weight-realistic rate")

    name = f"sec_per_video_{steps}step" + ("_cfg" if do_cfg else "")
    if teacache:
        name += "_teacache" + (f"_pin{int(float(pinned_rate) * 100)}"
                               if forced_plan is not None else "")
    name += "_480p_1.3b" + ("_moe" if moe else "") \
        + ("_4x" if source_frames == 133 else "")
    record_1p3b = {
        "metric": name if (do_cfg or steps != 4 or source_frames == 133
                           or teacache or moe)
        else "sec_per_video_4step_480p_1.3b",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(value / 30.0, 4),
        "model": ("wan2.2-style dual-expert MoE, 2x 1.3B bf16 on 1x v5e "
                  "(boundary-routed experts; reference: Wan2.2-A14B on GPU)"
                  if moe else
                  "wan2.1-t2v-1.3b bf16 on 1x v5e (reference baseline: "
                  "14B on H100 — ~10x more FLOPs per video)"),
        "tokens": L_tokens,
        "per_step_s": round(per_step, 3),
        "dit_tflops_per_s": round(tflops, 1),
        "mfu": round(mfu, 3),
        "stages": {"encode_s": round(t_encode, 2),
                   "denoise_s": round(t_denoise, 2),
                   "decode_s": round(t_decode, 2)},
        "transport_fetch_mbps": (None if fetch_mbps is None
                                 else round(fetch_mbps, 1)),
        **extra,
    }

    # Emit the 1.3B record IMMEDIATELY as a complete JSON line, before the
    # (long) 14B phase starts: if an outer driver timeout kills this process
    # mid-14B, a parseable result already sits on stdout. The combined line
    # printed at the end stays the final emission (parsers taking the LAST
    # json line get the richest record available at kill time either way).
    print(json.dumps(record_1p3b))
    sys.stdout.flush()

    # ---- flagship: the 14B fp8 END-TO-END on this same chip — the
    # apples-to-apples comparison against the reference's ~30 s/video
    # 14B-on-H100 headline (`README.md:46,124`). Runs in a SUBPROCESS so its
    # 15.75 GiB peak gets a clean chip (this process frees every live device
    # array first). Only on the default bench configuration; skip with
    # BENCH_14B=0 or when a variant/smoke mode is selected.
    fp8_14b = None
    run_14b = (os.environ.get("BENCH_14B", "1") == "1" and not small
               and dev.platform == "tpu" and steps == 4 and not do_cfg
               and not teacache and not moe and source_frames == 33)

    # Wall-budget guard (round-4 postmortem): the driver runs this script
    # under an outer timeout; starting a 14B phase that cannot finish inside
    # the remaining budget produced rc 124 with zero parsed output two rounds
    # running. BENCH_WALL_BUDGET (s, whole-process) bounds us: the 14B phase
    # only starts if the remaining budget covers a warm-cache probe
    # (BENCH_14B_MIN_REMAINING, default 900 s — measured warm runs are
    # ~6-9 min incl. weight ship), and the subprocess timeout is clamped to
    # what is actually left.
    wall_budget = float(os.environ.get("BENCH_WALL_BUDGET", "3300"))
    min_remaining = float(os.environ.get("BENCH_14B_MIN_REMAINING", "900"))
    remaining = wall_budget - (time.time() - t_main_start)
    if run_14b and remaining < min_remaining:
        log(f"skipping 14B phase: {remaining:.0f}s left of "
            f"{wall_budget:.0f}s budget < {min_remaining:.0f}s minimum")
        fp8_14b = {"error": f"skipped: {remaining:.0f}s wall budget left"}
        run_14b = False

    if run_14b:
        import gc
        import subprocess
        for arr in jax.live_arrays():
            try:
                arr.delete()
            except Exception:
                pass
        jax.clear_caches()
        gc.collect()
        cmd = [sys.executable, "scripts/probe_14b_e2e.py", "--keep-decoder",
               "--ffn-chunks", "4", "--reps", "1"]
        timeout_cfg = float(os.environ.get("BENCH_14B_TIMEOUT", "2400"))
        for attempt in (1, 2):
            # a run right after another TPU process frees 13.8 GiB can hit
            # a transient ResourceExhausted (worker reclaim lag) — retry once
            remaining = wall_budget - (time.time() - t_main_start)
            timeout_s = min(timeout_cfg, max(60.0, remaining - 60.0))
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=timeout_s)
                log("--- 14b probe stderr tail ---")
                log(r.stderr[-1500:])
                lines = [ln for ln in r.stdout.strip().splitlines() if ln]
                fp8_14b = (json.loads(lines[-1])
                           if r.returncode == 0 and lines
                           else {"error": f"probe exit {r.returncode}"})
            except subprocess.TimeoutExpired:
                fp8_14b = {"error": f"probe timeout after {timeout_s:.0f}s"}
            except Exception as e:  # noqa: BLE001
                fp8_14b = {"error": f"{type(e).__name__}: {e}"}
            if fp8_14b.get("value"):
                break
            log(f"14b probe attempt {attempt} failed: "
                f"{fp8_14b.get('error', 'no value')}")
            if wall_budget - (time.time() - t_main_start) < min_remaining:
                log("no retry: wall budget exhausted")
                break
            time.sleep(20.0)

    if fp8_14b and fp8_14b.get("value"):
        # headline = the flagship 14B number; the 1.3B fast-path record
        # rides along in full
        out = dict(fp8_14b)
        out["fast_1.3b"] = record_1p3b
        print(json.dumps(out))
    else:
        if fp8_14b is not None:
            record_1p3b["fp8_14b"] = fp8_14b
        print(json.dumps(record_1p3b))


if __name__ == "__main__":
    main()
