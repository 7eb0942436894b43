"""14B FULLY-RESIDENT serving probe: DiT fp8 + VAE co-resident, no staging.

`probe_14b_e2e.py` measures the staged flow the reference's sequential CPU
offload maps to (`/root/reference/inference.py:306-321`): encode before the
weights ship, VAE freed for the denoise stage, re-shipped for decode. That
re-ship is ~7 s of pure tunnel transport PER VIDEO — and between videos the
13.83 GiB DiT itself would have to re-ship (~10 min on this link), which is
untenable for serving. This probe keeps EVERYTHING resident and drives
repeat videos through encode -> denoise -> decode with zero host<->device
weight traffic: the steady-state serving number.

The stage executables are identical to the staged probe's (persistent-cache
hits), so the only question the probe answers is an HBM one: do the stage
temps fit BESIDE the params? Budget arithmetic from probe_14b_e2e's
measurements on the 15.75 GiB v5e budget:

  DiT fp8 params+formats 13.90 + VAE 0.24 + step temps 1.15
  + step outputs (res 0.29, v 0.01) + reserved 0.26  ~= 15.85  — marginal.

If the default step OOMs, `--ffn-chunks 2` halves the dominant FFN
intermediate (29640 x 13824 bf16 = 0.82 GiB) at the cost of one fresh
remote compile (persistent-cached thereafter). Each stage's first run is
wrapped so an OOM reports WHICH stage broke residency instead of dying.

MEASURED RESULT (2026-08-17, one v5e): full co-residency is INFEASIBLE at
480p — the VAE stages themselves are the blocker, not the DiT step. Via
probe_vae_memory.py, the chunk-1 streaming programs need (temps + streaming
caches): encode ~2.8 + 1.1 GiB, decode ~2.8 + 1.9 GiB — versus ~1.6 GiB
free beside the 13.9 GiB resident DiT. Spatial tiling cannot close a 3x
gap (the halo overhead compounds it) and the mid-block global attention
bounds exact tiling anyway. The production answers are (a) the resident-
DECODER staged flow (`probe_14b_e2e.py --keep-decoder --ffn-chunks 4`:
only the 0.13 GiB decoder stays resident, decode needs no re-ship) for one
chip, and (b) sharding the 14B over a mesh (dryrun-validated FSDP x SP)
so per-chip weights leave several GiB of VAE headroom.

Usage: python scripts/probe_14b_resident.py [--reps 2] [--ffn-chunks N]
Writes one JSON line to stdout.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--vae-chunk", type=int, default=1)
    ap.add_argument("--ffn-chunks", type=int, default=0,
                    help="chunk the FFN matmuls to cut step temps "
                         "(0 = config default; 2 if the default OOMs "
                         "beside the resident VAE)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    from videocof_tpu.configs import WAN21_T2V_14B, WanVAEConfig, T5Config
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.utils.fp8 import fp8_bytes, quantize_params_fp8

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    cfg = WAN21_T2V_14B.replace(stream_dtype="bfloat16",
                                rope_dtype="bfloat16",
                                token_pad_multiple=128)
    if args.ffn_chunks:
        cfg = cfg.replace(ffn_chunks=args.ffn_chunks)
    vae_cfg = WanVAEConfig()
    height, width, source_frames, reasoning_frames = 480, 832, 33, 4

    def init_fp8(key):
        return quantize_params_fp8(
            wan_dit.init_wan_dit(key, cfg, dtype=jnp.bfloat16))

    p_abs = jax.eval_shape(init_fp8, jax.random.PRNGKey(0))

    vae_params = jax.jit(
        lambda k: wan_vae.init_wan_vae(k, vae_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    float(jnp.sum(jax.tree.leaves(vae_params)[0], dtype=jnp.float32))
    vae_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(vae_params))

    pipe = WanPipeline(None, cfg, vae_params, vae_cfg,
                       t5_params=None, t5_cfg=T5Config(), dtype=jnp.bfloat16)
    pipe.vae_decode_chunk = args.vae_chunk
    pipe.vae_encode_chunk = args.vae_chunk

    # AOT step from abstract shapes (same program as probe_14b_e2e when
    # --ffn-chunks is 0 -> persistent-cache hit). Returning (v, res) lets
    # XLA alias a stream buffer into the output: temps 1.71 -> 1.15 GiB.
    from jax.experimental.layout import Format, Layout
    tcr = vae_cfg.temporal_compression_ratio
    cond = (source_frames - 1) // tcr + 1
    ground = 1
    Tl = cond + ground + cond
    Hl, Wl = height // 8, width // 8
    grid = (Tl, Hl // 2, Wl // 2)
    cos_r, sin_r = wan_dit.make_rope_for_geometry(cfg, grid, f_src=cond,
                                                  f_ground=ground)
    cos_r, sin_r = jnp.asarray(cos_r), jnp.asarray(sin_r)
    lat_abs = jax.ShapeDtypeStruct((1, 16, Tl, Hl, Wl), jnp.float32)
    t_abs = jax.ShapeDtypeStruct((1,), jnp.float32)
    c_abs = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim),
                                 jnp.bfloat16)

    def dit_step(p, lat, t, ctx, co, si):
        v, res = wan_dit.wan_dit_forward_with_residual(
            p, cfg, lat.astype(jnp.bfloat16), t, ctx, co, si,
            residual=None, skip_blocks=False)
        return v.at[:, :, :cond].set(0.0), res  # source freeze

    t0 = time.time()
    step_compiled = jax.jit(
        dit_step, in_shardings=Format(Layout.AUTO)).lower(
        p_abs, lat_abs, t_abs, c_abs, cos_r, sin_r).compile()
    in_fmts = step_compiled.input_formats[0]
    fmts = in_fmts[0]
    t_compile = time.time() - t0
    try:
        ma = step_compiled.memory_analysis()
        print(f"step AOT compile: {t_compile:.1f}s; "
              f"temps {ma.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {ma.argument_size_in_bytes/2**30:.2f} GiB, "
              f"out {ma.output_size_in_bytes/2**30:.2f} GiB",
              file=sys.stderr)
    except Exception:
        print(f"step AOT compile: {t_compile:.1f}s", file=sys.stderr)

    def hbm(tag):
        try:
            ms = dev.memory_stats() or {}
            print(f"hbm[{tag}]: in_use={ms.get('bytes_in_use', 0)/2**30:.2f}G "
                  f"peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f}G",
                  file=sys.stderr)
        except Exception as e:
            print(f"hbm[{tag}]: unavailable ({e})", file=sys.stderr)

    # Ship the DiT weights host-side leaf-by-leaf into the executable's
    # input formats (device peak = params + one leaf; see probe_14b_fp8).
    import ml_dtypes

    t0 = time.time()
    rng2 = np.random.default_rng(0)
    abs_leaves, tdef = jax.tree.flatten(p_abs)
    fmt_leaves = jax.tree.flatten(fmts)[0]
    shipped = []
    for a, fmt in zip(abs_leaves, fmt_leaves):
        if a.dtype == jnp.float8_e4m3fn:
            rows = min(128, a.shape[-2]) if a.ndim >= 2 else 1
            tpl = (rng2.standard_normal(
                a.shape[:-2] + (rows, a.shape[-1]) if a.ndim >= 2
                else a.shape, dtype=np.float32) * 64.0
            ).astype(ml_dtypes.float8_e4m3fn)
            if a.ndim >= 2 and rows < a.shape[-2]:
                reps = -(-a.shape[-2] // rows)
                host = np.ascontiguousarray(
                    np.tile(tpl, (1,) * (a.ndim - 2) + (reps, 1)
                            )[..., :a.shape[-2], :])
            else:
                host = tpl
        elif a.ndim <= 1:
            host = np.full(a.shape, 0.02, a.dtype)
        else:
            host = (0.02 * rng2.standard_normal(a.shape).astype(
                np.float32)).astype(a.dtype)
        from videocof_tpu.utils.layouts import device_put_into
        shipped.append(device_put_into(host, fmt))
        del host
    jax.block_until_ready(shipped)
    params = jax.tree.unflatten(tdef, shipped)
    del shipped
    t_init = time.time() - t0
    pbytes = fp8_bytes(params)
    pipe.dit_params = params
    print(f"weights shipped into formats: {t_init:.1f}s, "
          f"{pbytes/2**30:.2f} GiB DiT + {vae_bytes/2**30:.2f} GiB VAE "
          f"(co-resident)", file=sys.stderr)
    hbm("resident")

    from videocof_tpu.schedulers import get_scheduler
    from videocof_tpu.pipeline.fused_sampler import _sampler_defs
    sched = get_scheduler("unipc")
    sched.set_timesteps(args.steps, shift=3.0)
    plan = {k: np.asarray(v) for k, v in sched.plan_arrays().items()}
    latents_of, update, init_carry, final = _sampler_defs("unipc")
    upd_jit = jax.jit(update)
    init_jit = jax.jit(init_carry)

    embeds = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    ctx_dev = jax.device_put(np.asarray(embeds), in_fmts[3])
    cos_dev = jax.device_put(np.asarray(cos_r), in_fmts[4])
    sin_dev = jax.device_put(np.asarray(sin_r), in_fmts[5])

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (1, 3, source_frames, height, width),
                         dtype=np.uint8)
    u8_in = jax.jit(lambda x: x.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0)

    def encode_stage():
        jv = u8_in(jax.device_put(video))
        lat = pipe.prepare_cot_latents(jv, ground, jax.random.PRNGKey(7))
        float(jnp.sum(lat[:1, :1, :1, :1, :1], dtype=jnp.float32))
        return lat

    def denoise_stage(latents):
        carry = init_jit(latents)
        for i in range(args.steps):
            row = {k: np.asarray(v[i]) for k, v in plan.items()}
            lat_i = jax.device_put(latents_of(carry), in_fmts[1])
            t_i = jax.device_put(
                np.full((1,), plan["timestep"][i], np.float32), in_fmts[2])
            v, _res = step_compiled(pipe.dit_params, lat_i, t_i, ctx_dev,
                                    cos_dev, sin_dev)
            carry = upd_jit(carry, row, v)
            jax.block_until_ready(carry)
            _res.delete()  # 0.29 GiB; two alive tip the budget
            v.delete()
        out = final(carry)
        float(jnp.sum(out[:1, :1, :1, :1, :1], dtype=jnp.float32))
        return out

    def decode_stage(lat_out):
        return pipe._decode_outputs(lat_out, True, cond, ground)

    # First video: compile + warm each stage, reporting which (if any)
    # breaks co-residency.
    stage_err = None
    lat = lat_out = out = None
    for name, fn in (("encode", encode_stage),
                     ("denoise", lambda: denoise_stage(lat)),
                     ("decode", lambda: decode_stage(lat_out))):
        try:
            t0 = time.time()
            r = fn()
            print(f"warm {name}: {time.time()-t0:.1f}s", file=sys.stderr)
            hbm(f"after-{name}")
            if name == "encode":
                lat = r
            elif name == "denoise":
                lat_out = r
            else:
                out = r
        except Exception as e:
            stage_err = (name, f"{type(e).__name__}: {e}")
            print(f"STAGE {name} FAILED beside resident weights: "
                  f"{stage_err[1][:500]}", file=sys.stderr)
            break

    if stage_err is not None:
        print(json.dumps({
            "metric": "sec_per_video_4step_480p_14b_fp8_resident",
            "value": None, "unit": "s",
            "failed_stage": stage_err[0], "error": stage_err[1][:300],
            "ffn_chunks": args.ffn_chunks or cfg.ffn_chunks,
            "note": "co-residency infeasible at this config; rerun with "
                    "--ffn-chunks 2 (or keep the staged probe_14b_e2e flow)",
        }))
        return

    # Steady-state videos: every stage timed with everything resident and
    # all executables warm — zero weight traffic.
    totals, stage_walls = [], []
    for _ in range(args.reps):
        t0 = time.time()
        lat = encode_stage()
        t1 = time.time()
        lat_out = denoise_stage(lat)
        t2 = time.time()
        out = decode_stage(lat_out)
        t3 = time.time()
        totals.append(t3 - t0)
        stage_walls.append((t1 - t0, t2 - t1, t3 - t2))
        print(f"video: {t3-t0:.1f}s (enc {t1-t0:.1f} den {t2-t1:.1f} "
              f"dec {t3-t2:.1f})", file=sys.stderr)
    best = int(np.argmin(totals))
    value = totals[best]
    t_enc, t_den, t_dec = stage_walls[best]

    mem = {}
    try:
        ms = dev.memory_stats() or {}
        mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        pass

    print(json.dumps({
        "metric": "sec_per_video_4step_480p_14b_fp8_resident",
        "value": round(value, 3), "unit": "s",
        "vs_baseline": round(value / 30.0, 4),
        "model": "wan2.1-t2v-14b fp8 + VAE co-resident on 1x v5e 16GB, "
                 "steady-state serving (no per-video weight traffic; "
                 "reference: 14B bf16 + sequential CPU offload on H100 "
                 "80GB, ~30 s/video)",
        "params_gib": round((pbytes + vae_bytes) / 2**30, 2),
        "ffn_chunks": args.ffn_chunks or cfg.ffn_chunks,
        "vae_chunk": args.vae_chunk,
        "compile_s": round(t_compile, 1),
        "ship_s": round(t_init, 1),
        "stages": {"encode_s": round(t_enc, 2),
                   "denoise_s": round(t_den, 2),
                   "decode_s": round(t_dec, 2)},
        "per_step_s": round(t_den / args.steps, 3),
        "hbm": mem,
    }))


if __name__ == "__main__":
    main()
