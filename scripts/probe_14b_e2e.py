"""14B END-TO-END on one 16 GB v5e: the flagship fast-path edit, fp8.

The reference's headline number (~30 s/video, `README.md:46,124`) is the
4-step 480x832 33+4-frame CoF edit with Wan2.1-T2V-**14B** on an H100 —
with sequential CPU offload, since 28 GB of bf16 weights don't leave room
on an 80 GB card otherwise (`inference.py:306-321`). This probe runs the
same edit END TO END (VAE encode -> 4 fused UniPC DiT steps -> segment
decode) with the 14B RESIDENT in fp8 (13.83 GiB) on a 16 GB v5e:

  1. AOT-compile the fused 4-step executable from ABSTRACT param shapes
     (`WanPipeline.precompile_fused`) — nothing resident yet;
  2. init+quantize the weights DIRECTLY into that executable's input
     formats (one jit with out_shardings=formats: bf16 intermediates die
     leaf-by-leaf, and no dispatch-time relayout copy can OOM the chip —
     see utils/layouts.py);
  3. run the pipeline; VAE streams with 1-latent-frame chunks to fit the
     ~1.9 GiB left beside the weights.

Random weights — identical FLOP/byte profile to trained ones. Text
embeddings are precomputed (as in the serving path; the reference amortizes
the text encoder over batches too).

Usage: python scripts/probe_14b_e2e.py [--reps 2] [--vae-chunk 1]
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
    ap.add_argument("--vae-chunk", type=int, default=1,
                    help="latent frames per streaming VAE step (1 fits "
                         "beside the resident 14B; 2 is the 1.3B default)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance", type=float, default=1.0,
                    help="> 1.0: CFG via SEQUENTIAL branches — two batch-1 "
                         "dispatches of the same step executable + an "
                         "on-device combine (batch-2 CFG OOMs by 1.4 GiB "
                         "beside the fp8-resident weights; the timing is "
                         "branch-content-independent so both branches "
                         "reuse the zero context)")
    ap.add_argument("--ffn-chunks", type=int, default=0,
                    help="chunk the FFN matmuls to cut DiT step temps "
                         "(~0.14 GiB per doubling at 29.6k tokens); needed "
                         "for --keep-decoder headroom")
    ap.add_argument("--layouts", choices=["default", "auto"],
                    default="default",
                    help="param layouts for the AOT step. 'auto' lets XLA "
                         "pick (it chose transposed kernels for the two "
                         "attention v leaves with ffn_chunks=4) but is "
                         "UNRELIABLE through the persistent compile cache: "
                         "the deserialized executable's reported "
                         "input_formats flipped between runs vs the layouts "
                         "it actually requires, so the ship lands weights "
                         "the call then rejects. 'default' pins the "
                         "reproducible default layouts (the recorded 56 s "
                         "run's AUTO pick was all-default anyway).")
    ap.add_argument("--keep-decoder", action="store_true",
                    help="keep the VAE decoder (0.13 GiB) resident through "
                         "the denoise stage so decode needs NO re-ship — "
                         "the full-VAE co-residency is infeasible "
                         "(probe_vae_memory: enc/dec chunk programs need "
                         "~4-5 GiB incl. streaming caches vs ~1.6 free)")
    ap.add_argument("--lora-rank", type=int, default=0,
                    help="attach rank-R runtime LoRA adapters (bf16 "
                         "'lora__' node; zero measured step overhead)")
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
        p = quantize_params_fp8(
            wan_dit.init_wan_dit(key, cfg, dtype=jnp.bfloat16))
        if args.lora_rank:
            # runtime adapters ride the tree as a 'lora__' node; the forward
            # fuses each block's delta in-scan (lora.fuse_block_adapters) —
            # the fp8-base + released-adapters serving combo, end to end
            from videocof_tpu.models.lora import _target_dims
            r, Ln = args.lora_rank, cfg.num_layers
            blocks = {}
            for n, ((mod, name), (din, dout)) in enumerate(
                    _target_dims(cfg).items()):
                k1, k2 = jax.random.split(jax.random.fold_in(key, 100 + n))
                blocks.setdefault(mod, {})[name] = {
                    "down": 0.01 * jax.random.normal(k1, (Ln, r, din),
                                                     jnp.bfloat16),
                    "up": 0.01 * jax.random.normal(k2, (Ln, dout, r),
                                                   jnp.bfloat16)}
            p["lora__"] = {"blocks": blocks, "scale": jnp.float32(1.0)}
        return p

    p_abs = jax.eval_shape(init_fp8, jax.random.PRNGKey(0))

    # VAE first (small, bf16) so its init program never competes with the
    # 14 GiB tree for workspace.
    vae_params = jax.jit(
        lambda k: wan_vae.init_wan_vae(k, vae_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    float(jnp.sum(jax.tree.leaves(vae_params)[0], dtype=jnp.float32))

    pipe = WanPipeline(None, cfg, vae_params, vae_cfg,
                       t5_params=None, t5_cfg=T5Config(), dtype=jnp.bfloat16)
    pipe.vae_decode_chunk = args.vae_chunk
    pipe.vae_encode_chunk = args.vae_chunk

    # 1) compile the consumer first, from abstract shapes. The step is
    # AOT-lowered with AUTO input layouts (see precompile_fused notes) and
    # returns (v, res): counter-intuitively, also returning the residual
    # lets XLA alias a stream buffer into the output — HLO temp drops from
    # 1.71 to 1.15 GiB, and 13.90 (args) + 1.15 + 0.26 (reserved) fits
    # where the 4-step fused trajectory (1.77 GiB temps) does not. The
    # sampler update runs as a separate tiny program per step — at ~10 s
    # per 14B step, two dispatches/step of tunnel overhead are noise.
    from jax.experimental.layout import Format, Layout
    tcr = vae_cfg.temporal_compression_ratio
    cond_ = (source_frames - 1) // tcr + 1
    Tl = cond_ + 1 + cond_
    Hl, Wl = height // 8, width // 8
    grid = (Tl, Hl // 2, Wl // 2)
    cos_r, sin_r = wan_dit.make_rope_for_geometry(cfg, grid, f_src=cond_,
                                                  f_ground=1)
    cos_r, sin_r = jnp.asarray(cos_r), jnp.asarray(sin_r)
    lat_abs = jax.ShapeDtypeStruct((1, 16, Tl, Hl, Wl), jnp.float32)
    t_abs = jax.ShapeDtypeStruct((1,), jnp.float32)
    c_abs = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim),
                                 jnp.bfloat16)

    def dit_step(p, lat, t, ctx, co, si):
        v, res = wan_dit.wan_dit_forward_with_residual(
            p, cfg, lat.astype(jnp.bfloat16), t, ctx, co, si,
            residual=None, skip_blocks=False)
        return v.at[:, :, :cond_].set(0.0), res  # source freeze

    t0 = time.time()
    jit_kw = ({"in_shardings": Format(Layout.AUTO)}
              if args.layouts == "auto" else {})
    step_compiled = jax.jit(dit_step, **jit_kw).lower(
        p_abs, lat_abs, t_abs, c_abs, cos_r, sin_r).compile()
    in_fmts = step_compiled.input_formats[0]
    fmts = in_fmts[0]
    nondefault = [
        (jax.tree_util.keystr(kp), f.layout.major_to_minor)
        for kp, f in jax.tree.flatten_with_path(fmts)[0]
        if f.layout.major_to_minor != tuple(range(len(
            f.layout.major_to_minor)))]
    if nondefault:
        print(f"non-default param layouts reported: {nondefault[:4]}"
              f"{'...' if len(nondefault) > 4 else ''}", file=sys.stderr)
    t_compile = time.time() - t0
    try:
        ma = step_compiled.memory_analysis()
        print(f"step AOT compile: {t_compile:.1f}s; temps "
              f"{ma.temp_size_in_bytes/2**30:.2f} GiB, args "
              f"{ma.argument_size_in_bytes/2**30:.2f} GiB, out "
              f"{ma.output_size_in_bytes/2**30:.2f} GiB", file=sys.stderr)
    except Exception:
        print(f"step AOT compile: {t_compile:.1f}s", file=sys.stderr)

    # 2) weights created IN the executable's formats. Device-side
    # init+quantize OOMs at the tail (fp8 total 13.83 GiB + the last 2 GiB
    # bf16 intermediate); host-side random leaves shipped one at a time
    # keep the device peak at params + one leaf (same trick as
    # probe_14b_fp8 --init host).
    import ml_dtypes

    state = {}

    def ship_weights():
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
        chk0 = float(jnp.asarray(
            jax.tree.leaves(params)[-1]).reshape(-1)[0].astype(jnp.float32))
        state["t_init"] = time.time() - t0
        state["pbytes"] = fp8_bytes(params)
        print(f"host init shipped into formats: {state['t_init']:.1f}s, "
              f"{state['pbytes']/2**30:.2f} GiB (leaf={chk0})",
              file=sys.stderr)
        pipe.dit_params = params
        return params

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (1, 3, source_frames, height, width),
                         dtype=np.uint8)
    embeds = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    # Staged drive, mirroring the reference's sequential offload
    # (`inference.py:306-321`) the TPU way: the VAE encoder needs ~2 GiB of
    # chunk activations, which only exist BEFORE the 13.83 GiB of weights
    # arrive — so encode first, then denoise resident, then decode (resident
    # if it fits, else free the weights first). On this tunnel a weight
    # re-ship is ~10 min, so per-video staging is only sensible on locally
    # attached chips — reported in the JSON for honesty.
    tc = vae_cfg.temporal_compression_ratio
    cond = (source_frames - 1) // tc + 1
    ground = 1

    def encode_once():
        jv = pipe._jit_cache.setdefault("u8_in", jax.jit(
            lambda x: x.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0))(
            jax.device_put(video))
        lat = pipe.prepare_cot_latents(jv, ground, jax.random.PRNGKey(7))
        float(jnp.sum(lat[:1, :1, :1, :1, :1], dtype=jnp.float32))
        return lat

    # warm+compile encode with the full chip free, then time it
    latents = encode_once()
    t0 = time.time()
    latents = encode_once()
    t_encode = time.time() - t0
    print(f"encode (pre-weights): {t_encode:.1f}s -> {latents.shape}",
          file=sys.stderr)

    # Staging: the 13.83 GiB trajectory runs with ~1.5 GiB of HLO temps —
    # every non-essential buffer must be off the chip.
    #
    # --keep-decoder: free only the ENCODER half (done for this video) and
    # keep the decoder + post_quant_conv (0.13 GiB) resident, so the decode
    # stage starts the moment the DiT is freed — no re-ship. Needs the
    # --ffn-chunks step-temp headroom.
    # Default: free the whole VAE, keep a host copy (0.24 GiB, ~8 s to
    # re-ship before decode).
    import gc
    vae_tdef = vae_host = None
    if args.keep_decoder:
        vp = pipe.vae_params
        dec_keep = {"decoder": vp["decoder"],
                    "post_quant_conv": vp["post_quant_conv"]}
        for x in jax.tree.leaves({"encoder": vp["encoder"],
                                  "quant_conv": vp["quant_conv"]}):
            x.delete()
        pipe.vae_params = dec_keep
    else:
        vae_leaves, vae_tdef = jax.tree.flatten(pipe.vae_params)
        vae_host = [np.asarray(x) for x in vae_leaves]
        for x in vae_leaves:
            x.delete()
        pipe.vae_params = None
        del vae_leaves
    jax.clear_caches()  # drop encode executables (their device constants too)
    gc.collect()

    def hbm(tag):
        try:
            ms = dev.memory_stats() or {}
            print(f"hbm[{tag}]: in_use={ms.get('bytes_in_use', 0)/2**30:.2f}G "
                  f"peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f}G",
                  file=sys.stderr)
        except Exception as e:
            print(f"hbm[{tag}]: unavailable ({e})", file=sys.stderr)

    hbm("pre-ship")
    params = ship_weights()
    hbm("post-ship")

    from videocof_tpu.schedulers import get_scheduler
    from videocof_tpu.pipeline.fused_sampler import _sampler_defs
    sched = get_scheduler("unipc")
    sched.set_timesteps(args.steps, shift=3.0)
    plan = {k: np.asarray(v) for k, v in sched.plan_arrays().items()}
    latents_of, update, init_carry, final = _sampler_defs("unipc")
    upd_jit = jax.jit(update)
    ctx_dev = jax.device_put(np.asarray(embeds), in_fmts[3])
    cos_dev = jax.device_put(np.asarray(cos_r), in_fmts[4])
    sin_dev = jax.device_put(np.asarray(sin_r), in_fmts[5])

    do_cfg = args.guidance > 1.0
    g = float(args.guidance)
    combine_jit = jax.jit(lambda vu, vc: vu + g * (vc - vu))

    def denoise_once():
        carry = jax.jit(init_carry)(latents)
        for i in range(args.steps):
            row = {k: np.asarray(v[i]) for k, v in plan.items()}
            lat_i = jax.device_put(latents_of(carry), in_fmts[1])
            t_i = jax.device_put(
                np.full((1,), plan["timestep"][i], np.float32), in_fmts[2])
            v, _res = step_compiled(pipe.dit_params, lat_i, t_i, ctx_dev,
                                    cos_dev, sin_dev)
            _res.delete()  # 290 MB; two alive would tip the 15.75G budget
            if do_cfg:
                # sequential CFG: second branch through the SAME executable
                v2, _res2 = step_compiled(pipe.dit_params, lat_i, t_i,
                                          ctx_dev, cos_dev, sin_dev)
                _res2.delete()
                vg = combine_jit(v, v2)
                v.delete()
                v2.delete()
                v = vg
            carry = upd_jit(carry, row, v)
            jax.block_until_ready(carry)
            v.delete()
        out = final(carry)
        float(jnp.sum(out[:1, :1, :1, :1, :1], dtype=jnp.float32))
        return out

    lat_out = denoise_once()  # warm (step AOT'd; update jit compiles)
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        lat_out = denoise_once()
        times.append(time.time() - t0)
    t_denoise = float(np.min(times))
    print(f"denoise ({args.steps} AOT steps): "
          f"{[f'{t:.2f}' for t in times]}", file=sys.stderr)

    # decode stage: free the DiT, then either decode straight away on the
    # resident decoder (--keep-decoder) or re-ship the VAE (t_vae_ship
    # counts toward the e2e wall — the staging cost, ~8 s for 0.24 GiB)
    lat_host = np.asarray(lat_out)  # keep the result across the staging
    pipe.dit_params = None
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    del params, lat_out
    gc.collect()
    if args.keep_decoder:
        t_vae_ship = 0.0
    else:
        t0 = time.time()
        pipe.vae_params = jax.tree.unflatten(
            vae_tdef, [jax.device_put(x) for x in vae_host])
        jax.block_until_ready(jax.tree.leaves(pipe.vae_params))
        t_vae_ship = time.time() - t0
    lat_dev = jnp.asarray(lat_host)
    decode_staged = True
    pipe._decode_outputs(lat_dev, True, cond, ground)  # compile + warm
    t0 = time.time()
    out = pipe._decode_outputs(lat_dev, True, cond, ground)
    t_decode = time.time() - t0
    print(f"decode (staged; vae re-ship {t_vae_ship:.1f}s): "
          f"{t_decode:.1f}s -> {out.videos.shape}", file=sys.stderr)
    value = t_encode + t_denoise + t_vae_ship + t_decode

    mem = {}
    try:
        ms = dev.memory_stats() or {}
        mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        pass

    metric = ("sec_per_video_%dstep_480p_14b_fp8%s%s"
              % (args.steps, "_cfg" if do_cfg else "",
                 f"_lora{args.lora_rank}" if args.lora_rank else ""))
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3), "unit": "s",
        "vs_baseline": round(value / 30.0, 4),
        "model": "wan2.1-t2v-14b fp8-resident on 1x v5e 16GB (reference: "
                 "14B bf16 + CPU offload on H100 80GB, ~30 s/video)",
        "params_gib": round(state["pbytes"] / 2**30, 2),
        "vae_chunk": args.vae_chunk,
        "ffn_chunks": args.ffn_chunks or cfg.ffn_chunks,
        "resident_decoder": bool(args.keep_decoder),
        "compile_s": round(t_compile, 1),
        "init_s": round(state["t_init"], 1),
        "stages": {"encode_s": round(t_encode, 2),
                   "denoise_s": round(t_denoise, 2),
                   "vae_reship_s": round(t_vae_ship, 2),
                   "decode_s": round(t_decode, 2)},
        "per_step_s": round(t_denoise / args.steps, 3),
        "guidance": args.guidance,
        "cfg_mode": "sequential" if do_cfg else None,
        "decode_staged": decode_staged,
        "staging": "encode runs before the weights ship (VAE chunk "
                   "activations need the headroom); decode resident if it "
                   "fits, else weights freed first — the TPU analogue of "
                   "the reference's sequential CPU offload",
        "hbm": mem,
    }))


if __name__ == "__main__":
    main()
