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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videocof_tpu.configs import WAN21_T2V_14B, WanVAEConfig, T5Config
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline
    from videocof_tpu.utils.fp8 import fp8_bytes, quantize_params_fp8

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    cfg = WAN21_T2V_14B.replace(stream_dtype="bfloat16",
                                rope_dtype="bfloat16",
                                token_pad_multiple=128)
    vae_cfg = WanVAEConfig()
    height, width, source_frames, reasoning_frames = 480, 832, 33, 4

    def init_fp8(key):
        return quantize_params_fp8(
            wan_dit.init_wan_dit(key, cfg, dtype=jnp.bfloat16))

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

    # 1) compile the consumer first, from abstract shapes
    t0 = time.time()
    # precompile_fused lowers with AUTO input layouts — without that, the
    # trajectory program hoists full relayout copies of the attention V
    # weight stacks (2x 1000 MB temps) and OOMs beside 13.86 GiB of fp8
    # arguments. See the memory notes in WanPipeline.precompile_fused.
    fmts = pipe.precompile_fused(
        height=height, width=width, source_frames=source_frames,
        reasoning_frames=reasoning_frames,
        num_inference_steps=args.steps, guidance_scale=1.0, shift=3.0,
        sampler="unipc", dit_param_abstract=p_abs)
    t_compile = time.time() - t0
    print(f"fused AOT compile: {t_compile:.1f}s", file=sys.stderr)

    # 2) weights created IN the executable's formats. Device-side
    # init+quantize OOMs at the tail (fp8 total 13.83 GiB + the last 2 GiB
    # bf16 intermediate); host-side random leaves shipped one at a time
    # keep the device peak at params + one leaf (same trick as
    # probe_14b_fp8 --init host).
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
        shipped.append(jax.device_put(host, fmt))
        del host
    jax.block_until_ready(shipped)
    params = jax.tree.unflatten(tdef, shipped)
    chk0 = float(jnp.asarray(
        jax.tree.leaves(params)[-1]).reshape(-1)[0].astype(jnp.float32))
    t_init = time.time() - t0
    pbytes = fp8_bytes(params)
    print(f"host init shipped into formats: {t_init:.1f}s, "
          f"{pbytes/2**30:.2f} GiB (leaf={chk0})", file=sys.stderr)
    pipe.dit_params = params

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (1, 3, source_frames, height, width),
                         dtype=np.uint8)
    embeds = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    def run():
        return pipe(video, prompt="bench", source_frames=source_frames,
                    reasoning_frames=reasoning_frames,
                    num_inference_steps=args.steps, guidance_scale=1.0,
                    shift=3.0, sampler="unipc", repeat_rope=True, cot=True,
                    prompt_embeds=embeds, fused_sampling=True)

    t0 = time.time()
    out = run()  # VAE executables compile here; DiT executable is AOT'd
    print(f"first call (vae compiles + run): {time.time()-t0:.1f}s; "
          f"out {out.videos.shape}", file=sys.stderr)

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = run()
        times.append(time.time() - t0)
    value = float(np.min(times))
    print(f"times: {[f'{t:.2f}' for t in times]}", file=sys.stderr)

    mem = {}
    try:
        ms = dev.memory_stats() or {}
        mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        pass

    print(json.dumps({
        "metric": "sec_per_video_4step_480p_14b_fp8",
        "value": round(value, 3), "unit": "s",
        "vs_baseline": round(value / 30.0, 4),
        "model": "wan2.1-t2v-14b fp8-resident on 1x v5e 16GB (reference: "
                 "14B bf16 + CPU offload on H100 80GB, ~30 s/video)",
        "params_gib": round(pbytes / 2**30, 2),
        "vae_chunk": args.vae_chunk,
        "compile_s": round(t_compile, 1),
        "init_s": round(t_init, 1),
        "hbm": mem,
    }))


if __name__ == "__main__":
    main()
