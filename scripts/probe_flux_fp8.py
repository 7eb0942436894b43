"""Flux-dev (12B) fp8-resident single-chip probe — real TPU.

Round-4 follow-through on the non-Wan families: CogVideoX got its TPU
number (BENCH_COG_HD64.json); this gives Flux one. Flux-dev bf16 is ~24 GB
— it cannot exist on a 16 GB v5e at all. With `load_flux(quantize="fp8")`
semantics (block AdaLN linears INCLUDED — `flux.FLUX_FP8_EXCLUDE`) the
resident model is ~11.9 GB and the full 1024x1024 step (4096 img + 512 txt
joint tokens, D=128 flash kernel) fits beside it — the same
fp8-resident staging that put the Wan 14B on this chip
(`scripts/probe_14b_fp8.py`, 79% MFU).

Same discipline as the 14B probe: AOT-compile the forward from abstract
shapes FIRST, then create the params directly in `compiled.input_formats`
(creating default-layout params and relaying out at dispatch would copy the
whole tree -> ResourceExhausted); float-fetch barriers (block_until_ready
does not surface remote errors on this transport).

Prints one JSON line; run:  python scripts/probe_flux_fp8.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def flux_matmul_flops(cfg, Li: int, Lt: int) -> int:
    """2*M*N*K matmul FLOPs of one forward (attention counted at 4*L^2*d
    for QK^T + AV; per-sample modulation matmuls are per-token-free and
    negligible)."""
    d = cfg.inner_dim
    L = Li + Lt
    per_block = 24 * L * d * d + 4 * L * L * d  # dual and single coincide
    blocks = (cfg.num_layers + cfg.num_single_layers) * per_block
    embed = 2 * Li * cfg.in_channels * d + 2 * Lt * cfg.joint_attention_dim \
        * d + 2 * Li * d * cfg.out_channels
    return blocks + embed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024,
                    help="square image size (1024 -> 4096 img tokens)")
    ap.add_argument("--txt", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="FLUX_TINY on CPU — structural smoke test only")
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    if not args.tiny:
        log(f"jit cache: {enable_persistent_compilation_cache()}")

    from videocof_tpu.models import flux as flux_lib
    from videocof_tpu.utils.fp8 import fp8_bytes, quantize_params_fp8

    cfg = flux_lib.FLUX_TINY.replace(guidance_embeds=True) if args.tiny \
        else flux_lib.FLUX_DEV
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    h_lat = w_lat = args.size // 8
    Li = (h_lat // 2) * (w_lat // 2)
    Lt = args.txt
    d = cfg.inner_dim

    yy, xx = np.meshgrid(np.arange(h_lat // 2), np.arange(w_lat // 2),
                         indexing="ij")
    img_ids = jnp.asarray(np.stack(
        [np.zeros_like(yy), yy, xx], axis=-1).reshape(Li, 3), jnp.float32)
    txt_ids = jnp.zeros((Lt, 3), jnp.float32)

    def init_fp8(key):
        return quantize_params_fp8(
            flux_lib.init_flux(key, cfg, dtype=jnp.bfloat16),
            exclude=flux_lib.FLUX_FP8_EXCLUDE)

    def fwd_sum(p, x, c, pooled, t, g, iids, tids):
        out = flux_lib.flux_forward(p, cfg, x, c, pooled, t, iids, tids,
                                    guidance=g)
        return jnp.sum(out[:, :2, :2])

    key = jax.random.PRNGKey(0)
    p_abs = jax.eval_shape(init_fp8, key)
    x_abs = jax.ShapeDtypeStruct((1, Li, cfg.in_channels), jnp.bfloat16)
    c_abs = jax.ShapeDtypeStruct((1, Lt, cfg.joint_attention_dim),
                                 jnp.bfloat16)
    pl_abs = jax.ShapeDtypeStruct((1, cfg.pooled_projection_dim),
                                  jnp.bfloat16)
    t = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 3.5, jnp.float32)

    t0 = time.time()
    compiled = jax.jit(fwd_sum).lower(p_abs, x_abs, c_abs, pl_abs, t, g,
                                      img_ids, txt_ids).compile()
    t_compile = time.time() - t0
    log(f"fwd compile: {t_compile:.1f}s")
    in_fmts = compiled.input_formats[0]
    want_p = in_fmts[0]

    def host_init(p_abs, want_p):
        """Random params built in numpy, shipped leaf-wise into the target
        formats (same scheme as probe_14b_fp8): one whole-tree device-side
        init+quantize program transiently needs the bf16 copy and
        ResourceExhausts at 12B — host init's device peak is accumulated
        fp8 + one leaf. fp8 leaves tile a 128-row template so the slow
        ml_dtypes cast touches ~2M values per leaf, not 12B; weight
        repetition is irrelevant for a timing probe."""
        import ml_dtypes

        from videocof_tpu.utils.layouts import device_put_into
        rng = np.random.default_rng(0)
        abs_leaves, tdef = jax.tree.flatten(p_abs)
        fmt_leaves = jax.tree.flatten(want_p)[0]
        out = []
        for a, fmt in zip(abs_leaves, fmt_leaves):
            if a.dtype == jnp.float8_e4m3fn:
                rows = min(128, a.shape[-2]) if a.ndim >= 2 else 1
                tpl = (rng.standard_normal(
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
                host = np.full(a.shape, 0.02, a.dtype)  # scales/biases
            else:
                host = (0.02 * rng.standard_normal(a.shape).astype(
                    np.float32)).astype(a.dtype)
            out.append(device_put_into(host, fmt))
            del host
        jax.block_until_ready(out)
        return jax.tree.unflatten(tdef, out)

    t0 = time.time()
    if args.tiny:
        params = jax.jit(init_fp8, out_shardings=want_p)(key)
    else:
        params = host_init(p_abs, want_p)
    probe_leaf = jax.tree.leaves(params)[-1]
    chk0 = float(jnp.asarray(probe_leaf).reshape(-1)[0].astype(jnp.float32))
    t_init = time.time() - t0
    pbytes = fp8_bytes(params)
    log(f"init+quantize (target layouts): {t_init:.1f}s, "
        f"params {pbytes/2**30:.2f} GiB (leaf0={chk0})")
    import gc
    jax.clear_caches()
    gc.collect()

    x = jax.jit(lambda k: jax.random.normal(k, x_abs.shape, x_abs.dtype),
                out_shardings=in_fmts[1])(jax.random.PRNGKey(1))
    ctx = jax.jit(lambda k: 0.1 * jax.random.normal(k, c_abs.shape,
                                                    c_abs.dtype),
                  out_shardings=in_fmts[2])(jax.random.PRNGKey(2))
    pooled = jax.jit(lambda k: 0.1 * jax.random.normal(k, pl_abs.shape,
                                                       pl_abs.dtype),
                     out_shardings=in_fmts[3])(jax.random.PRNGKey(3))
    t = jax.device_put(t, in_fmts[4])
    g = jax.device_put(g, in_fmts[5])
    img_ids = jax.device_put(img_ids, in_fmts[6])
    txt_ids = jax.device_put(txt_ids, in_fmts[7])

    t0 = time.time()
    chk = float(compiled(params, x, ctx, pooled, t, g, img_ids, txt_ids))
    t_first = time.time() - t0
    log(f"first step: {t_first:.1f}s, checksum={chk}")
    if not np.isfinite(chk):
        raise SystemExit(f"non-finite output: {chk}")

    times = []
    for _ in range(args.steps):
        t0 = time.time()
        float(compiled(params, x, ctx, pooled, t, g, img_ids, txt_ids))
        times.append(time.time() - t0)
    step_s = float(np.median(times))
    log(f"steps: {[f'{s:.3f}' for s in times]}")

    flops = flux_matmul_flops(cfg, Li, Lt)
    tflops = flops / step_s / 1e12
    mem = {}
    try:
        ms = dev.memory_stats() or {}
        mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        pass

    print(json.dumps({
        "model": "flux-tiny(smoke)" if args.tiny else "flux-dev-12b",
        "quantize": "fp8",
        "img_tokens": Li, "txt_tokens": Lt, "size": args.size,
        "step_s": round(step_s, 3),
        "tflops_per_s": round(tflops, 1),
        "mfu_vs_v5e_197tflops": round(tflops / 197.0, 3),
        "params_gib": round(pbytes / 2**30, 2),
        "init_plus_overhead_s": round(t_init, 1),
        "compile_s": round(t_compile, 1),
        "hbm": mem,
    }))


if __name__ == "__main__":
    main()
