"""14B-on-one-chip probe: fp8 DiT step at the flagship CoF geometry.

Answers VERDICT r1 #4 ("the flagship 14B path has never been exercised"):
init Wan2.1-T2V-14B weights DIRECTLY in fp8 on the device (inside one jit,
so the bf16 intermediates die leaf-by-leaf and never coexist), then run the
compiled DiT forward at the 480x832 33+4 CoF edit geometry (19x30x52 latent
grid = 29,640 tokens) and report wall time + HBM + derived FLOP/s.

Run on the real TPU:  python scripts/probe_14b_fp8.py [--tokens-scale 1.0]
Writes one JSON line to stdout.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from videocof_tpu.utils.jit_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()

from videocof_tpu.configs import WAN21_T2V_14B
from videocof_tpu.models import wan_dit
from videocof_tpu.utils.fp8 import fp8_bytes, quantize_params_fp8


def dit_matmul_flops(cfg, L: int) -> float:
    d, f = cfg.dim, cfg.ffn_dim
    per_block = 2 * L * (4 * d * d          # self q/k/v/o
                         + 4 * d * d        # cross q/k/v/o (text len ~ small)
                         + 2 * d * f)       # ffn
    attn = 4 * L * L * d                    # qk^T + pv
    head = 2 * L * d * (cfg.patch_size[0] * cfg.patch_size[1]
                        * cfg.patch_size[2] * cfg.out_dim)
    embed = 2 * L * cfg.in_dim * 4 * d
    return cfg.num_layers * (per_block + attn) + head + embed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=str, default="19,30,52",
                    help="latent grid f,h,w (default = 480x832, 33+4 CoF)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--init", type=str, default="device",
                    choices=["device", "host"],
                    help="host: build random fp8 params in numpy and ship "
                         "leaf-wise into the fwd's input formats (avoids "
                         "any big device-side init program)")
    ap.add_argument("--batch", type=int, default=1,
                    help="batch size (2 = the CFG-doubled step of the "
                         "reference standard 50-step path)")
    ap.add_argument("--stream-dtype", type=str, default="bfloat16",
                    help="residual-stream dtype (bfloat16 fits the 16 GB "
                         "chip at 29.6k tokens; float32 OOMs by ~1.1 GB)")
    ap.add_argument("--lora-rank", type=int, default=0,
                    help="attach rank-R RUNTIME LoRA adapters (bf16 "
                         "'lora__' node, per-block in-scan fusion) — the "
                         "fp8-base + released-adapters serving combo")
    args = ap.parse_args()
    f, h, w = (int(x) for x in args.grid.split(","))

    cfg = WAN21_T2V_14B.replace(stream_dtype=args.stream_dtype,
                                rope_dtype=args.stream_dtype,
                                token_pad_multiple=128)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    L = f * h * w
    pt, ph, pw = cfg.patch_size
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w),
                                              f_src=(f - 1) // 2, f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    def init_fp8(key):
        p = quantize_params_fp8(
            wan_dit.init_wan_dit(key, cfg, dtype=jnp.bfloat16))
        if args.lora_rank:
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
            p["lora__"] = {"blocks": blocks,
                           "scale": jnp.float32(1.0)}
        return p

    def fwd_sum(p, x, t, c, co, si):
        out = wan_dit.wan_dit_forward(p, cfg, x, t, c, co, si)
        return jnp.sum(out[:, :, :1, :2, :2])

    key = jax.random.PRNGKey(0)
    p_abs = jax.eval_shape(init_fp8, key)
    x_abs = jax.ShapeDtypeStruct((args.batch, cfg.in_dim, f * pt, h * ph, w * pw),
                                 jnp.bfloat16)
    t = jnp.full((args.batch,), 800.0, jnp.float32)
    c_abs = jax.ShapeDtypeStruct((args.batch, cfg.text_len, cfg.text_dim),
                                 jnp.bfloat16)

    # Compile the forward FIRST (from abstract shapes), then create the
    # params DIRECTLY in its expected input formats (out_shardings of the
    # init program). Creating them in default layouts and relaying out
    # would transiently double the largest 2.8 GiB stacked leaf — and
    # letting the runtime relayout at dispatch copies the whole 13.8 GiB
    # tree -> ResourceExhausted either way on a 16 GB chip.
    t0 = time.time()
    compiled = jax.jit(fwd_sum).lower(p_abs, x_abs, t, c_abs, cos,
                                      sin).compile()
    t_compile = time.time() - t0
    print(f"fwd compile: {t_compile:.1f}s", file=sys.stderr)
    in_fmts = compiled.input_formats[0]
    want_p = in_fmts[0]

    def host_init(p_abs, want_p):
        """Random params built in numpy, shipped leaf-wise into the target
        formats — device peak = accumulated params + one leaf. fp8 leaves
        tile a 128-row random template (the slow ml_dtypes cast runs on
        ~2M values per leaf, not 2.8B; weight repetition is irrelevant for
        a timing probe, and outputs stay finite)."""
        import ml_dtypes
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
            from videocof_tpu.utils.layouts import device_put_into
            out.append(device_put_into(host, fmt))
            del host
        jax.block_until_ready(out)
        return jax.tree.unflatten(tdef, out)

    t0 = time.time()
    if args.init == "host":
        params = host_init(p_abs, want_p)
        init_jit = None
    else:
        init_jit = jax.jit(init_fp8, out_shardings=want_p)
        params = init_jit(key)
    # block_until_ready does NOT surface remote-execution errors on this
    # transport; a value fetch is the only real barrier
    probe_leaf = jax.tree.leaves(params)[-1]
    chk0 = float(jnp.asarray(probe_leaf).reshape(-1)[0].astype(jnp.float32))
    t_init = time.time() - t0
    pbytes = fp8_bytes(params)
    print(f"init+quantize (target layouts): {t_init:.1f}s, "
          f"params {pbytes/2**30:.2f} GiB (leaf0={chk0})", file=sys.stderr)
    if init_jit is not None:
        # drop the init executable: its workspace otherwise lingers
        del init_jit
        import gc
        jax.clear_caches()
        gc.collect()

    x = jax.jit(lambda k: jax.random.normal(k, x_abs.shape, x_abs.dtype),
                out_shardings=in_fmts[1])(jax.random.PRNGKey(1))
    t = jax.device_put(t, in_fmts[2])
    ctx = jax.jit(lambda k: 0.1 * jax.random.normal(k, c_abs.shape,
                                                    c_abs.dtype),
                  out_shardings=in_fmts[3])(jax.random.PRNGKey(2))
    cos = jax.device_put(cos, in_fmts[4])
    sin = jax.device_put(sin, in_fmts[5])

    # device->host fetch is the only trustworthy barrier over the tunnel
    t0 = time.time()
    chk = float(compiled(params, x, t, ctx, cos, sin))
    t_first = time.time() - t0
    print(f"first step: {t_first:.1f}s, checksum={chk}", file=sys.stderr)
    if not np.isfinite(chk):
        raise SystemExit(f"non-finite output: {chk}")

    times = []
    for _ in range(args.steps):
        t0 = time.time()
        float(compiled(params, x, t, ctx, cos, sin))
        times.append(time.time() - t0)
    step_s = float(np.median(times))
    print(f"steps: {[f'{s:.2f}' for s in times]}", file=sys.stderr)

    flops = args.batch * dit_matmul_flops(cfg, L)
    tflops = flops / step_s / 1e12
    mem = {}
    try:
        ms = dev.memory_stats() or {}
        mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        pass

    print(json.dumps({
        "model": "wan2.1-t2v-14b", "quantize": "fp8",
        "lora_rank": args.lora_rank or None,
        "tokens": L, "grid": [f, h, w], "batch": args.batch,
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
