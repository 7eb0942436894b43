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
    ap.add_argument("--stream-dtype", type=str, default="bfloat16",
                    help="residual-stream dtype (bfloat16 fits the 16 GB "
                         "chip at 29.6k tokens; float32 OOMs by ~1.1 GB)")
    args = ap.parse_args()
    f, h, w = (int(x) for x in args.grid.split(","))

    cfg = WAN21_T2V_14B.replace(stream_dtype=args.stream_dtype,
                                rope_dtype=args.stream_dtype)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    t0 = time.time()

    @jax.jit
    def init_fp8(key):
        p = wan_dit.init_wan_dit(key, cfg, dtype=jnp.bfloat16)
        return quantize_params_fp8(p)

    params = init_fp8(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    t_init = time.time() - t0
    pbytes = fp8_bytes(params)
    print(f"init+quantize: {t_init:.1f}s, params {pbytes/2**30:.2f} GiB",
          file=sys.stderr)

    L = f * h * w
    pt, ph, pw = cfg.patch_size
    x = jnp.zeros((1, cfg.in_dim, f * pt, h * ph, w * pw), jnp.bfloat16)
    t = jnp.full((1,), 800.0, jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w),
                                              f_src=9, f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    fwd = jax.jit(lambda p, x, t, c, co, si: wan_dit.wan_dit_forward(
        p, cfg, x, t, c, co, si))

    t0 = time.time()
    out = fwd(params, x, t, ctx, cos, sin)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    print(f"first step (compile+run): {t_compile:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.steps):
        t0 = time.time()
        out = fwd(params, x, t, ctx, cos, sin)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    step_s = float(np.median(times))

    flops = dit_matmul_flops(cfg, L)
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
        "tokens": L, "grid": [f, h, w],
        "step_s": round(step_s, 3),
        "tflops_per_s": round(tflops, 1),
        "mfu_vs_v5e_197tflops": round(tflops / 197.0, 3),
        "params_gib": round(pbytes / 2**30, 2),
        "init_s": round(t_init, 1), "compile_s": round(t_compile, 1),
        "hbm": mem,
    }))


if __name__ == "__main__":
    main()
