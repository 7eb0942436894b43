"""A/B the fused-quant int8 (Sage-style) attention vs the bf16 flash kernel
on the real TPU at the CoF inference geometries (VERDICT r2 #10).

v1 quantized Q/K with XLA ops before the kernel and LOST: 2.98 vs 1.80
s/step on the 1.3B headline (BASELINE.md negative results). v2 fuses
quantization into the kernel prologue (Q tile cached in scratch across the
KV iteration, K tile centered+quantized in VMEM per step); this probe
records whether that closes the gap. Same methodology as
probe_flash_blocks.py: jitted K-iteration scan + forced scalar fetch —
per-op microbenchmarks over the axon tunnel report garbage.

Usage:  python scripts/probe_int8_attention.py [--bn 12] [--len 29696]
                                               [--iters 8]
                                               [--int8-configs q:k,...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from videocof_tpu.ops.flash_attention import _flash_core
from videocof_tpu.ops.int8_attention import int8_flash_attention
from videocof_tpu.utils import jit_cache

INT8_CONFIGS = "1024:1024,512:1024,1024:512,2048:1024,512:512,256:512"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bn", type=int, default=12,
                    help="batch*heads (12 = 1.3B, 40 = 14B)")
    ap.add_argument("--len", type=int, default=29696, dest="length")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--int8-configs", type=str, default=INT8_CONFIGS)
    args = ap.parse_args()

    jit_cache.enable_persistent_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    BN, L, D = args.bn, args.length, 128
    scale = 1.0 / np.sqrt(D)
    flops = 4.0 * BN * float(L) * L * D * args.iters  # QK^T + PV per iter

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # BNLD layout for the bf16 core; BLND for the int8 wrapper
    q = jax.random.normal(kq, (BN, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (BN, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (BN, L, D), jnp.bfloat16)
    q4 = q.reshape(1, BN, L, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(1, BN, L, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(1, BN, L, D).transpose(0, 2, 1, 3)

    def timed(fn, *xs):
        t0 = time.time()
        float(fn(*xs))                  # compile + first run
        t_compile = time.time() - t0
        t0 = time.time()
        float(fn(*xs))                  # measured (forced fetch barrier)
        return time.time() - t0, t_compile

    # ---- bf16 baseline (production blocks 1024x1024)
    @jax.jit
    def run_bf16(q, k, v):
        def body(c, _):
            o = _flash_core(c, k, v, scale, 1024, 1024, False)
            return o.astype(jnp.bfloat16), ()
        o, _ = jax.lax.scan(body, q, None, length=args.iters)
        return jnp.float32(jnp.sum(o[0, 0]))

    wall, t_c = timed(run_bf16, q, k, v)
    t_bf16 = wall / args.iters
    print(f"bf16 q=1024 k=1024  {t_bf16 * 1e3:7.1f} ms/iter  "
          f"{flops / wall / 1e12:6.1f} TFLOP/s  (compile+warm {t_c:.1f}s)")

    # ---- int8 fused-quant sweep
    results = []
    for spec in args.int8_configs.split(","):
        bq, bk = (int(x) for x in spec.split(":"))

        @jax.jit
        def run_i8(q, k, v, bq=bq, bk=bk):
            def body(c, _):
                o = int8_flash_attention(c, k, v, scale=scale,
                                         block_q=bq, block_k=bk,
                                         interpret=False)
                return o.astype(jnp.bfloat16), ()
            o, _ = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.float32(jnp.sum(o[0, 0]))

        try:
            wall, t_c = timed(run_i8, q4, k4, v4)
        except Exception as e:  # Mosaic rejection / OOM at this tiling
            print(f"int8 q={bq:5d} k={bk:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        t_i8 = wall / args.iters
        print(f"int8 q={bq:5d} k={bk:5d}  {t_i8 * 1e3:7.1f} ms/iter  "
              f"{flops / wall / 1e12:6.1f} TFLOP/s  "
              f"({t_i8 / t_bf16:4.2f}x bf16)  (compile+warm {t_c:.1f}s)")
        results.append((wall, bq, bk))

    if results:
        results.sort()
        wall, bq, bk = results[0]
        t_i8 = wall / args.iters
        verdict = "WINS" if t_i8 < t_bf16 else "LOSES"
        print(f"\nbest int8: q={bq} k={bk}  {t_i8 * 1e3:.1f} ms/iter vs "
              f"bf16 {t_bf16 * 1e3:.1f} ms/iter -> int8 {verdict} "
              f"({t_i8 / t_bf16:.2f}x)")


if __name__ == "__main__":
    main()
