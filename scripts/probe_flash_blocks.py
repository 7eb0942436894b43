"""Autotune sweep for the Pallas flash-attention block sizes on the real TPU.

Times ONLY the attention op (jitted K-iteration scan + forced scalar fetch —
per-op microbenchmarks over the axon tunnel report garbage, whole-program
walls don't) at the CoF inference geometries:

  1.3B: BN = 12 heads,  L = 29,696 tokens (padded), D = 128
  14B:  BN = 40 heads,  same L/D                  (--bn 40)

Usage:  python scripts/probe_flash_blocks.py [--bn 12] [--len 29696]
                                             [--iters 8] [--configs q:k,...]

Each config is a separate tiny executable (seconds to compile remotely, not
the 8-20 min full-DiT graphs); results print one line per config plus a
ranked summary. The production default lives in ops/flash_attention.py
(VIDEOCOF_FLASH_BLOCK_Q/K override).
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
from videocof_tpu.utils import jit_cache

DEFAULT_CONFIGS = "1024:1024,2048:1024,1024:2048,2048:512,512:1024,2048:2048"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bn", type=int, default=12,
                    help="batch*heads (12 = 1.3B, 40 = 14B)")
    ap.add_argument("--len", type=int, default=29696, dest="length")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--configs", type=str, default=DEFAULT_CONFIGS)
    ap.add_argument("--bwd", action="store_true",
                    help="sweep the TRAINING path: full vjp (fwd-with-LSE "
                         "+ dq kernel + dkv kernel) per config")
    args = ap.parse_args()

    jit_cache.enable_persistent_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    BN, L, D = args.bn, args.length, 128
    scale = 1.0 / np.sqrt(D)
    flops = 4.0 * BN * float(L) * L * D * args.iters  # QK^T + PV per iter

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (BN, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (BN, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (BN, L, D), jnp.bfloat16)

    if args.bwd:
        # training-path FLOPs through the custom VJP: fwd (4 L^2 D) + dq
        # kernel (recompute s + ds + dq = 6) + dkv kernel (s + dp + dv + dk
        # = 8) per L^2 D pair
        flops = 18.0 * BN * float(L) * L * D * args.iters

    results = []
    for spec in args.configs.split(","):
        bq, bk = (int(x) for x in spec.split(":"))

        @jax.jit
        def run(q, k, v, bq=bq, bk=bk):
            def body(c, _):
                if args.bwd:
                    def f(qq, kk, vv):
                        return jnp.sum(
                            _flash_core(qq, kk, vv, scale, bq, bk, False)
                            .astype(jnp.float32) * 1e-3)
                    _, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(
                        c, k, v)
                    # feed dq back so iterations serialize
                    return grads[0].astype(jnp.bfloat16), ()
                o = _flash_core(c, k, v, scale, bq, bk, False)
                # feed o back so iterations serialize (no dead-code collapse)
                return o.astype(jnp.bfloat16), ()
            o, _ = jax.lax.scan(body, q, None, length=args.iters)
            return jnp.float32(jnp.sum(o[0, 0]))

        try:
            t0 = time.time()
            float(run(q, k, v))          # compile + first run
            t_compile = time.time() - t0
            t0 = time.time()
            float(run(q, k, v))          # measured (forced fetch barrier)
            wall = time.time() - t0
        except Exception as e:  # Mosaic rejection / OOM at this tiling
            print(f"q={bq:5d} k={bk:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        tflops = flops / wall / 1e12
        print(f"q={bq:5d} k={bk:5d}  {wall / args.iters * 1e3:7.1f} ms/iter  "
              f"{tflops:6.1f} TFLOP/s  (compile+warm {t_compile:.1f}s)")
        results.append((wall, bq, bk, tflops))

    if results:
        results.sort()
        wall, bq, bk, tflops = results[0]
        print(f"\nbest: q={bq} k={bk}  {wall / args.iters * 1e3:.1f} ms/iter "
              f"= {tflops:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
