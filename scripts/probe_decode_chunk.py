"""Sweep the streaming-VAE decode chunk size in the REAL pipeline context.

`vae_decode_chunk=2` has been the default since round 1 ("chunk 4 is faster
but OOM-marginal beside 1.3B weights" — an early, pre-in-program-u8
measurement). The decode stage is now the largest 1.3B e2e tail
(~5.7 s of 14.4 s, BENCH_r04_validation.json), so re-measure the sweep under
the CURRENT decode path (decode_streaming_u8 one-dispatch-per-chunk, single
I420-aware fetch) with the 1.3B DiT weights RESIDENT — the exact HBM context
the post-denoise decode runs in.

Per chunk size c in --chunks: warm once (compile), then alternating timed
reps of `pipe._decode_outputs(latents, cot=True, 9, 1)` — the full
ground+edit segment decode INCLUDING the host fetch, exactly the stage the
bench times. Prints one JSON line with per-chunk medians + HBM stats.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-dit", action="store_true",
                    help="skip the resident DiT weights (headroom A/B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    log(f"jit cache: {enable_persistent_compilation_cache()}")

    from videocof_tpu.configs import WAN21_T2V_1_3B, T5Config, WanVAEConfig
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    dit_cfg = WAN21_T2V_1_3B.replace(stream_dtype="bfloat16",
                                     token_pad_multiple=128)
    vae_cfg = WanVAEConfig()

    dit_params = None
    if not args.no_dit:
        dit_params = jax.jit(lambda k: wan_dit.init_wan_dit(
            k, dit_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    vae_params = jax.jit(lambda k: wan_vae.init_wan_vae(
        k, vae_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    pipe = WanPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                       t5_params=None, t5_cfg=T5Config(), dtype=jnp.bfloat16)
    log("init done")

    # post-denoise latent at the default 33+4f 480x832 geometry:
    # cond 9 + ground 1 + edit 9 = 19 latent frames
    lat = jax.jit(lambda k: jax.random.normal(
        k, (1, 16, 19, 60, 104), jnp.float32))(jax.random.PRNGKey(2))
    jax.block_until_ready(lat)

    def mem_stats():
        try:
            s = jax.devices()[0].memory_stats()
            return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                    if k in s}
        except Exception:
            return {}

    results = {}
    for c in args.chunks:
        pipe.vae_decode_chunk = c
        t0 = time.time()
        try:
            out = pipe._decode_outputs(lat, True, 9, 1)
        except Exception as e:  # OOM or Mosaic failure: record and move on
            results[c] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"chunk {c}: FAILED {results[c]['error']}")
            continue
        results[c] = {"warm_s": round(time.time() - t0, 2),
                      "out_frames": int(out.videos.shape[2]), "walls": []}
        log(f"chunk {c}: warm {results[c]['warm_s']}s "
            f"out {out.videos.shape} mem {mem_stats()}")

    ok = [c for c in args.chunks if "error" not in results[c]]
    for r in range(args.reps):
        for c in list(ok):
            pipe.vae_decode_chunk = c
            t0 = time.time()
            try:
                pipe._decode_outputs(lat, True, 9, 1)
            except Exception as e:
                # A chunk that warmed can still OOM on a later rep once HBM
                # is fragmented by the bigger chunks' executables — record
                # and drop it rather than killing the sweep.
                results[c]["error"] = (
                    f"rep {r}: {type(e).__name__}: {str(e)[:300]}")
                log(f"rep {r} chunk {c}: FAILED {results[c]['error']}")
                ok.remove(c)
                continue
            w = time.time() - t0
            results[c]["walls"].append(round(w, 2))
            log(f"rep {r} chunk {c}: {w:.2f}s")

    for c in ok:
        results[c]["median_s"] = round(float(np.median(
            results[c]["walls"])), 2)

    from videocof_tpu.utils import transport
    mbps = transport.measured_fetch_mbps(8, refresh=True)
    print(json.dumps({
        "metric": "decode_chunk_sweep_1.3b_resident",
        "dit_resident": not args.no_dit,
        "results": {str(c): results[c] for c in args.chunks},
        "transport_fetch_mbps": round(float(mbps), 1),
        "mem": mem_stats(),
    }))


if __name__ == "__main__":
    main()
