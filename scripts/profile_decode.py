"""VAE-decode stage profiler: where do the ~7 s of the headline's decode go?

Breaks the 480p decode stage into its real costs on the axon TPU:
  * per-chunk streaming dispatches (dec_init + dec_step xN) at chunk=2/4/8,
    each timed as one whole-program dispatch + block (the only timing the
    async tunnel reports faithfully),
  * the eager concat+clip+uint8 tail,
  * the device->host uint8 fetch.

Runs with the 1.3B DiT weights RESIDENT (bf16) so the memory headroom
matches the headline bench; chunk sizes that OOM beside them are reported
as such instead of crashing the probe.

Usage:  python scripts/profile_decode.py [--frames 9] [--height 480]
        [--width 832] [--chunks 2,4,8] [--no-dit]
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
    ap.add_argument("--frames", type=int, default=9,
                    help="latent frames (edit segment of the 33f headline)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--chunks", type=str, default="2,4,8")
    ap.add_argument("--no-dit", action="store_true",
                    help="skip loading the 1.3B weights (max headroom)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videocof_tpu.configs import WAN21_T2V_1_3B, WanVAEConfig
    from videocof_tpu.models import wan_dit, wan_vae, wan_vae_streaming

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(
        lambda k: wan_vae.init_wan_vae(k, vae_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    dit_params = None
    if not args.no_dit:
        dit_params = jax.jit(
            lambda k: wan_dit.init_wan_dit(k, WAN21_T2V_1_3B,
                                           dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(1))
        n = sum(x.size for x in jax.tree.leaves(dit_params))
        print(f"resident DiT: {n/1e9:.2f}B bf16", file=sys.stderr)

    Tl, Hl, Wl = args.frames, args.height // 8, args.width // 8
    z = jax.jit(lambda k: jax.random.normal(
        k, (1, 16, Tl, Hl, Wl), jnp.bfloat16))(jax.random.PRNGKey(2))
    float(z[0, 0, 0, 0, 0])  # force materialization (real error barrier)

    report = {"frames_latent": Tl, "hw": [args.height, args.width],
              "dit_resident": not args.no_dit, "chunks": {}}

    for chunk in [int(c) for c in args.chunks.split(",")]:
        jit_cache = {}
        row = {}
        try:
            # compile + warm both executables
            for o in wan_vae_streaming.decode_streaming_chunks(
                    vae_params, vae_cfg, z, jit_cache=jit_cache,
                    chunk_latent=chunk):
                float(jnp.sum(o, dtype=jnp.float32))
            # timed pass: per-dispatch walls. block_until_ready is NOT a
            # reliable barrier on the axon tunnel (reports ~0 for real work)
            # — force a scalar fetch per chunk (~50 ms round-trip, reported
            # separately so it can be subtracted).
            t0 = time.time()
            float(jnp.sum(z[:1, :1, :1, :1, :1], dtype=jnp.float32))
            rtt = time.time() - t0
            row["fetch_rtt_s"] = round(rtt, 3)
            t_disp = []
            gen = wan_vae_streaming.decode_streaming_chunks(
                vae_params, vae_cfg, z, jit_cache=jit_cache,
                chunk_latent=chunk)
            t0 = time.time()
            chunks_out = []
            for o in gen:
                float(jnp.sum(o, dtype=jnp.float32))
                t_disp.append(time.time() - t0)
                chunks_out.append(o)
                t0 = time.time()
            # eager tail: concat + clip + u8
            t0 = time.time()
            u8 = jax.jit(lambda xs: jnp.clip(
                jnp.round((jnp.concatenate(xs, axis=2).astype(jnp.float32)
                           * 127.5 + 127.5)), 0, 255).astype(jnp.uint8)
            )(chunks_out)
            float(jnp.sum(u8[:1, :1, :1, :1, :1], dtype=jnp.float32))
            row["tail_jit_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            host = np.asarray(u8)
            row["fetch_s"] = round(time.time() - t0, 3)
            row["fetch_mb"] = round(host.nbytes / 1e6, 1)
            row["dispatch_s"] = [round(t, 3) for t in t_disp]
            row["decode_total_s"] = round(sum(t_disp), 3)
            row["total_s"] = round(sum(t_disp) + row["tail_jit_s"]
                                   + row["fetch_s"], 3)
        except Exception as e:  # noqa: BLE001 — OOM boundary is a result
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        report["chunks"][str(chunk)] = row
        print(f"chunk={chunk}: {row}", file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
