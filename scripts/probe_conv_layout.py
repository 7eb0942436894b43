"""Probe: 3D-conv throughput on the TPU for the VAE decoder's hot shapes,
NCDHW (torch layout, what wan_vae.py uses today) vs NDHWC (channels-last).

The decoder's last stage runs 6 full-res 3x3x3 convs at 96 channels over
480x832xT pixels (~40 TFLOP for the headline's 34 frames) yet the measured
decode stage is ~6 s on a 197-TFLOP/s v5e — ~5% efficiency. If XLA's TPU
conv emitter is layout-bound this probe shows it directly; if both layouts
time the same, the decode cost is elsewhere (dispatch overhead, fetch,
upsample reshuffles) and a channels-last rewrite would be wasted work.

Each timing is one whole-program dispatch + block (the only faithful timing
on the async axon tunnel). Shapes are the decoder's real per-stage geometry
at 480p with a reduced frame count (fits HBM without the DiT resident).

Usage: python scripts/probe_conv_layout.py [--frames 9]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=9,
                    help="full-res frame count (34 = headline edit segment; "
                         "9 keeps the probe light)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    T = args.frames
    # (label, Cin, Cout, (T, H, W)) — decoder stages at 480x832 output res
    cases = [
        ("stage3_fullres_96", 96, 96, (T, 480, 832)),
        ("stage2_halfres_192", 192, 192, (T, 240, 416)),
        ("stage01_qres_384", 384, 384, ((T + 1) // 2, 120, 208)),
    ]

    INNER = 10

    def bench(fn, *xs, reps=2):
        # One whole program scanning the conv INNER times -> one scalar
        # fetch as the barrier: block_until_ready on this tunnel neither
        # blocks nor surfaces remote errors (CLAUDE.md), and per-dispatch
        # timing is async garbage.
        float(fn(*xs))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(*xs))
            ts.append(time.time() - t0)
        return min(ts) / INNER

    report = {}
    for label, cin, cout, (t, h, w) in cases:
        key = jax.random.PRNGKey(0)
        flops = 2 * cin * cout * 27 * t * h * w
        row = {"tflop": round(flops / 1e12, 2)}

        # NCDHW (current wan_vae layout)
        x = jax.jit(lambda k: jax.random.normal(
            k, (1, cin, t, h, w), jnp.bfloat16))(key)
        kern = jax.jit(lambda k: jax.random.normal(
            k, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.02)(key)

        @jax.jit
        def conv_ncdhw(x, kern):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, kern, (1, 1, 1), ((2, 0), (1, 1), (1, 1)),
                    dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
                return y, jnp.sum(y, dtype=jnp.float32)
            _, sums = jax.lax.scan(body, x, None, length=INNER)
            return jnp.sum(sums)

        dt = bench(conv_ncdhw, x, kern)
        row["ncdhw_s"] = round(dt, 4)
        row["ncdhw_tflops"] = round(flops / dt / 1e12, 1)
        del x

        # NDHWC channels-last
        xl = jax.jit(lambda k: jax.random.normal(
            k, (1, t, h, w, cin), jnp.bfloat16))(key)
        kernl = jax.jit(lambda k: jax.random.normal(
            k, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02)(key)

        @jax.jit
        def conv_ndhwc(x, kern):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, kern, (1, 1, 1), ((2, 0), (1, 1), (1, 1)),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                return y, jnp.sum(y, dtype=jnp.float32)
            _, sums = jax.lax.scan(body, x, None, length=INNER)
            return jnp.sum(sums)

        dt = bench(conv_ndhwc, xl, kernl)
        row["ndhwc_s"] = round(dt, 4)
        row["ndhwc_tflops"] = round(flops / dt / 1e12, 1)
        del xl

        report[label] = row
        print(f"{label}: {row}", file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
