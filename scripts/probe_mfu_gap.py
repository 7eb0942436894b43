"""Quantify the 1.3B-vs-14B MFU gap on the real chip (VERDICT r4 #6).

The 14B fp8 step runs ~79% MFU, the 1.3B ~68%, through the SAME flash
kernel. This probe decomposes the 1.3B step at the CoF geometry
(19x30x52 = 29,640 tokens) with whole-program walls (the only timing the
async tunnel reports faithfully):

  full          the bench step (stream bf16, rope fp32, pad 128)
  rope_bf16     + rope_dtype=bfloat16 (the 14B lever, default-off on 1.3B)
  blocks_only   just the 30-block scan on a pre-embedded stream — the
                full-minus-blocks delta is patch-embed + time/text MLPs +
                head + unpatchify (the non-block overhead)
  attn_iter     the flash self-attention alone, 30 iterations (the pure
                kernel share of the step)

Run: python scripts/probe_mfu_gap.py [--reps 3]
Prints one JSON line.
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", default="19,30,52")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    log(f"jit cache: {enable_persistent_compilation_cache()}")

    from videocof_tpu.configs import WAN21_T2V_1_3B, WAN_TINY
    from videocof_tpu.models import wan_dit
    from videocof_tpu.utils.profiling import dit_matmul_flops

    base_cfg = (WAN_TINY if args.cpu else WAN21_T2V_1_3B).replace(
        stream_dtype="bfloat16", token_pad_multiple=128)
    f, h, w = (int(x) for x in args.grid.split(","))
    if args.cpu:
        f, h, w = 5, 4, 4
    tokens = f * h * w
    pt, ph, pw = base_cfg.patch_size

    params = jax.jit(lambda k: wan_dit.init_wan_dit(
        k, base_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log("init done")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (1, base_cfg.in_dim, f * pt, h * ph, w * pw)), jnp.bfloat16)
    ctx = jnp.zeros((1, base_cfg.text_len, base_cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 800.0, jnp.float32)
    cos, sin = wan_dit.make_rope_for_geometry(
        base_cfg, (f, h, w), f_src=max(f - 2, 1) // 2, f_ground=1)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    fwd_flops = dit_matmul_flops(base_cfg, tokens)
    peak = 197.0 if jax.devices()[0].platform == "tpu" else float("nan")

    def timed(name, fn, *a, flops=None):
        # every variant returns an IN-PROGRAM scalar; float() is the only
        # reliable barrier on the async tunnel (block_until_ready can
        # return early on remote arrays — observed on this transport)
        float(fn(*a))                     # compile + warm
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            float(fn(*a))
            walls.append(time.time() - t0)
        med = float(np.median(walls))
        rec = {"median_s": round(med, 4),
               "walls": [round(v, 4) for v in walls]}
        if flops:
            rec["tflops_per_s"] = round(flops / med / 1e12, 1)
            rec["mfu"] = round(flops / med / 1e12 / peak, 3)
        log(f"{name}: {rec}")
        return rec

    results = {}

    # dispatch + scalar-fetch floor: subtract mentally from every wall
    null = jax.jit(lambda s: jnp.sum(s[:2, :2]))
    results["null_floor"] = timed("null_floor", null, x[0, 0, 0])

    full = jax.jit(lambda p, xx, tt, cc, co, si: jnp.sum(
        wan_dit.wan_dit_forward(p, base_cfg, xx, tt, cc, co, si)
        .astype(jnp.float32)))
    results["full"] = timed("full", full, params, x, t, ctx, cos, sin,
                            flops=fwd_flops)

    bf_cfg = base_cfg.replace(rope_dtype="bfloat16")
    rope_bf = jax.jit(lambda p, xx, tt, cc, co, si: jnp.sum(
        wan_dit.wan_dit_forward(p, bf_cfg, xx, tt, cc, co, si)
        .astype(jnp.float32)))
    results["rope_bf16"] = timed("rope_bf16", rope_bf, params, x, t, ctx,
                                 cos, sin, flops=fwd_flops)

    # blocks-only: the scanned 30-block body on a pre-embedded stream at the
    # kernel-padded length — isolates the block stack from embed/head
    D = base_cfg.dim
    Lpad = ((tokens + 127) // 128) * 128
    stream = jnp.asarray(rng.standard_normal((1, Lpad, D)), jnp.bfloat16)
    e0 = jnp.asarray(rng.standard_normal((1, 6, D)), jnp.float32)
    ctx_d = jnp.asarray(rng.standard_normal(
        (1, base_cfg.text_len, D)), jnp.bfloat16)
    cos_p = jnp.pad(cos, ((0, Lpad - tokens), (0, 0)))
    sin_p = jnp.pad(sin, ((0, Lpad - tokens), (0, 0)))

    @jax.jit
    def blocks_only(p, s):
        def body(carry, bp):
            return wan_dit.wan_block_apply(
                bp, base_cfg, carry, e0, ctx_d, (cos_p, sin_p)), None
        out, _ = jax.lax.scan(body, s, p["blocks"])
        return jnp.sum(out.astype(jnp.float32))

    blk_flops = (fwd_flops * Lpad / tokens)  # ~ all FLOPs live in the blocks
    results["blocks_only"] = timed("blocks_only", blocks_only, params,
                                   stream, flops=blk_flops)

    # pure flash self-attention, one scan of 30 iterations at the padded
    # geometry (bf16 q/k/v, the dispatch default)
    N = base_cfg.num_heads
    q = jnp.asarray(rng.standard_normal((1, Lpad, N, D // N)), jnp.bfloat16)

    @jax.jit
    def attn_iter(qq):
        from videocof_tpu.ops import attention as attn

        def body(carry, _):
            return attn(carry, carry, carry), None
        out, _ = jax.lax.scan(body, qq, None, length=base_cfg.num_layers)
        return jnp.sum(out.astype(jnp.float32))

    attn_flops = base_cfg.num_layers * 4 * Lpad * Lpad * D
    results["attn_iter"] = timed("attn_iter", attn_iter, q,
                                 flops=attn_flops)

    delta = (results["full"]["median_s"]
             - results["blocks_only"]["median_s"])
    print(json.dumps({
        "metric": "mfu_gap_decomposition_1.3b",
        "tokens": tokens, "padded_tokens": Lpad,
        "results": results,
        "non_block_overhead_s": round(delta, 4),
        "non_block_overhead_frac": round(
            delta / results["full"]["median_s"], 4),
    }))


if __name__ == "__main__":
    main()
