"""head_dim-64 flash kernel A/B at the CogVideoX geometry, real TPU.

VERDICT r3 #4: CogVideoX (attention_head_dim=64,
`videox_fun/models/cogvideox_transformer3d.py`) used to fall back to XLA
attention because the Pallas kernel required head_dim % 128. The kernel now
takes D=64 — this probe measures both backends two ways on the real chip:

  1. whole-program chained attention (N sequential calls in one jit, so the
     async tunnel can't lie) at the 2B geometry: 30 heads x 64,
     L = 13*30*45 + 226 = 17,776 joint tokens;
  2. a full CogVideoX-2B DiT forward (random bf16 weights), one jitted
     program per backend.

Prints one JSON line with ms/call for both and the full-forward walls.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    log(f"jit cache: {enable_persistent_compilation_cache()}")

    from videocof_tpu.ops import attention

    B, N, D = 1, 30, 64
    L = 13 * 30 * 45 + 226          # 49-frame 480x720 CogVideoX-2B tokens
    iters = int(os.environ.get("PROBE_ITERS", "8"))
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, N, D), jnp.bfloat16)

    results = {}
    for backend in ("pallas", "xla"):
        def chained(q, k, v, backend=backend):
            y = q
            for _ in range(iters):
                # feed the output back so XLA can't CSE/parallelize
                y = attention(y, k, v, backend=backend)
            return y

        fn = jax.jit(chained)
        t0 = time.time()
        out = jax.block_until_ready(fn(q, k, v))
        log(f"{backend}: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        out = jax.block_until_ready(fn(q, k, v))
        wall = time.time() - t0
        results[f"{backend}_ms_per_call"] = round(wall / iters * 1000, 1)
        log(f"{backend}: {wall/iters*1000:.1f} ms/call "
            f"(sample {float(out[0, 0, 0, 0]):.4f})")

    # correctness cross-check at the real geometry (one call, fp32 compare)
    pa = attention(q, k, v, backend="pallas").astype(jnp.float32)
    xl = attention(q, k, v, backend="xla").astype(jnp.float32)
    err = float(jnp.max(jnp.abs(pa - xl)))
    results["max_abs_diff"] = round(err, 5)
    log(f"pallas vs xla max abs diff: {err:.5f}")

    # ---- full CogVideoX-2B forward
    from videocof_tpu.models import cogvideox as cog
    cfg = cog.COGVIDEOX_2B
    params = jax.jit(lambda k: cog.init_cogvideox(
        k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(3))
    n_par = sum(x.size for x in jax.tree.leaves(params))
    log(f"cogvideox-2b params: {n_par/1e9:.2f}B")
    hs = jax.random.normal(jax.random.PRNGKey(4), (1, 13, cfg.in_channels,
                                                   60, 90), jnp.bfloat16)
    ehs = jax.random.normal(jax.random.PRNGKey(5),
                            (1, 226, cfg.text_embed_dim), jnp.bfloat16)
    ts = jnp.array([500.0])
    for backend in ("pallas", "xla"):
        fwd = jax.jit(lambda p, h, e, t, b=backend: cog.cogvideox_forward(
            p, cfg, h, e, t, attn_backend=b))
        t0 = time.time()
        out = jax.block_until_ready(fwd(params, hs, ehs, ts))
        log(f"fwd {backend}: compile+run {time.time()-t0:.1f}s")
        walls = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fwd(params, hs, ehs, ts))
            walls.append(time.time() - t0)
        results[f"fwd_{backend}_s"] = round(float(np.median(walls)), 3)
        log(f"fwd {backend}: {results[f'fwd_{backend}_s']}s "
            f"{[round(w, 3) for w in walls]}")

    results["metric"] = "cogvideox_hd64_flash_ab"
    results["geometry"] = {"B": B, "N": N, "D": D, "L": L}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
