"""head_dim-64 flash kernel A/B at the CogVideoX geometry, real TPU.

VERDICT r3 #4: CogVideoX (attention_head_dim=64,
`videox_fun/models/cogvideox_transformer3d.py`) used to fall back to XLA
attention because the Pallas kernel required head_dim % 128. The kernel now
takes D=64. Measurements (whole-program walls with a float-fetch barrier —
the async tunnel lies about anything less):

  1. chained attention (N sequential data-dependent calls in one jit) at the
     full 2B geometry (30 heads x 64, L = 13*30*45 + 226 = 17,776 joint
     tokens): pallas, plus xla IF it fits — `jax.nn.dot_product_attention`
     materializes f32[30, L, L] logits = 37.9 GB there, which OOMs a 16 GB
     chip, so the kernel is what makes single-chip CogVideoX attention
     feasible at all;
  2. the same A/B at a 5-frame geometry (L = 6,976; logits 5.8 GB) where
     both backends run;
  3. a full CogVideoX-2B DiT forward (random bf16 weights) per backend.

Prints one JSON line.
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

    results = {"metric": "cogvideox_hd64_flash_ab"}
    B, N, D = 1, 30, 64
    iters = int(os.environ.get("PROBE_ITERS", "8"))

    def bench_chain(L, backend):
        q = jax.random.normal(jax.random.PRNGKey(0), (B, L, N, D),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, L, N, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, L, N, D),
                              jnp.bfloat16)

        def chained(q, k, v):
            y = q
            for _ in range(iters):
                y = attention(y, k, v, backend=backend)  # data-dependent
            return y

        fn = jax.jit(chained)
        try:
            t0 = time.time()
            out = fn(q, k, v)
            _ = float(out[0, 0, 0, 0])   # fetch barrier (remote-safe)
            log(f"L={L} {backend}: compile+run {time.time()-t0:.1f}s")
            walls = []
            for _ in range(2):
                t0 = time.time()
                out = fn(q, k, v)
                _ = float(out[0, 0, 0, 0])
                walls.append(time.time() - t0)
            ms = float(np.min(walls)) / iters * 1000
            log(f"L={L} {backend}: {ms:.1f} ms/call {walls}")
            return round(ms, 1)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            log(f"L={L} {backend}: FAILED {msg}")
            return {"error": msg}

    L_full = 13 * 30 * 45 + 226
    L_small = 5 * 30 * 45 + 226
    results["full_L"] = L_full
    results["full_pallas_ms"] = bench_chain(L_full, "pallas")
    results["full_xla_ms"] = bench_chain(L_full, "xla")
    results["small_L"] = L_small
    results["small_pallas_ms"] = bench_chain(L_small, "pallas")
    results["small_xla_ms"] = bench_chain(L_small, "xla")

    # free the A/B buffers, then a compact correctness cross-check
    for arr in jax.live_arrays():
        try:
            arr.delete()
        except Exception:
            pass
    jax.clear_caches()
    try:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, 2048, N, D),
                              jnp.bfloat16)
        pa = attention(q, q, q, backend="pallas").astype(jnp.float32)
        xl = attention(q, q, q, backend="xla").astype(jnp.float32)
        err = float(jnp.max(jnp.abs(pa - xl)))
        results["max_abs_diff_L2048"] = round(err, 5)
        log(f"pallas vs xla max abs diff (L=2048): {err:.5f}")
        for arr in jax.live_arrays():
            arr.delete()
        jax.clear_caches()
    except Exception as e:  # noqa: BLE001
        results["max_abs_diff_L2048"] = {"error": str(e)[:160]}

    # ---- full CogVideoX-2B forward at the 13-frame geometry
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
        try:
            t0 = time.time()
            out = fwd(params, hs, ehs, ts)
            _ = float(out[0, 0, 0, 0, 0])
            log(f"fwd {backend}: compile+run {time.time()-t0:.1f}s")
            walls = []
            for _ in range(3):
                t0 = time.time()
                out = fwd(params, hs, ehs, ts)
                _ = float(out[0, 0, 0, 0, 0])
                walls.append(time.time() - t0)
            results[f"fwd_{backend}_s"] = round(float(np.median(walls)), 3)
            log(f"fwd {backend}: {results[f'fwd_{backend}_s']}s "
                f"{[round(w, 3) for w in walls]}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            results[f"fwd_{backend}_s"] = {"error": msg}
            log(f"fwd {backend}: FAILED {msg}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
