"""AOT memory analysis of the streaming-VAE stage executables.

Prints temp/argument/output sizes for the encode and decode chunk programs
at the 480x832 serving geometry — the numbers that decide whether a stage
can run BESIDE the resident 14B (probe_14b_resident.py): on the 16 GB v5e,
a stage fits if args-excluding-params + temps + outputs <= ~1.5 GiB.

Compile-only (persistent cache makes reruns free); nothing big executes.

Usage: python scripts/probe_vae_memory.py [--chunk 1] [--height 480]
       [--width 832]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videocof_tpu.utils.jit_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    from videocof_tpu.configs import WanVAEConfig
    from videocof_tpu.models import wan_vae, wan_vae_streaming as S

    cfg = WanVAEConfig()
    H, W_ = args.height, args.width
    tc = cfg.temporal_compression_ratio

    params = jax.eval_shape(
        lambda: wan_vae.init_wan_vae(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16))

    def report(tag, compiled):
        ma = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"{tag}: temps {ma.temp_size_in_bytes/gib:.3f} GiB, "
              f"args {ma.argument_size_in_bytes/gib:.3f} GiB, "
              f"out {ma.output_size_in_bytes/gib:.3f} GiB")

    # ---- encode chunk executables (chunk = args.chunk latent frames)
    x0 = jax.ShapeDtypeStruct((1, 3, 1, H, W_), jnp.bfloat16)
    xi = jax.ShapeDtypeStruct((1, 3, tc * args.chunk, H, W_), jnp.bfloat16)

    def enc_init(p, x):
        tape = S._Tape(None)
        return S._encoder_stream(p["encoder"], cfg, x, tape, first=True), \
            tape.out

    c = jax.jit(enc_init).lower(params, x0).compile()
    report(f"enc_init (1 frame {H}x{W_})", c)
    caches_abs = jax.eval_shape(enc_init, params, x0)[1]

    def enc_step(p, x, caches):
        tape = S._Tape(caches)
        return S._encoder_stream(p["encoder"], cfg, x, tape, first=False), \
            tape.out

    c = jax.jit(enc_step, donate_argnums=(2,)).lower(
        params, xi, caches_abs).compile()
    report(f"enc_step ({tc * args.chunk} frames {H}x{W_})", c)

    # ---- decode chunk executables
    Hl, Wl = H // 8, W_ // 8
    z0 = jax.ShapeDtypeStruct((1, cfg.z_dim, 1, Hl, Wl), jnp.bfloat16)
    zi = jax.ShapeDtypeStruct((1, cfg.z_dim, args.chunk, Hl, Wl),
                              jnp.bfloat16)

    def dec_init(p, z):
        x = S.W.causal_conv3d(z, p["post_quant_conv"])
        tape = S._Tape(None)
        return S._decoder_stream(p["decoder"], cfg, x, tape,
                                 first=True), tape.out

    c = jax.jit(dec_init).lower(params, z0).compile()
    report(f"dec_init (1 latent frame {Hl}x{Wl})", c)
    dcaches_abs = jax.eval_shape(dec_init, params, z0)[1]

    def dec_step(p, z, caches):
        x = S.W.causal_conv3d(z, p["post_quant_conv"])
        tape = S._Tape(caches)
        return S._decoder_stream(p["decoder"], cfg, x, tape,
                                 first=False), tape.out

    c = jax.jit(dec_step, donate_argnums=(2,)).lower(
        params, zi, dcaches_abs).compile()
    report(f"dec_step ({args.chunk} latent frames {Hl}x{Wl})", c)


if __name__ == "__main__":
    main()
