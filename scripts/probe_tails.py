"""A/B the round-4 pipeline-tail cuts on the real chip, ONE process.

Variants (env read at call time, so both run in the same process against
the same compiled trajectory):
  NEW: VIDEOCOF_ENCODE_FUSED=1 (one-program CoT prep)
       + VIDEOCOF_DECODE_INPROGRAM=1 (one-dispatch-per-chunk u8 decode)
  OLD: both =0 (round-3 paths: chunked encode + generator decode/post)

Prints per-variant e2e walls and stage walls, then a JSON verdict line.
Alternating reps so transport drift hits both variants equally.
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

    from videocof_tpu.configs import WAN21_T2V_1_3B, T5Config, WanVAEConfig
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    dit_cfg = WAN21_T2V_1_3B.replace(stream_dtype="bfloat16",
                                     token_pad_multiple=128)
    vae_cfg = WanVAEConfig()
    height, width, source_frames, reasoning_frames = 480, 832, 33, 4

    dit_params = jax.jit(lambda k: wan_dit.init_wan_dit(
        k, dit_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    vae_params = jax.jit(lambda k: wan_vae.init_wan_vae(
        k, vae_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    pipe = WanPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                       t5_params=None, t5_cfg=T5Config(),
                       dtype=jnp.bfloat16)
    log("init done")

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (1, 3, source_frames, height, width),
                         dtype=np.uint8)
    embeds = jnp.zeros((1, dit_cfg.text_len, dit_cfg.text_dim), jnp.bfloat16)

    def run():
        return pipe(video, prompt="bench", source_frames=source_frames,
                    reasoning_frames=reasoning_frames,
                    num_inference_steps=4, guidance_scale=1.0,
                    shift=3.0, sampler="unipc", repeat_rope=True, cot=True,
                    prompt_embeds=embeds)

    def set_mode(new: bool):
        v = "1" if new else "0"
        os.environ["VIDEOCOF_ENCODE_FUSED"] = v
        os.environ["VIDEOCOF_DECODE_INPROGRAM"] = v

    # warm/compile both variants
    for new in (True, False):
        set_mode(new)
        t0 = time.time()
        out = run()
        log(f"warm {'NEW' if new else 'OLD'}: {time.time()-t0:.1f}s "
            f"out {out.videos.shape}")

    reps = int(os.environ.get("PROBE_REPS", "3"))
    walls = {"new": [], "old": []}
    for r in range(reps):
        for new in (True, False):
            set_mode(new)
            t0 = time.time()
            run()
            walls["new" if new else "old"].append(time.time() - t0)
            log(f"rep {r} {'NEW' if new else 'OLD'}: "
                f"{walls['new' if new else 'old'][-1]:.2f}s")

    # stage-level: prep + decode walls per variant (executables all warm)
    stages = {}
    jv = jax.device_put(video)
    for name, new in (("new", True), ("old", False)):
        set_mode(new)
        t0 = time.time()
        lat = pipe.prepare_cot_latents(jv, 1, jax.random.PRNGKey(0))
        jax.block_until_ready(lat)
        t_prep = time.time() - t0
        t0 = time.time()
        pipe._decode_outputs(lat[:, :, :19].astype(jnp.float32), True, 9, 1)
        t_dec = time.time() - t0
        stages[name] = {"prep_s": round(t_prep, 2), "decode_s": round(t_dec, 2)}
        log(f"stages {name}: prep {t_prep:.2f}s decode {t_dec:.2f}s")

    from videocof_tpu.utils import transport
    mbps = transport.measured_fetch_mbps(8, refresh=True)
    print(json.dumps({
        "metric": "tails_ab_1.3b_e2e",
        "new_s": round(float(np.median(walls["new"])), 2),
        "old_s": round(float(np.median(walls["old"])), 2),
        "new_all": [round(w, 2) for w in walls["new"]],
        "old_all": [round(w, 2) for w in walls["old"]],
        "stages": stages,
        "transport_fetch_mbps": round(float(mbps), 1),
    }))


if __name__ == "__main__":
    main()
