"""Stage-level A/B of the round-4 tail cuts: prep + decode, N alternating
reps each, one process. All executables come from the persistent cache
(threshold 0), so warms are cheap and the medians isolate run-time cost."""

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
    enable_persistent_compilation_cache()

    from videocof_tpu.configs import WAN21_T2V_1_3B, T5Config, WanVAEConfig
    from videocof_tpu.models import wan_dit, wan_vae
    from videocof_tpu.pipeline import WanPipeline

    vae_cfg = WanVAEConfig()
    dit_cfg = WAN21_T2V_1_3B.replace(stream_dtype="bfloat16",
                                     token_pad_multiple=128)
    vae_params = jax.jit(lambda k: wan_vae.init_wan_vae(
        k, vae_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    # tiny DiT stub: stages don't touch it, init cheap
    dcfg_stub = dit_cfg.replace(num_layers=1, dim=256, ffn_dim=512,
                                num_heads=2)
    dit_params = jax.jit(lambda k: wan_dit.init_wan_dit(
        k, dcfg_stub, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    pipe = WanPipeline(dit_params, dcfg_stub, vae_params, vae_cfg,
                       t5_params=None, t5_cfg=T5Config(), dtype=jnp.bfloat16)
    log("init done")

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (1, 3, 33, 480, 832), dtype=np.uint8)
    jv = jax.device_put(video)
    jax.block_until_ready(jv)

    def set_mode(new):
        v = "1" if new else "0"
        os.environ["VIDEOCOF_ENCODE_FUSED"] = v
        os.environ["VIDEOCOF_DECODE_INPROGRAM"] = v

    lat = None
    for new in (True, False):  # warm both
        set_mode(new)
        lat = pipe.prepare_cot_latents(jv, 1, jax.random.PRNGKey(0))
        jax.block_until_ready(lat)
        pipe._decode_outputs(lat.astype(jnp.float32), True, 9, 1)
    log("warm done")

    reps = int(os.environ.get("PROBE_REPS", "5"))
    prep = {"new": [], "old": []}
    dec = {"new": [], "old": []}
    latf = lat.astype(jnp.float32)
    jax.block_until_ready(latf)
    for r in range(reps):
        for name, new in (("new", True), ("old", False)):
            set_mode(new)
            t0 = time.time()
            out = pipe.prepare_cot_latents(jv, 1, jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            prep[name].append(time.time() - t0)
            t0 = time.time()
            pipe._decode_outputs(latf, True, 9, 1)
            dec[name].append(time.time() - t0)
        log(f"rep {r}: prep new {prep['new'][-1]:.2f} old "
            f"{prep['old'][-1]:.2f} | dec new {dec['new'][-1]:.2f} old "
            f"{dec['old'][-1]:.2f}")

    from videocof_tpu.utils import transport
    mbps = transport.measured_fetch_mbps(8, refresh=True)
    med = lambda x: round(float(np.median(x)), 2)  # noqa: E731
    print(json.dumps({
        "metric": "tails_stage_ab",
        "prep_new_s": med(prep["new"]), "prep_old_s": med(prep["old"]),
        "dec_new_s": med(dec["new"]), "dec_old_s": med(dec["old"]),
        "prep_new_all": [round(x, 2) for x in prep["new"]],
        "prep_old_all": [round(x, 2) for x in prep["old"]],
        "dec_new_all": [round(x, 2) for x in dec["new"]],
        "dec_old_all": [round(x, 2) for x in dec["old"]],
        "transport_fetch_mbps": round(float(mbps), 1)}))


if __name__ == "__main__":
    main()
