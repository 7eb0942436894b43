"""Real-TPU training-step probe: CoF flow-matching train step on one v5e.

The reference never released its trainer (its VideoCoF weights are LoRA
adapters trained with DeepSpeed ZeRO configs only — `README.md:199`,
`config/14b_lora_zero2_bf16_config.json`); this measures OUR training path
(`training/train_step.py`) on real hardware at the CoF edit geometry:

- ``--lora`` (the reference's actual training mode): frozen bf16 base +
  rank-R adapters, adapter-only AdamW state.
- full fine-tune (default): bf16 params + AdamW. On 16 GB the full 29.6k
  token geometry may not fit beside 4x params-sized state; ``--grid`` and
  ``--adafactor`` (factored second moment) are the levers.

Reports s/step and train model-FLOP/s using the standard 3x-forward
accounting (fwd + bwd ~= 3x matmul FLOPs; remat recompute is real hardware
work but NOT counted as model FLOPs, so MFU here is conservative).

Run on the real TPU:  python scripts/probe_train_step.py [--lora] [--steps 3]
Writes one JSON line to stdout.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from videocof_tpu.utils.jit_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()

from videocof_tpu.configs import WAN21_T2V_1_3B, WAN21_T2V_14B
from videocof_tpu.models import wan_dit
from videocof_tpu.parallel import make_mesh
from videocof_tpu.utils.profiling import dit_matmul_flops


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1.3b",
                    choices=["1.3b", "14b", "tiny"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke mode)")
    ap.add_argument("--grid", default="19,30,52",
                    help="token grid f,h,w (default = 480x832 33+4 CoF)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--lora", action="store_true",
                    help="LoRA-adapter training (the reference's mode)")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--adafactor", action="store_true",
                    help="factored optimizer state instead of AdamW")
    ap.add_argument("--ffn-chunks", type=int, default=1,
                    help="bound the [L, ffn_dim] FFN temp to 1/N (cfg knob)")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default=None,
                    help="jax.checkpoint_policies name (e.g. "
                         "dots_with_no_batch_dims_saveable) or "
                         "'save_names:attn_out,xattn_out' — selective AC "
                         "instead of full remat")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax
    from videocof_tpu.training import make_train_step
    from videocof_tpu.training.train_step import make_lora_train_step

    if args.model == "tiny":
        from videocof_tpu.configs import WAN_TINY as cfg
    else:
        cfg = WAN21_T2V_14B if args.model == "14b" else WAN21_T2V_1_3B
    if args.ffn_chunks > 1:
        cfg = cfg.replace(ffn_chunks=args.ffn_chunks)
    f, h, w = (int(x) for x in args.grid.split(","))
    tokens = f * h * w
    pt, ph, pw = cfg.patch_size
    lat_shape = (args.batch, cfg.in_dim, f * pt, h * ph, w * pw)
    remat = not args.no_remat
    if remat and args.remat_policy:
        remat = args.remat_policy  # string policy -> _remat_wrap
        if remat.startswith("save_names:"):
            cfg = cfg.replace(remat_tag_names=True)  # names must exist

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform}); model {args.model}, "
        f"grid {f}x{h}x{w} = {tokens} tokens, batch {args.batch}, "
        f"{'lora r' + str(args.rank) if args.lora else 'full FT'}, "
        f"remat {remat}")

    mesh = make_mesh(1, 1, 1)
    opt = (optax.adafactor(1e-5) if args.adafactor
           else optax.adamw(1e-5, weight_decay=1e-3))

    t0 = time.time()
    params = jax.jit(
        lambda k: wan_dit.init_wan_dit(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"init: {time.time()-t0:.1f}s; params {n_params/1e9:.2f}B")


    # CoF training batch: 9 source latent frames stay clean + ground +
    # target are denoised (pipeline_wan.py:735-737's training-side mirror)
    f_src = min(9, max(f - 2, 0))
    frame_mask = np.ones((lat_shape[2],), np.float32)
    frame_mask[:f_src * pt] = 0.0
    cos, sin = wan_dit.make_rope_for_geometry(cfg, (f, h, w),
                                              f_src=f_src, f_ground=1)
    rng = np.random.default_rng(0)
    batch = {
        "x0": jnp.asarray(rng.standard_normal(lat_shape), jnp.bfloat16),
        "context": jnp.zeros((args.batch, cfg.text_len, cfg.text_dim),
                             jnp.bfloat16),
        "rope_cos": jnp.asarray(cos), "rope_sin": jnp.asarray(sin),
        "timesteps": jnp.asarray(
            rng.integers(0, 1000, (args.batch,)), jnp.int32),
        "frame_mask": jnp.asarray(frame_mask),
    }

    t0 = time.time()
    if args.lora:
        init_fn, step_fn = make_lora_train_step(
            mesh, cfg, opt, rank=args.rank, remat=remat)
        state = init_fn(jax.random.PRNGKey(1))
        run = lambda s, r: step_fn(s, params, batch, r)
    else:
        init_fn, step_fn = make_train_step(mesh, cfg, opt, remat=remat)
        state = init_fn(params)
        run = lambda s, r: step_fn(s, batch, r)
        # init_fn reshards through a jitted identity (fresh buffers, no
        # caller alias — db17a4e), so the ORIGINAL tree would stay resident
        # (+2.8 GiB bf16 at 1.3B) for the whole probe. Full-FT never touches
        # it again: free it, or the 15.75-GiB-tight step ResourceExhausts.
        jax.block_until_ready(state)
        for leaf in jax.tree.leaves(params):
            leaf.delete()
        params = None
    jax.block_until_ready(state)
    log(f"state init: {time.time()-t0:.1f}s")

    t0 = time.time()
    state, loss = run(state, jax.random.PRNGKey(2))
    loss_v = float(loss)          # forces remote execution errors to surface
    log(f"first step (compile+run): {time.time()-t0:.1f}s; loss {loss_v:.4f}")

    t0 = time.time()
    for i in range(args.steps):
        state, loss = run(state, jax.random.PRNGKey(3 + i))
    loss_v = float(loss)
    per_step = (time.time() - t0) / args.steps
    fwd_flops = args.batch * dit_matmul_flops(cfg, tokens)
    train_flops = 3.0 * fwd_flops
    tf = train_flops / per_step / 1e12
    ms = dev.memory_stats() or {}
    mem = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
           if k in ms}
    out = {
        "metric": (f"train_step_{args.model}"
                   + ("_lora" if args.lora else "_full")),
        "value": round(per_step, 3), "unit": "s/step",
        "tokens": tokens, "batch": args.batch,
        "loss": round(loss_v, 4),
        "train_tflops_per_s_3x_fwd": round(tf, 1),
        "train_mfu_vs_197tf": round(tf / 197.0, 3),
        "optimizer": "adafactor" if args.adafactor else "adamw",
        "ffn_chunks": args.ffn_chunks,
        "remat": remat if isinstance(remat, bool) else f"policy:{remat}",
        "lora_rank": args.rank if args.lora else None,
        "hbm": mem,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
