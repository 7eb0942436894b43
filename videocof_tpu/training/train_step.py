"""Flow-matching training step with mesh sharding.

The reference ships only DeepSpeed ZeRO configs, FSDP wrappers, and activation
checkpointing hooks — no trainer (`README.md:199`, SURVEY.md §2.4). Here the
whole thing is one pjit'd function: ZeRO-3/FSDP == `fsdp_param_sharding` on the
params + optimizer state, DP == batch sharding on the ``data`` axis, Ulysses
SP == the shard_map attention inside the DiT, and gradient
all-reduce/reduce-scatter is inserted by XLA from the shardings.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import WanDiTConfig
from ..models import wan_dit
from ..parallel import (SPContext, fsdp_param_sharding,
                        make_ulysses_attention)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def flow_matching_loss(params, cfg: WanDiTConfig, x0, context, rope_cos,
                       rope_sin, timesteps, noise, attn_backend=None,
                       remat: bool = True, frame_mask=None, sp=None,
                       lora=None):
    """Rectified-flow loss: x_t = (1-sigma) x0 + sigma n, target v = n - x0.

    ``frame_mask`` [F] (1 = denoised frame, 0 = clean conditioning frame)
    implements the chain-of-frames objective: source latent frames stay clean
    at every t and are excluded from the loss — the training-side mirror of
    the pipeline's source freeze (`pipeline_wan.py:735-737`).
    """
    sigma = (timesteps.astype(jnp.float32) / 1000.0)[:, None, None, None, None]
    x_t = (1.0 - sigma) * x0 + sigma * noise
    target = noise - x0
    if frame_mask is not None:
        m = frame_mask.astype(jnp.float32)[None, None, :, None, None]
        x_t = m * x_t + (1.0 - m) * x0
        target = target * m
    pred = wan_dit.wan_dit_forward(
        params, cfg, x_t, timesteps.astype(jnp.float32), context,
        rope_cos, rope_sin, attn_backend=attn_backend, remat_blocks=remat,
        sp=sp, lora=lora)
    if frame_mask is not None:
        m = frame_mask.astype(jnp.float32)[None, None, :, None, None]
        err = jnp.square(pred - target) * m
        denom = jnp.maximum(jnp.mean(m), 1e-8)
        return jnp.mean(err) / denom
    return jnp.mean(jnp.square(pred - target))


def make_train_step(
    mesh: Mesh,
    cfg: WanDiTConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    use_ulysses: bool = True,
    remat: bool = True,
    fsdp_min_size: int = 2 ** 16,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn).

    init_fn(params) -> TrainState with FSDP-sharded params/optimizer state.
    step_fn(state, batch, rng) -> (state, loss); batch is a dict with
    ``x0`` [B, C, F, H, W], ``context`` [B, Lt, text_dim], ``rope_cos``,
    ``rope_sin``, ``timesteps`` [B].
    """
    optimizer = optimizer or optax.adamw(1e-5, weight_decay=1e-3)
    sp_on = use_ulysses and mesh.shape["seq"] > 1
    tp_on = dict(mesh.shape).get("model", 1) > 1
    if tp_on:
        # Megatron TP composes with FSDP and the Ulysses all-to-all: heads
        # and FFN shard over 'model', the residual stream over 'seq', and
        # the layer axis of the stacked kernels (plus optimizer state) over
        # 'data' — the standard 3D training layout
        from ..parallel.tp import make_tp_attention, validate_tp
        validate_tp(cfg, mesh)
        attn = make_tp_attention(mesh,
                                 seq_axis="seq" if sp_on else None)
    else:
        attn = make_ulysses_attention(mesh) if sp_on else None
    sp = SPContext(mesh) if sp_on else None

    def _shardings(tree):
        if tp_on:
            from ..parallel.tp import tp_fsdp_param_shardings
            return tp_fsdp_param_shardings(mesh, tree,
                                           min_size=fsdp_min_size)
        return fsdp_param_sharding(mesh, tree, min_size=fsdp_min_size)

    def init_fn(params) -> TrainState:
        # Reshard through a jitted identity, NOT device_put: step_fn donates
        # the state, and device_put ALIASES the caller's buffer for leaves
        # whose sharding is already right (replicated leaves reuse the
        # device-0 source buffer even with may_alias=False) — donation would
        # then delete the caller's own param buffers out from under it. Jit
        # outputs are always fresh buffers unless themselves donated. The
        # copy is transient init-time HBM only; the donation it protects
        # saves 2x state HBM on every step.
        params = jax.jit(lambda p: p,
                         out_shardings=_shardings(params))(params)
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=_shardings(
                jax.eval_shape(optimizer.init, params)))(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    data_sharding = NamedSharding(mesh, P("data"))

    # donate the state: without it the old and new params + optimizer
    # state coexist across the update (2x train-state HBM — the 1.3B full
    # fine-tune ResourceExhausts one 16 GB v5e exactly this way)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, jax.Array]:
        x0 = jax.lax.with_sharding_constraint(batch["x0"], data_sharding)
        noise = jax.random.normal(rng, x0.shape, x0.dtype)

        def loss_fn(p):
            return flow_matching_loss(
                p, cfg, x0, batch["context"], batch["rope_cos"],
                batch["rope_sin"], batch["timesteps"], noise,
                attn_backend=attn, remat=remat,
                frame_mask=batch.get("frame_mask"), sp=sp)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn


class LoRATrainState(NamedTuple):
    adapters: Any
    opt_state: Any
    step: jax.Array


def make_lora_train_step(
    mesh: Mesh,
    cfg: WanDiTConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    rank: int = 16,
    use_ulysses: bool = True,
    remat: bool = True,
) -> Tuple[Callable, Callable]:
    """LoRA-adapter training (the reference releases only LoRA ZeRO configs
    — `config/14b_lora_zero2_bf16_config.json` — and its VideoCoF weights
    ARE trained adapters; the trainer itself was never released,
    `README.md:199`).

    Base weights stay frozen (passed per step, FSDP-shardable by the
    caller); only the adapter pytree carries gradients/optimizer state, so
    optimizer memory is ~rank/dim of full fine-tuning. The adapters fuse
    into the kernels PER BLOCK inside the scanned body (`models.lora
    .fuse_block_adapters` via `wan_dit_forward(lora=...)`), so the forward
    is the production forward with no hook machinery AND no full-tree
    fused-weights copy (+param-size HBM).

    init_fn(key) -> LoRATrainState; step_fn(state, base_params, batch, rng)
    -> (state, loss). Batch contract matches `make_train_step`.
    """
    from ..models.lora import init_lora_adapters

    optimizer = optimizer or optax.adamw(1e-4, weight_decay=0.0)
    sp_on = use_ulysses and mesh.shape["seq"] > 1
    attn = make_ulysses_attention(mesh) if sp_on else None
    sp = SPContext(mesh) if sp_on else None

    def init_fn(key) -> LoRATrainState:
        adapters = init_lora_adapters(key, cfg, rank=rank)
        return LoRATrainState(adapters=adapters,
                              opt_state=optimizer.init(adapters["blocks"]),
                              step=jnp.zeros((), jnp.int32))

    data_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0,))   # see make_train_step
    def step_fn(state: LoRATrainState, base_params, batch, rng
                ) -> Tuple[LoRATrainState, jax.Array]:
        x0 = jax.lax.with_sharding_constraint(batch["x0"], data_sharding)
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        meta = {"rank": state.adapters["rank"],
                "alpha": state.adapters["alpha"]}

        def loss_fn(ad_blocks):
            # adapters fuse PER BLOCK inside the scanned body
            # (lora.fuse_block_adapters via wan_dit_forward(lora=...)):
            # a full-tree apply_lora_adapters copy costs +param-size HBM
            # and pushes the 29.6k-token CoF geometry off a 16 GB chip
            scale = meta["alpha"] / meta["rank"]
            return flow_matching_loss(
                base_params, cfg, x0, batch["context"], batch["rope_cos"],
                batch["rope_sin"], batch["timesteps"], noise,
                attn_backend=attn, remat=remat,
                frame_mask=batch.get("frame_mask"), sp=sp,
                lora=(ad_blocks, scale))

        loss, grads = jax.value_and_grad(loss_fn)(state.adapters["blocks"])
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.adapters["blocks"])
        blocks = optax.apply_updates(state.adapters["blocks"], updates)
        adapters = {**meta, "blocks": blocks}
        return LoRATrainState(adapters, opt_state, state.step + 1), loss

    return init_fn, step_fn
