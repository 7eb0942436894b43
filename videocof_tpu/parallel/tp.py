"""Megatron-style tensor parallelism for the DiT block stack.

A capability beyond the reference (its xfuser setup only exposes
ulysses/ring sequence parallelism): each transformer block's attention heads
and FFN hidden dim are sharded over the ``model`` mesh axis, so *weights and
per-layer activations* scale down with the TP degree — the lever that lets a
14B-class DiT run across chips too small to hold it whole.

TPU-native mechanics (no torch-style module surgery): the params are simply
placed with column-/row-parallel `NamedSharding`s (`tp_param_shardings`) and
the jitted forward runs unchanged — XLA's SPMD partitioner propagates the
shardings through q/k/v projections, head reshape, attention, and inserts
exactly one all-reduce per (attention, FFN) pair at the o-proj / fc2
row-parallel contractions, the Megatron communication pattern. On real TPU
the attention itself runs inside `make_tp_attention`'s shard_map (heads are
embarrassingly parallel) so the Pallas flash kernel sees only local heads;
it composes with Ulysses sequence parallelism in the same shard_map when the
mesh also has a ``seq`` axis (tokens x heads both sharded).

Column/row assignment per block (kernels are [layers, in, out]-stacked):

    self_attn/cross_attn  q, k, v (+ k_img, v_img)   column (out over TP)
                          norm_q/k weights            follow q/k out-sharding
                          o                           row (in over TP)
    ffn                   fc1                         column
                          fc2                         row
    modulation / norms / embeddings / head            replicated

The same name rules cover the sibling families (CogVideoX / Flux /
QwenImage,
`models/flux.py` / `models/qwenimage.py`; reference adapters
`qwenimage_transformer2d.py`, `dist/qwen_xfuser.py` expose only SP):

    attn                  add_q/k/v                   column
                          add_o                       row
                          norm_*q/k (per-HEAD-dim rms) replicated
    *_mlp / ff*           fc1 / fc2                   column / row
    single_blocks         proj_mlp                    column
                          proj_out                    row
    AdaLN linears         img_mod/txt_mod/norm1/
                          norm1_context/norm .lin     column (27-34% of the
                                                      big image models'
                                                      params — the lever
                                                      that makes a 20B fit
                                                      shrink with TP)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import attention as _attention

# leaf-name -> which dim of the *unstacked* param is sharded; kernels carry a
# leading stacked-layer axis that stays unsharded. "out" = last dim,
# "in" = second-to-last (row-parallel), None = replicated.
_COLUMN = ("q", "k", "v", "k_img", "v_img", "fc1",
           "add_q", "add_k", "add_v", "proj_mlp")
_ROW = ("o", "fc2", "add_o", "proj_out")
_NORM_FOLLOW = ("norm_q", "norm_k", "norm_k_img",
                "norm_added_q", "norm_added_k")
# AdaLN modulation linears (d -> 6d/3d) inside blocks: Wan keeps these as a
# tiny [L, 6, d] table (replicated), but Flux/Qwen make them full matmuls
# holding 27-34% of all params — column-shard their out dim.
_ADALN_PARENTS = ("img_mod", "txt_mod", "norm1", "norm1_context", "norm")
_BLOCK_STACKS = frozenset(("blocks", "blocks2", "single_blocks"))


def _spec_for(path, leaf, axis: str) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    leaf_name = names[-1]
    if not (_BLOCK_STACKS & set(names)):
        return P()  # embeddings / head / time mlp stay replicated
    # quantized storage: utils/fp8.py replaces the "kernel" LEAF with a
    # {"fp8","scale"} dict, so those leaves sit one level deeper
    # (.../q/kernel/fp8). Shard fp8 like the kernel it replaces; per-layer
    # scales replicate.
    if len(names) > 1 and names[-2] == "kernel" \
            and leaf_name in ("fp8", "scale"):
        if leaf_name == "scale":
            return P()
        names = names[:-1]             # .../q/kernel
        leaf_name = "kernel"
    parent = names[-2] if len(names) > 1 else ""
    grand = names[-3] if len(names) > 2 else ""

    def last_dim(d=-1):
        spec = [None] * leaf.ndim
        spec[d] = axis
        return P(*spec)

    if parent in _COLUMN:
        return last_dim(-1)            # kernel [L, in, out] and bias [L, out]
    if parent in _ROW:
        # row-parallel: contract dim sharded; bias added once, post-reduce
        return last_dim(-2) if leaf_name == "kernel" else P()
    if parent == "lin" and grand in _ADALN_PARENTS:
        return last_dim(-1)            # image-family AdaLN: column
    if parent in _NORM_FOLLOW and leaf_name == "weight":
        if grand == "attn":
            # Flux/Qwen rms weights span the per-HEAD dim (shared by every
            # head), not the flattened model dim — replicate
            return P()
        return last_dim(-1)            # q/k RMS weights follow the out shard
    return P()


def tp_param_shardings(mesh: Mesh, params: Any, axis: str = "model") -> Any:
    """NamedSharding pytree implementing the table above. Apply with
    `jax.device_put(params, shardings)` (or as jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, axis)),
        params)


def tp_fsdp_param_shardings(mesh: Mesh, params: Any, tp_axis: str = "model",
                            fsdp_axis: str = "data",
                            min_size: int = 2 ** 16) -> Any:
    """Compose Megatron TP with FSDP (the standard 2D layout for training):
    each leaf first gets its column/row TP spec, then — if it is large and
    has a remaining divisible dim — its biggest free dim shards over the
    FSDP axis, so params and optimizer state scale 1/(tp*dp). Works for
    optimizer-state trees
    too: adam mu/nu mirror the param paths one level deeper, and the rules
    key on the projection names inside the path."""
    n_fsdp = mesh.shape[fsdp_axis]

    def rule(path, leaf):
        spec = list(_spec_for(path, leaf, tp_axis))
        spec += [None] * (leaf.ndim - len(spec))
        if leaf.size >= min_size and n_fsdp > 1:
            order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
            for d in order:
                if spec[d] is None and leaf.shape[d] % n_fsdp == 0:
                    spec[d] = fsdp_axis
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def validate_tp(cfg, mesh: Mesh, axis: str = "model") -> None:
    """Works for WanDiTConfig (num_heads/ffn_dim) and the image-family
    configs (num_attention_heads, FFN = 4 * inner_dim)."""
    tp = mesh.shape[axis]
    heads = getattr(cfg, "num_heads", None)
    if heads is None:
        heads = cfg.num_attention_heads
    ffn = getattr(cfg, "ffn_dim", None)
    if ffn is None:
        ffn = 4 * cfg.inner_dim
    if heads % tp:
        raise ValueError(f"num_heads {heads} % tp {tp} != 0")
    if ffn % tp:
        raise ValueError(f"ffn_dim {ffn} % tp {tp} != 0")


def make_tp_attention(mesh: Mesh, model_axis: str = "model",
                      seq_axis: Optional[str] = None,
                      batch_axis: Optional[str] = None,
                      inner_backend: Optional[str] = None) -> Callable:
    """attn(q, k, v, mask=None) on logically-global [B, L, N, D]: heads
    shard over ``model`` (attention is embarrassingly parallel over heads, no
    collectives), optionally composed with Ulysses sequence parallelism over
    ``seq`` (all-to-all re-shards the *local* head group to full-length
    tokens). This keeps the Pallas flash kernel operating on purely local
    tiles instead of relying on the SPMD partitioner to split a custom call."""
    tp = mesh.shape[model_axis]
    sp = mesh.shape[seq_axis] if seq_axis else 1

    def _inner(q, k, v, mask):
        if sp > 1:
            def a2a_in(x):
                return jax.lax.all_to_all(x, seq_axis, split_axis=2,
                                          concat_axis=1, tiled=True)

            q, k, v = a2a_in(q), a2a_in(k), a2a_in(v)
        o = _attention(q, k, v, mask=mask, backend=inner_backend)
        if sp > 1:
            o = jax.lax.all_to_all(o, seq_axis, split_axis=1, concat_axis=2,
                                   tiled=True)
        return o

    def attn(q, k, v, mask=None):
        B, L, N, D = q.shape
        assert N % (tp * sp) == 0, \
            f"heads {N} not divisible by tp*sp = {tp}*{sp}"
        if sp > 1:
            assert L % sp == 0, f"seq len {L} % sp {sp} != 0 (pad first)"
        spec = P(batch_axis, seq_axis, model_axis, None)
        if mask is None:
            return shard_map(lambda a, b, c: _inner(a, b, c, None),
                             mesh=mesh, in_specs=(spec,) * 3,
                             out_specs=spec)(q, k, v)
        return shard_map(_inner, mesh=mesh,
                         in_specs=(spec, spec, spec, P(batch_axis, None)),
                         out_specs=spec)(q, k, v, mask)

    return attn
