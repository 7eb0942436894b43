"""3D rotary position embeddings with chain-of-frames (CoF) segment restarts.

The reference computes RoPE per-sample with a Python loop over complex tensors
(`wan_transformer3d.py:135-205`), explicitly decorated
``@torch.compiler.disable`` because the index-list control flow cannot be
compiled. On TPU we turn the segment logic into *data*: temporal positions are
precomputed host-side as an integer array per geometry, gathered into fp32
cos/sin tables once per forward, and the rotation is a pure elementwise op that
jits, shards, and scans cleanly (this is also what makes CoF compatible with
sequence parallelism — the position tables shard with the tokens, fixing the
reference's USP/CoF incompatibility noted in SURVEY.md §2.4).

Frequency layout (reference `wan_transformer3d.py:688-699`): for head_dim d the
complex half c = d//2 splits into (t, h, w) sections of size
(c - 2*(c//3), c//3, c//3); each section uses theta^(2i/section_dim) inverse
frequencies over its own axis position.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_section_dims(head_dim: int) -> Tuple[int, int, int]:
    """(t, h, w) split of the d//2 complex frequency slots."""
    c = head_dim // 2
    return (c - 2 * (c // 3), c // 3, c // 3)


def _inv_freqs(section: int, theta: float) -> np.ndarray:
    # Matches rope_params: 1/theta^(2i/dim) over a *full* section dim of
    # 2*section, i.e. exponents arange(0, 2*section, 2)/(2*section).
    dim = 2 * section
    return 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)


@functools.lru_cache(maxsize=8)
def rope_angle_tables(head_dim: int, max_pos: int = 1024,
                      theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis angle tables (pos x section) in float64; cached per geometry."""
    ct, ch, cw = rope_section_dims(head_dim)
    pos = np.arange(max_pos, dtype=np.float64)
    return tuple(np.outer(pos, _inv_freqs(c, theta)) for c in (ct, ch, cw))


def riflex_angle_table(head_dim: int, k: int, L_test: int,
                       L_test_scale: Optional[float] = None,
                       max_pos: int = 1024, theta: float = 10000.0) -> np.ndarray:
    """RIFLEx temporal table: intrinsic frequency k is shrunk so the
    extrapolated length stays within one period (reference
    `wan_transformer3d.py:55-113`): freq[k-1] = 0.9 * 2*pi / L_test,
    optionally divided by L_test_scale."""
    ct, _, _ = rope_section_dims(head_dim)
    inv = _inv_freqs(ct, theta).copy()
    inv[k - 1] = 0.9 * 2.0 * np.pi / L_test
    if L_test_scale is not None:
        inv[k - 1] = inv[k - 1] / L_test_scale
    pos = np.arange(max_pos, dtype=np.float64)
    return np.outer(pos, inv)


def cof_temporal_positions(f: int, f_src: Optional[int] = None,
                           f_ground: int = 0) -> np.ndarray:
    """Temporal RoPE position of each latent frame.

    Three modes (reference `wan_transformer3d.py:153-191`):
      * default          -> [0, 1, ..., f-1]
      * paired (src,tgt) -> [0..f_src-1, 0..f_tgt-1]           (restart at 0)
      * CoF (src,ground,tgt) -> [1..f_src, 0 x f_ground, 1..f_tgt]
        (grounding frames pinned to position 0; src/tgt start at 1)
    """
    if f_src is None:
        return np.arange(f, dtype=np.int32)
    if f_ground and f_ground > 0:
        f_tgt = f - f_src - f_ground
        assert f_tgt >= 0, (f, f_src, f_ground)
        return np.concatenate([
            1 + np.arange(f_src, dtype=np.int32),
            np.zeros(f_ground, dtype=np.int32),
            1 + np.arange(f_tgt, dtype=np.int32),
        ])
    f_tgt = f - f_src
    assert f_tgt >= 0, (f, f_src)
    return np.concatenate([
        np.arange(f_src, dtype=np.int32),
        np.arange(f_tgt, dtype=np.int32),
    ])


def build_rope_cos_sin(
    grid: Tuple[int, int, int],
    head_dim: int,
    f_src: Optional[int] = None,
    f_ground: int = 0,
    max_pos: int = 1024,
    theta: float = 10000.0,
    temporal_table: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense per-token cos/sin tables of shape [f*h*w, head_dim//2] (fp32).

    ``temporal_table`` overrides the default temporal angle table (RIFLEx).
    Pure host-side numpy; the result is fed to the device once per geometry.
    """
    f, h, w = grid
    tab_t, tab_h, tab_w = rope_angle_tables(head_dim, max_pos, theta)
    if temporal_table is not None:
        tab_t = temporal_table
    t_pos = cof_temporal_positions(f, f_src, f_ground)

    ang_t = tab_t[t_pos]          # [f, ct]
    ang_h = tab_h[:h]             # [h, ch]
    ang_w = tab_w[:w]             # [w, cw]

    ct, ch, cw = ang_t.shape[1], ang_h.shape[1], ang_w.shape[1]
    out = np.empty((f, h, w, ct + ch + cw), dtype=np.float64)
    out[..., :ct] = ang_t[:, None, None, :]
    out[..., ct:ct + ch] = ang_h[None, :, None, :]
    out[..., ct + ch:] = ang_w[None, None, :, :]
    out = out.reshape(f * h * w, ct + ch + cw)
    return np.cos(out).astype(np.float32), np.sin(out).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               compute_dtype=None) -> jax.Array:
    """Rotate consecutive channel pairs of ``x`` [..., L, N, D] by per-token
    angles (cos/sin of shape [L, D//2], or [B, L, D//2] for PER-SAMPLE
    tables — the varlen mixed-length batch path, where each sample carries
    its own geometry's rope as data).

    ``compute_dtype`` defaults to fp32, matching the reference's fp32
    complex rope (`wan_transformer3d.py:135-136`). bf16 avoids fp32-sized
    HLO temps (XLA CSE-materializes the upcast input once per q/k — 580 MB
    each at the 14B 29.6k-token geometry); the angle tables themselves are
    always float64-derived so only the final multiply loses precision.
    Result in x.dtype; rotated halves cast BEFORE stacking so the
    materialized output buffer is x.dtype-sized."""
    cd = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
    orig_dtype = x.dtype
    *lead, L, N, D = x.shape
    xf = x.astype(cd).reshape(*lead, L, N, D // 2, 2)
    a, b = xf[..., 0], xf[..., 1]
    if cos.ndim == 3:  # per-sample tables [B, L, D//2]
        c = cos.reshape(cos.shape[0], L, 1, D // 2).astype(cd)
        s = sin.reshape(sin.shape[0], L, 1, D // 2).astype(cd)
    else:
        c = cos.reshape(L, 1, D // 2).astype(cd)
        s = sin.reshape(L, 1, D // 2).astype(cd)
    ra = (a * c - b * s).astype(orig_dtype)
    rb = (a * s + b * c).astype(orig_dtype)
    return jnp.stack([ra, rb], axis=-1).reshape(*lead, L, N, D)
