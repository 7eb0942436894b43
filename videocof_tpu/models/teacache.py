"""TeaCache — timestep-embedding-aware step skipping.

Reference: `videox_fun/models/cache_utils.py` + the in-forward logic at
`wan_transformer3d.py:955-1031`. The skip signal there is the relative-L1
distance between successive *timestep-embedding modulations* (``e0``), which
depends only on the timestep schedule and the time-MLP weights — NOT on the
latents. The reference evaluates it step by step at runtime; here we exploit
the data-independence and precompute the entire skip schedule once per
(timesteps, weights): zero per-step host syncs, and the denoise loop stays a
static sequence of compiled calls.

On a skip step the block stack is bypassed and the cached token-stream
residual is re-added (`wan_transformer3d.py:981-984`); the head/unpatchify
still run. `wan_dit.wan_dit_forward_with_residual` provides that variant.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanDiTConfig
from . import wan_dit

# Published per-model rescale polynomials (TeaCache, arXiv:2411.19108;
# reference `cache_utils.py:4-18`).
TEACACHE_COEFFICIENTS = {
    "wan2.1-t2v-1.3b": [-5.21862437e+04, 9.23041404e+03, -5.28275948e+02,
                        1.36987616e+01, -4.99875664e-02],
    "wan2.1-t2v-14b": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                       5.87365115e+01, -3.15583525e-01],
    "wan2.1-i2v-14b-480p": [2.57151496e+05, -3.54229917e+04, 1.40286849e+03,
                            -1.35890334e+01, 1.32517977e-01],
    "wan2.1-i2v-14b-720p": [8.10705460e+03, 2.13393892e+03, -3.72934672e+02,
                            1.66203073e+01, -4.17769401e-02],
}

# Checkpoint-name alias -> coefficient set, in the reference's elif order
# (`cache_utils.py:5-15`): every Fun/VACE/Wan2.2 family name maps onto one
# of the four published polynomials. Substring match, first hit wins.
_ALIAS_CHAIN = (
    (("wan2.1-t2v-1.3b", "wan2.1-fun-1.3b", "wan2.1-fun-v1.1-1.3b",
      "wan2.1-vace-1.3b"), "wan2.1-t2v-1.3b"),
    (("wan2.1-t2v-14b",), "wan2.1-t2v-14b"),
    (("wan2.1-i2v-14b-480p",), "wan2.1-i2v-14b-480p"),
    (("wan2.1-i2v-14b-720p", "wan2.1-fun-14b", "wan2.2-fun",
      "wan2.2-i2v-a14b", "wan2.2-t2v-a14b", "wan2.2-ti2v-5b",
      "wan2.2-s2v", "wan2.1-vace-14b", "wan2.2-vace-fun"),
     "wan2.1-i2v-14b-720p"),
)


def get_teacache_coefficients(model_name: str) -> Optional[List[float]]:
    low = model_name.lower()
    for aliases, key in _ALIAS_CHAIN:
        if any(a in low for a in aliases):
            return TEACACHE_COEFFICIENTS[key]
    # size-only fallback (rebuild convenience; the reference returns None)
    if "1.3b" in low:
        return TEACACHE_COEFFICIENTS["wan2.1-t2v-1.3b"]
    if "14b" in low:
        return TEACACHE_COEFFICIENTS["wan2.1-t2v-14b"]
    return None


def timestep_modulations(dit_params, cfg: WanDiTConfig,
                         timesteps: Sequence[float]) -> np.ndarray:
    """e0 [N, 6*dim] for each timestep, in fp32 (one tiny jit)."""
    t = jnp.asarray(np.asarray(timesteps, np.float32))

    @jax.jit
    def f(t):
        e = wan_dit.sinusoidal_embedding_1d(cfg.freq_dim, t)
        e = wan_dit._linear(e, dit_params["time_mlp"]["fc1"], jnp.float32)
        e = jax.nn.silu(e)
        e = wan_dit._linear(e, dit_params["time_mlp"]["fc2"], jnp.float32)
        return wan_dit._linear(jax.nn.silu(e), dit_params["time_proj"]["fc"],
                               jnp.float32)

    return np.asarray(f(t))


def plan_teacache_skips(
    dit_params, cfg: WanDiTConfig, timesteps: Sequence[float],
    coefficients: Sequence[float], rel_l1_thresh: float,
    num_skip_start_steps: int = 0,
) -> List[bool]:
    """True = skip the block stack at that step (reuse cached residual).

    Mirrors the accumulate-and-reset logic of `wan_transformer3d.py:962-976`:
    accumulated rescaled distance below threshold -> skip; otherwise compute
    and reset the accumulator. Step 0 and the first `num_skip_start_steps`
    always compute.
    """
    e0 = timestep_modulations(dit_params, cfg, timesteps)
    poly = np.polynomial.Polynomial(list(reversed(list(coefficients))))
    skips: List[bool] = []
    acc = 0.0
    prev = None
    for i in range(len(timesteps)):
        if i < num_skip_start_steps or prev is None:
            skips.append(False)
            acc = 0.0
        else:
            rel = float(np.mean(np.abs(e0[i] - prev)) /
                        (np.mean(np.abs(prev)) + 1e-12))
            acc += float(poly(rel))
            if acc < rel_l1_thresh:
                skips.append(True)
            else:
                skips.append(False)
                acc = 0.0
        prev = e0[i]
    return skips
