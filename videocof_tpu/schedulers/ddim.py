"""DDIM scheduler (v-prediction) for the CogVideoX family.

The CogVideoX checkpoints are epsilon-family diffusion models (not flow
matching): scheduler config `beta_schedule="scaled_linear"`,
`beta_start=0.00085`, `beta_end=0.012`, `snr_shift_scale=3.0`,
`rescale_betas_zero_snr=True`, `timestep_spacing="trailing"`,
`prediction_type="v_prediction"` (diffusers `CogVideoXDDIMScheduler`, which
the CogVideoX pipelines default to with eta=0).

Repo convention (`schedulers/` invariant): every data-independent
coefficient is precomputed host-side in float64; the device step is a
handful of fused multiply-adds, and `plan_arrays()` feeds the fused-scan
sampler.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift & scale sqrt(alpha_bar) so the terminal step has zero SNR
    (Lin et al. 2023; diffusers `rescale_zero_terminal_snr`)."""
    s = np.sqrt(alphas_cumprod)
    s0, sT = s[0].copy(), s[-1].copy()
    s = s - sT                      # terminal -> 0
    s = s * s0 / (s0 - sT)          # first step restored
    return s ** 2


@dataclasses.dataclass
class DDIMState:
    pass


class DDIMScheduler:
    """eta=0 DDIM with v-prediction, faithful to CogVideoXDDIMScheduler."""

    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 snr_shift_scale: float = 3.0,
                 rescale_betas_zero_snr: bool = True):
        self.num_train_timesteps = num_train_timesteps
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        # SNR shift: alpha_bar <- alpha_bar / (s + (1-s) alpha_bar)
        ac = ac / (snr_shift_scale + (1.0 - snr_shift_scale) * ac)
        if rescale_betas_zero_snr:
            ac = _rescale_zero_terminal_snr(ac)
        self.alphas_cumprod = ac
        self.timesteps: Optional[np.ndarray] = None
        self._coeffs: Optional[np.ndarray] = None

    # ------------------------------------------------------------- schedule
    def set_timesteps(self, num_inference_steps: int,
                      shift: Optional[float] = None,
                      mu: Optional[float] = None) -> np.ndarray:
        T = self.num_train_timesteps
        # "trailing" spacing with FLOAT stride (diffusers: np.arange(T, 0,
        # -T/steps).round() - 1), so non-divisor step counts end near t=0;
        # the prev-step offset stays integer T//steps like diffusers' step()
        ts = (np.round(np.arange(T, 0, -T / num_inference_steps))
              .astype(np.int64) - 1)[:num_inference_steps]
        step = T // num_inference_steps
        self.timesteps = ts.astype(np.float64)
        self.num_inference_steps = num_inference_steps

        # per-step (sqrt_a_t, sqrt_1ma_t, sqrt_a_prev, sqrt_1ma_prev)
        coeffs = np.zeros((num_inference_steps, 4), np.float64)
        for i, t in enumerate(ts):
            prev_t = int(t) - step
            a_t = self.alphas_cumprod[int(t)]
            a_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
            coeffs[i] = (np.sqrt(a_t), np.sqrt(1.0 - a_t),
                         np.sqrt(a_prev), np.sqrt(1.0 - a_prev))
        self._coeffs = coeffs
        return self.timesteps

    # ----------------------------------------------------------------- step
    def init_state(self, latents: jax.Array) -> DDIMState:
        return DDIMState()

    def step(self, model_output: jax.Array, step_index: int,
             sample: jax.Array, state: DDIMState
             ) -> Tuple[jax.Array, DDIMState]:
        sa, s1a, sap, s1ap = (float(c) for c in self._coeffs[step_index])
        v = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        x0 = sa * x - s1a * v
        eps = sa * v + s1a * x
        prev = sap * x0 + s1ap * eps
        return prev.astype(sample.dtype), state

    def add_noise(self, original: jax.Array, noise: jax.Array,
                  timestep) -> jax.Array:
        a = self.alphas_cumprod[int(timestep)]
        return (np.sqrt(a) * original + np.sqrt(1.0 - a) * noise
                ).astype(original.dtype)

    # ----------------------------------------------------------- fused plan
    def plan_arrays(self) -> dict:
        """Per-step coefficient table for a fused lax.scan sampler:
        prev = c_x * x + c_v * v with
        c_x = sqrt(a_prev) sqrt(a_t) + sqrt(1-a_prev) sqrt(1-a_t),
        c_v = -sqrt(a_prev) sqrt(1-a_t) + sqrt(1-a_prev) sqrt(a_t)."""
        c = self._coeffs
        c_x = c[:, 2] * c[:, 0] + c[:, 3] * c[:, 1]
        c_v = -c[:, 2] * c[:, 1] + c[:, 3] * c[:, 0]
        return {"kind": "ddim", "timesteps": np.asarray(self.timesteps),
                "c_x": c_x, "c_v": c_v}
