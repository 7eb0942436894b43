"""Flow-matching Euler sampler (the reference delegates this path to
diffusers' FlowMatchEulerDiscreteScheduler — `inference.py:9`,
`pipeline_wan.py:611-612`).

x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v.  Stateless; the per-step sigma
deltas are host scalars so the update fuses into the surrounding jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import flow_shift_sigmas


class EulerState(NamedTuple):
    # kept for API symmetry with the multistep samplers
    pass


class FlowEulerScheduler:
    order = 1

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0):
        self.num_train_timesteps = num_train_timesteps
        self.default_shift = shift
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None

    def set_timesteps(self, num_inference_steps: int,
                      shift: Optional[float] = None,
                      mu: Optional[float] = None) -> np.ndarray:
        # Faithful to diffusers' FlowMatchEulerDiscreteScheduler (which the
        # reference uses verbatim — `inference.py:9`, `pipeline_wan.py:611`):
        #   * mu given (use_dynamic_shifting): grid linspace(1, 1/T) then the
        #     exponential time shift exp(mu)/(exp(mu) + (1/s - 1)).
        #   * static shift: __init__ shifts the train sigmas, so sigma_min is
        #     ALREADY shifted when set_timesteps re-derives the grid from it
        #     and shifts AGAIN — the grid runs linspace(1, shift(1/T)) with
        #     one more shift applied. Quirky, but it is what the reference
        #     samples with when sampler="Flow" (shift=5 per wan_civitai.yaml,
        #     whose use_dynamic_shifting=false makes the pipeline's mu=1
        #     a no-op); pinned by the e2e pipeline oracle.
        shift = self.default_shift if shift is None else shift
        T = self.num_train_timesteps
        if mu is not None:
            sigmas = np.linspace(1.0, 1.0 / T, num_inference_steps,
                                 dtype=np.float64)
            sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
        else:
            smin = (shift * (1.0 / T)) / (1.0 + (shift - 1.0) * (1.0 / T))
            sigmas = np.linspace(1.0, smin, num_inference_steps,
                                 dtype=np.float64)
            sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        # float timesteps (sigma*T), matching diffusers'
        # FlowMatchEulerDiscreteScheduler — no int truncation; UniPC/DPM
        # intentionally truncate, this path must not
        self.timesteps = (sigmas * T).astype(np.float64)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_inference_steps = num_inference_steps
        return self.timesteps

    def init_state(self, latents: jax.Array) -> EulerState:
        return EulerState()

    def step(self, model_output: jax.Array, step_index: int,
             sample: jax.Array, state: EulerState
             ) -> Tuple[jax.Array, EulerState]:
        dt = float(self.sigmas[step_index + 1] - self.sigmas[step_index])
        prev = sample + dt * model_output
        return prev.astype(sample.dtype), state

    def add_noise(self, original: jax.Array, noise: jax.Array,
                  sigma) -> jax.Array:
        return (1.0 - sigma) * original + sigma * noise

    def plan_arrays(self) -> dict:
        return {
            "sigma": self.sigmas[:-1].astype(np.float32),
            "timestep": self.timesteps.astype(np.float32),
            "dt": np.diff(self.sigmas).astype(np.float32),
        }
