"""DPM-Solver++ (2M, midpoint) for rectified flow.

Parity target: reference `videox_fun/utils/fm_solvers.py` with its defaults
(algorithm "dpmsolver++", solver_type "midpoint", solver_order 2,
final_sigmas_type "zero", prediction_type "flow_prediction"), driven through
`get_sampling_sigmas(steps, shift)` (`fm_solvers.py:22-27`) whose grid starts
at sigma_max = 1.0 (unlike UniPC's 1 - 1/T).

As with the UniPC port, all per-step scalar coefficients are precomputed in
float64 on the host so the device step is a pure fused multiply-add.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import lam


def get_sampling_sigmas(num_inference_steps: int, shift: float) -> np.ndarray:
    """Reference `fm_solvers.py:22-27`: linspace(1, 0, steps+1)[:steps], shifted."""
    sigma = np.linspace(1.0, 0.0, num_inference_steps + 1,
                        dtype=np.float64)[:num_inference_steps]
    return shift * sigma / (1.0 + (shift - 1.0) * sigma)


class DPMState(NamedTuple):
    m0: jax.Array  # newest converted output (x0 prediction)
    m1: jax.Array


@dataclasses.dataclass(frozen=True)
class _StepPlan:
    order: int
    ratio: float   # sigma_t / sigma_s0
    c_m0: float    # -alpha_t * (exp(-h) - 1)
    c_d1: float    # -0.5 * alpha_t * (exp(-h) - 1) (midpoint), 0 for order 1
    r0inv: float   # h / h_0


class FlowDPMScheduler:
    order = 1

    def __init__(self, num_train_timesteps: int = 1000, solver_order: int = 2,
                 shift: float = 1.0, lower_order_final: bool = True):
        assert solver_order in (1, 2)
        self.num_train_timesteps = num_train_timesteps
        self.solver_order = solver_order
        self.default_shift = shift
        self.lower_order_final = lower_order_final
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None
        self.plans: List[_StepPlan] = []

    def set_timesteps(self, num_inference_steps: int,
                      shift: Optional[float] = None,
                      sigmas: Optional[np.ndarray] = None) -> np.ndarray:
        shift = self.default_shift if shift is None else shift
        if sigmas is None:
            sigmas = get_sampling_sigmas(num_inference_steps, shift)
        sigmas = np.asarray(sigmas, dtype=np.float64)
        self.timesteps = (sigmas * self.num_train_timesteps).astype(np.int64)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_inference_steps = len(self.timesteps)
        self.plans = self._build_plans()
        return self.timesteps

    def _build_plans(self) -> List[_StepPlan]:
        s = self.sigmas
        N = self.num_inference_steps
        plans = []
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(N):
                # order selection mirrors `fm_solvers.py:803-833`:
                # first step and (with final_sigmas_type zero) last step are
                # first-order; everything else runs the 2M update.
                low_final = (i == N - 1)
                order = 1 if (self.solver_order == 1 or i < 1 or low_final) else 2
                sig_t, sig_s0 = s[i + 1], s[i]
                a_t = 1.0 - sig_t
                if sig_t == 0.0:
                    plans.append(_StepPlan(1, 0.0, float(a_t), 0.0, 0.0))
                    continue
                h = lam(sig_t) - lam(sig_s0)
                em = float(np.expm1(-h))
                if order == 1:
                    plans.append(_StepPlan(1, float(sig_t / sig_s0),
                                           float(-a_t * em), 0.0, 0.0))
                else:
                    h_0 = lam(sig_s0) - lam(s[i - 1])
                    r0 = h_0 / h
                    plans.append(_StepPlan(2, float(sig_t / sig_s0),
                                           float(-a_t * em),
                                           float(-0.5 * a_t * em),
                                           float(1.0 / r0)))
        return plans

    def init_state(self, latents: jax.Array) -> DPMState:
        z = jnp.zeros_like(latents)
        return DPMState(m0=z, m1=z)

    def step(self, model_output: jax.Array, step_index: int,
             sample: jax.Array, state: DPMState
             ) -> Tuple[jax.Array, DPMState]:
        plan = self.plans[step_index]
        sigma_t = float(self.sigmas[step_index])
        m0 = sample - sigma_t * model_output  # x0 prediction
        x = plan.ratio * sample.astype(jnp.float32) + plan.c_m0 * m0
        if plan.order >= 2:
            d1 = (m0 - state.m0) * plan.r0inv
            x = x + plan.c_d1 * d1
        return x.astype(sample.dtype), DPMState(m0=m0, m1=state.m0)

    def add_noise(self, original: jax.Array, noise: jax.Array,
                  sigma) -> jax.Array:
        return (1.0 - sigma) * original + sigma * noise

    def plan_arrays(self) -> dict:
        f = lambda name: np.array([getattr(p, name) for p in self.plans],
                                  dtype=np.float32)
        return {
            "sigma": self.sigmas[:-1].astype(np.float32),
            "timestep": self.timesteps.astype(np.float32),
            "order2": np.array([p.order >= 2 for p in self.plans], np.bool_),
            "ratio": f("ratio"), "c_m0": f("c_m0"), "c_d1": f("c_d1"),
            "r0inv": f("r0inv"),
        }
