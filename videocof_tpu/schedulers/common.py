"""Shared flow-matching schedule math.

Rectified-flow noising: x_t = (1 - sigma) * x0 + sigma * noise, with the model
predicting velocity v = noise - x0, so x0 = x_t - sigma * v.

The "shift" transform stretches the sigma grid toward the noisy end:
sigma' = s * sigma / (1 + (s - 1) * sigma)   (reference
`fm_solvers_unipc.py:182-213`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def shift_sigma(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def time_shift_mu(sigmas: np.ndarray, mu: float, s: float = 1.0) -> np.ndarray:
    """Dynamic (resolution-aware) shift: e^mu / (e^mu + (1/t - 1)^s)."""
    return np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0) ** s)


def flow_shift_sigmas(
    num_inference_steps: int,
    shift: float = 1.0,
    num_train_timesteps: int = 1000,
    mu: float = None,
    sigma_max: float = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sigmas[steps+1] float64 with trailing 0, timesteps[steps] int64).

    Matches the reference UniPC grid: linspace from sigma_max = 1 - 1/T down to
    sigma_min = 0 over steps+1 points, drop the last, shift, append final 0;
    integer timesteps are sigma * T truncated (the model is conditioned on
    these ints — reference `fm_solvers_unipc.py:205-211`).
    """
    if sigma_max is None:
        sigma_max = 1.0 - 1.0 / num_train_timesteps
    sigmas = np.linspace(sigma_max, 0.0, num_inference_steps + 1,
                         dtype=np.float64)[:-1]
    if mu is not None:
        sigmas = time_shift_mu(sigmas, mu)
    else:
        sigmas = shift_sigma(sigmas, shift)
    timesteps = (sigmas * num_train_timesteps).astype(np.int64)
    sigmas = np.concatenate([sigmas, [0.0]])
    return sigmas, timesteps


def sigma_to_alpha(sigma: np.ndarray) -> np.ndarray:
    return 1.0 - sigma


def lam(sigma) -> np.ndarray:
    """lambda(sigma) = log(alpha) - log(sigma); +inf at sigma=0."""
    with np.errstate(divide="ignore"):
        return np.log(1.0 - sigma) - np.log(sigma)


def get_scheduler(name: str, **kwargs):
    from .flow_euler import FlowEulerScheduler
    from .flow_unipc import FlowUniPCScheduler
    from .flow_dpm import FlowDPMScheduler
    from .ddim import DDIMScheduler

    table = {"euler": FlowEulerScheduler, "unipc": FlowUniPCScheduler,
             "dpm++": FlowDPMScheduler, "ddim": DDIMScheduler}
    aliases = {"flow": "euler", "flow_unipc": "unipc", "flow_dpm++": "dpm++",
               "cogvideox_ddim": "ddim"}
    key = name.lower()
    key = aliases.get(key, key)
    if key not in table:
        raise ValueError(f"unknown scheduler {name!r}; have {sorted(table)}")
    return table[key](**kwargs)
