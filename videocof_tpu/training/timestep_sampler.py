"""Uniform timestep-band sampling across data-parallel groups.

Re-design of the reference `DiscreteSampling`
(`videox_fun/utils/discrete_sampler.py:5-52`): partition [0, num_train) into
``group_num`` sigma bands keyed by the data-parallel index so each DP group
trains on a distinct noise band every step (variance reduction for
flow-matching training)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DiscreteSampling:
    def __init__(self, group_num: int, num_train_timesteps: int = 1000,
                 uniform_sampling: bool = True):
        self.group_num = max(1, group_num)
        self.num_train_timesteps = num_train_timesteps
        self.uniform_sampling = uniform_sampling
        self.band = num_train_timesteps // self.group_num

    def group_index(self, dp_rank: int) -> int:
        return dp_rank % self.group_num

    def sample(self, key: jax.Array, batch: int, dp_rank: int = 0) -> jax.Array:
        """Integer timesteps [batch] drawn from this rank's band (or from the
        whole range when uniform_sampling is off)."""
        if not self.uniform_sampling:
            return jax.random.randint(key, (batch,), 0,
                                      self.num_train_timesteps)
        g = self.group_index(dp_rank)
        lo = g * self.band
        hi = self.num_train_timesteps if g == self.group_num - 1 \
            else (g + 1) * self.band
        return jax.random.randint(key, (batch,), lo, hi)
