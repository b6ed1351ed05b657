"""Diffusion samplers (reference: samplers_base.py, dpm_solver_plus_plus_2s.py).

``Sampler`` is the ABC; ``DPMSolverPlusPlus2S`` is the 2nd-order single-step
ODE solver with optional stochastic churn, run as one in-graph
``lax.fori_loop`` over the descending noise schedule (two denoiser
evaluations per level).
"""

from __future__ import annotations

import abc
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.diffusion import noise as noise_lib
from graphcast_tpu.field_tree import tree_where
from graphcast_tpu.fields import FieldSet

# denoiser_fn(noise_level [batch], x: FieldSet) -> denoised FieldSet
DenoiserFn = Callable[..., FieldSet]


class Sampler(abc.ABC):
  """Generates a sample of targets given a denoiser
  (reference: samplers_base.py:23-47)."""

  def __init__(self, denoiser_fn: DenoiserFn):
    self._denoiser_fn = denoiser_fn

  @abc.abstractmethod
  def __call__(self, rng, inputs: FieldSet, targets_template: FieldSet,
               forcings: Optional[FieldSet] = None) -> FieldSet:
    ...


class DPMSolverPlusPlus2S(Sampler):
  """DPM-Solver++ 2S with EDM σ(t)=t, s(t)=1, r=1/2 (geometric midpoint)
  (reference: dpm_solver_plus_plus_2s.py:28-187)."""

  def __init__(self,
               denoiser_fn: DenoiserFn,
               max_noise_level: float = 80.0,
               min_noise_level: float = 0.03,
               num_noise_levels: int = 20,
               rho: float = 7.0,
               stochastic_churn_rate: float = 2.5,
               churn_min_noise_level: float = 0.75,
               churn_max_noise_level: float = float("inf"),
               noise_level_inflation_factor: float = 1.05):
    super().__init__(denoiser_fn)
    self._noise_levels = noise_lib.noise_schedule(
        max_noise_level, min_noise_level, num_noise_levels, rho)
    self._stochastic_churn = stochastic_churn_rate > 0
    self._per_step_churn_rates = noise_lib.stochastic_churn_rate_schedule(
        self._noise_levels, stochastic_churn_rate, churn_min_noise_level,
        churn_max_noise_level)
    self._noise_level_inflation_factor = noise_level_inflation_factor

  def __call__(self, rng, inputs: FieldSet, targets_template: FieldSet,
               forcings: Optional[FieldSet] = None,
               noise_basis=None) -> FieldSet:
    """noise_basis: optional SHT synthesis tensors threaded as jit args
    (ops/sht.SphericalHarmonicBasis.arrays) — required at 0.25° where the
    Legendre tensor must not inline as an HLO constant."""
    dtype = targets_template.dtype() or jnp.float32
    noise_levels = jnp.asarray(self._noise_levels, dtype)
    churn_rates = jnp.asarray(self._per_step_churn_rates, dtype)
    batch = targets_template.sizes["batch"]

    def denoise(noise_level, x):
      bcast = jnp.tile(noise_level[None], batch)
      return self._denoiser_fn(inputs=inputs, noisy_targets=x,
                               noise_levels=bcast, forcings=forcings)

    def body_fn(i, x: FieldSet) -> FieldSet:
      # Lazily inject the initial noise at i == 0 so one spherical-harmonic
      # basis serves both noise calls (reference: dpm..._2s.py:125-135).
      key = jax.random.fold_in(rng, i)
      init_key, churn_key = jax.random.split(key)
      init_scale = jnp.where(i == 0, noise_levels[0], 0.0).astype(dtype)
      init_noise = noise_lib.spherical_white_noise_like(
          init_key, x, basis_arrays=noise_basis)
      x = x + init_noise * init_scale

      noise_level = noise_levels[i]
      if self._stochastic_churn:
        x, noise_level = noise_lib.apply_stochastic_churn(
            churn_key, x, noise_level,
            stochastic_churn_rate=churn_rates[i],
            noise_level_inflation_factor=self._noise_level_inflation_factor,
            basis_arrays=noise_basis)

      next_noise_level = noise_levels[i + 1]
      mid_noise_level = jnp.sqrt(noise_level * next_noise_level)

      mid_over_current = (mid_noise_level / noise_level).astype(dtype)
      x_denoised = denoise(noise_level, x)
      x_mid = (x * mid_over_current) + (x_denoised * (1 - mid_over_current))

      next_over_current = (next_noise_level / noise_level).astype(dtype)
      x_mid_denoised = denoise(mid_noise_level, x_mid)
      x_next = (x * next_over_current) + (x_mid_denoised *
                                          (1 - next_over_current))

      # Final step to σ=0: Euler, i.e. the denoised value directly
      # (reference: dpm..._2s.py:172-181).
      return tree_where(next_noise_level == 0, x_denoised, x_next)

    x0 = targets_template.map_data(jnp.zeros_like)
    return jax.lax.fori_loop(0, len(self._noise_levels) - 1, body_fn, x0)
