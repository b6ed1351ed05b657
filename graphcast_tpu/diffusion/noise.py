"""Spherical noise sampling + EDM noise-level schedules.

Native re-implementation of the reference's samplers_utils.py:
- isotropic Gaussian-process noise on the sphere with a given power spectrum
  (sample:250-316) via our own spherical-harmonic synthesis (ops/sht.py);
- unit-variance spherical white noise (spherical_white_noise_like:319-331);
- Karras/EDM rho-distribution quantiles (rho_inverse_cdf:334-367),
  descending noise schedule with appended σ=0 (noise_schedule:379-396),
  stochastic churn schedules and application (:399-435).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.fields import Field, FieldSet
from graphcast_tpu.ops import sht


def sample_spherical_noise(key, power_spectrum: np.ndarray,
                           batch_shape: tuple[int, ...],
                           lat: np.ndarray, lon: np.ndarray,
                           dtype=jnp.float32,
                           basis_arrays=None):
  """Samples GP noise on the sphere with the given power spectrum.

  Returns [*batch_shape, lat, lon]; pointwise variance = sum(power_spectrum).
  ``basis_arrays`` (see sht.SphericalHarmonicBasis.arrays) lets callers
  thread the synthesis tensors as jit arguments instead of constants.
  """
  max_l = int(np.shape(power_spectrum)[0])
  # Coefficient variance: 4π·power[l]/(2l+1) split across the 2l+1 real
  # harmonics of total wavenumber l (reference: samplers_utils.py:296-313).
  ls = np.arange(max_l)
  per_coeff_std = np.sqrt(
      4.0 * np.pi * np.asarray(power_spectrum) / (2.0 * ls + 1.0))
  tri_mask = (np.arange(max_l)[None, :] <= ls[:, None])  # [l, m] m<=l
  scale = (per_coeff_std[:, None] * tri_mask).astype(np.float32)

  kc, ks = jax.random.split(key)
  shape = tuple(batch_shape) + (max_l, max_l)
  cos_coeffs = jax.random.normal(kc, shape, jnp.float32) * scale
  sin_coeffs = jax.random.normal(ks, shape, jnp.float32) * scale
  if basis_arrays is None:
    basis_arrays = sht.get_basis(lat, lon, max_l).arrays()
  out = sht.synthesize_with(basis_arrays, cos_coeffs, sin_coeffs)
  return out.astype(dtype)


def spherical_white_noise_like(key, template: FieldSet,
                               basis_arrays=None) -> FieldSet:
  """Unit marginal-variance isotropic white noise matching the template.

  Flat power spectrum over n_lon//2 wavenumbers
  (reference: samplers_utils.py:319-331).
  """
  coords = template.coords
  lat, lon = coords["lat"], coords["lon"]
  num_wavenumbers = lon.shape[0] // 2
  power = np.full(num_wavenumbers, 1.0 / num_wavenumbers)

  keys = jax.random.split(key, len(template.var_names))
  fields = {}
  for k, name in zip(keys, template.var_names):
    f = template[name]
    if f.dims[-2:] != ("lat", "lon"):
      raise ValueError(
          f"{name}: expected trailing (lat, lon) dims, got {f.dims}")
    noise = sample_spherical_noise(
        k, power, f.shape[:-2], lat, lon, dtype=f.dtype,
        basis_arrays=basis_arrays)
    fields[name] = Field(noise, f.dims)
  return FieldSet(fields, coords=coords)


def white_noise_basis_arrays(lat: np.ndarray, lon: np.ndarray,
                             dtype=np.float32) -> dict:
  """Synthesis tensors for white noise on this grid (max_l = n_lon//2)."""
  return sht.get_basis(lat, lon, lon.shape[0] // 2).arrays(dtype)


def rho_inverse_cdf(min_value: float, max_value: float, rho: float, cdf):
  """Quantiles of the EDM rho distribution (Karras et al. eq. 5;
  reference: samplers_utils.py:334-367)."""
  return (min_value ** (1 / rho)
          + cdf * (max_value ** (1 / rho) - min_value ** (1 / rho))) ** rho


def noise_schedule(max_noise_level: float = 80.0,
                   min_noise_level: float = 0.002,
                   num_noise_levels: int = 30,
                   rho: float = 7.0) -> np.ndarray:
  """Descending σ schedule with a final appended 0
  (reference: samplers_utils.py:379-396)."""
  levels = rho_inverse_cdf(min_noise_level, max_noise_level, rho,
                           np.linspace(1, 0, num_noise_levels))
  return np.append(levels, 0.0)


def stochastic_churn_rate_schedule(
    noise_levels: np.ndarray,
    stochastic_churn_rate: float = 0.0,
    churn_min_noise_level: float = 0.05,
    churn_max_noise_level: float = 50.0) -> np.ndarray:
  """Per-level churn rate, clamped to √2−1
  (reference: samplers_utils.py:399-415)."""
  num = len(noise_levels) - 1  # excluding the final zero
  per_step = min(stochastic_churn_rate / num, np.sqrt(2) - 1)
  active = ((churn_min_noise_level <= noise_levels[:-1])
            & (noise_levels[:-1] <= churn_max_noise_level))
  return active * per_step


def apply_stochastic_churn(key, x: FieldSet, noise_level,
                           stochastic_churn_rate,
                           noise_level_inflation_factor,
                           basis_arrays=None):
  """Renoises x to a slightly higher noise level
  (reference: samplers_utils.py:418-435)."""
  new_noise_level = noise_level * (1.0 + stochastic_churn_rate)
  noise_diff = jnp.maximum(new_noise_level ** 2 - noise_level ** 2, 0.0)
  extra_stddev = jnp.sqrt(noise_diff) * noise_level_inflation_factor
  noise = spherical_white_noise_like(key, x, basis_arrays=basis_arrays)
  updated = FieldSet(
      {n: Field(x[n].data + noise[n].data.astype(x[n].dtype) *
                jnp.asarray(extra_stddev, x[n].dtype), x[n].dims)
       for n in x.var_names},
      coords=x.coords)
  return updated, new_noise_level
