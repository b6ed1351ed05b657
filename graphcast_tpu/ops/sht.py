"""Real spherical-harmonic synthesis (inverse transform) on lat/lon grids.

Native replacement for the reference's dependency on the external `dinosaur`
dycore (samplers_utils.py:41-247), used to sample isotropic Gaussian-process
noise on the sphere. We implement exactly what's needed: evaluation of
orthonormal real spherical harmonics on an arbitrary latitude grid and the
inverse transform (modal → nodal), as two einsums that map well onto the MXU:

  g[..., m, lat] = Σ_l  a[..., l, m] · P̃_l^m(sin lat)        (Legendre stage)
  f[..., lat, lon] = Σ_m g[..., m, lat] · {cos,sin}(m·lon)    (Fourier stage)

P̃ are fully-normalized associated Legendre functions (orthonormal over the
sphere), computed host-side with the standard stable three-term recurrence.
With coefficients a_lm ~ N(0, 4π·power[l]/(2l+1)) the synthesized field has
pointwise variance Σ_l power[l] at every grid point (isotropy via the
addition theorem), matching the reference's normalization
(samplers_utils.py:296-313).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def normalized_legendre(max_l: int, x: np.ndarray) -> np.ndarray:
  """P̃_l^m(x) for 0 ≤ m ≤ l < max_l, orthonormal over the sphere.

  Returns array [len(x), max_l, max_l] indexed [x, l, m]; entries with
  m > l are zero. Normalization: ∫ (P̃_l^m(cosθ) e^{imφ})² dΩ = 1 for m=0
  and the real forms with the √2 factor applied by the caller for m>0.
  """
  x = np.asarray(x, dtype=np.float64)
  n = x.shape[0]
  p = np.zeros((n, max_l, max_l), dtype=np.float64)
  somx2 = np.sqrt(np.maximum(0.0, 1.0 - x * x))  # sin(theta)

  # Diagonal: P̃_m^m.
  pmm = np.full(n, np.sqrt(1.0 / (4.0 * np.pi)))
  p[:, 0, 0] = pmm
  for m in range(1, max_l):
    pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * somx2 * pmm
    p[:, m, m] = pmm

  # First off-diagonal: P̃_{m+1}^m.
  for m in range(0, max_l - 1):
    p[:, m + 1, m] = np.sqrt(2.0 * m + 3.0) * x * p[:, m, m]

  # Upward recurrence in l.
  for m in range(0, max_l):
    for l in range(m + 2, max_l):
      a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
      b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
      p[:, l, m] = a * (x * p[:, l - 1, m] - b * p[:, l - 2, m])
  return p


class SphericalHarmonicBasis:
  """Precomputed synthesis matrices for a fixed (lat, lon, max_l)."""

  def __init__(self, lat_deg: np.ndarray, lon_deg: np.ndarray, max_l: int):
    self.max_l = max_l
    self.n_lat = lat_deg.shape[0]
    self.n_lon = lon_deg.shape[0]
    x = np.sin(np.deg2rad(np.asarray(lat_deg, np.float64)))
    # [lat, l, m]
    self.legendre = normalized_legendre(max_l, x).astype(np.float32)
    phi = np.deg2rad(np.asarray(lon_deg, np.float64))  # [lon]
    m = np.arange(max_l)[:, None]  # [m, 1]
    self.cos_mat = (np.cos(m * phi[None, :])).astype(np.float32)  # [m, lon]
    self.sin_mat = (np.sin(m * phi[None, :])).astype(np.float32)
    # Real-form √2 factor for m > 0.
    self.m_scale = np.where(np.arange(max_l) == 0, 1.0,
                            np.sqrt(2.0)).astype(np.float32)

  def arrays(self, dtype=np.float32) -> dict:
    """The synthesis tensors as a pytree — thread these through jitted
    programs as *arguments* (at 0.25° the Legendre tensor is ~1.5 GB and
    must not become an HLO constant)."""
    sin_mask = (np.arange(self.max_l) > 0).astype(np.float32)
    return {
        "legendre": self.legendre.astype(dtype),
        "cos_mat": self.cos_mat.astype(dtype),
        "sin_mat": self.sin_mat.astype(dtype),
        "m_scale": (self.m_scale[:, None]).astype(dtype),
        "sin_mask": (sin_mask[:, None] * self.m_scale[:, None]).astype(dtype),
    }

  def synthesize(self, cos_coeffs, sin_coeffs):
    """Inverse transform of real SH coefficients.

    Args:
      cos_coeffs: [..., l, m] coefficients of the cos(mφ) harmonics (m ≥ 0).
      sin_coeffs: [..., l, m] coefficients of the sin(mφ) harmonics (m ≥ 1;
        the m=0 column is ignored).

    Returns:
      [..., lat, lon] field.
    """
    return synthesize_with(self.arrays(), cos_coeffs, sin_coeffs)


@functools.lru_cache(maxsize=8)
def _cached_basis(lat_key: bytes, lon_key: bytes, n_lat: int, n_lon: int,
                  max_l: int) -> SphericalHarmonicBasis:
  lat = np.frombuffer(lat_key, dtype=np.float64)
  lon = np.frombuffer(lon_key, dtype=np.float64)
  return SphericalHarmonicBasis(lat, lon, max_l)


def get_basis(lat_deg, lon_deg, max_l: int) -> SphericalHarmonicBasis:
  lat = np.asarray(lat_deg, np.float64)
  lon = np.asarray(lon_deg, np.float64)
  return _cached_basis(lat.tobytes(), lon.tobytes(), lat.shape[0],
                       lon.shape[0], max_l)


def synthesize_with(arrays: dict, cos_coeffs, sin_coeffs):
  """Inverse transform using explicit synthesis tensors (see
  SphericalHarmonicBasis.arrays); arrays may be numpy, device arrays, or
  tracers."""
  leg = jnp.asarray(arrays["legendre"])
  # Legendre stage: [..., l, m] x [lat, l, m] -> [..., m, lat]
  g_c = jnp.einsum("...lm,plm->...mp", cos_coeffs, leg)
  g_s = jnp.einsum("...lm,plm->...mp", sin_coeffs, leg)
  g_c = g_c * jnp.asarray(arrays["m_scale"])
  g_s = g_s * jnp.asarray(arrays["sin_mask"])
  # Fourier stage: [..., m, lat] x [m, lon] -> [..., lat, lon]
  return (jnp.einsum("...mp,mq->...pq", g_c, jnp.asarray(arrays["cos_mat"]))
          + jnp.einsum("...mp,mq->...pq", g_s,
                       jnp.asarray(arrays["sin_mat"])))
