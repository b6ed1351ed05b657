"""ERA5-compatible TOA incident solar radiation (reference: solar_radiation.py).

Computes the `toa_incident_solar_radiation` forcing: the instantaneous
top-of-atmosphere solar flux from Earth's orbital position (the empirical
ECCC GEM polynomials used to match ERA5; see the references in
solar_radiation.py:197-290 — these are published physical formulas), yearly
TSI data, and trapezoidal integration of the flux over the accumulation
window (1h for ERA5, J·m⁻²).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

_SECONDS_PER_DAY = 24 * 3600
_J2000_EPOCH = 2451545.0  # Julian date of 2000-01-01 12:00 TT.
_JULIAN_YEAR_LENGTH_IN_DAYS = 365.25

# Reference Total Solar Irradiance in W·m⁻² (NOAA CDR / ecRad).
REFERENCE_TSI = 1361.0


def reference_tsi_data():
  """(years, tsi) arrays with a single reference value."""
  return np.array([0.0]), np.array([REFERENCE_TSI])


def era5_tsi_data():
  """Yearly TSI used by ERA5 (IFS cycle 41r2 table, scaled ×0.9965).

  Returns (fractional_years, tsi_w_m2). Data values as in the reference
  (solar_radiation.py:83-115) — an ECMWF-provided physical dataset.
  """
  time = np.arange(1951.5, 2035.5, 1.0)
  base = np.array([
      # 1951-1995
      1365.7765, 1365.7676, 1365.6284, 1365.6564, 1365.7773,
      1366.3109, 1366.6681, 1366.6328, 1366.3828, 1366.2767,
      1365.9199, 1365.7484, 1365.6963, 1365.6976, 1365.7341,
      1365.9178, 1366.1143, 1366.1644, 1366.2476, 1366.2426,
      1365.9580, 1366.0525, 1365.7991, 1365.7271, 1365.5345,
      1365.6453, 1365.8331, 1366.2747, 1366.6348, 1366.6482,
      1366.6951, 1366.2859, 1366.1992, 1365.8103, 1365.6416,
      1365.6379, 1365.7899, 1366.0826, 1366.6479, 1366.5533,
      1366.4457, 1366.3021, 1366.0286, 1365.7971, 1365.6996,
  ] + [
      # 1996-2008 cycle, repeated three times through 2034.
      1365.6121, 1365.7399, 1366.1021, 1366.3851, 1366.6836,
      1366.6022, 1366.6807, 1366.2300, 1366.0480, 1365.8545,
      1365.8107, 1365.7240, 1365.6918,
  ] * 3)
  return time, 0.9965 * base


def get_tsi(timestamps, tsi_years: np.ndarray, tsi_values: np.ndarray
            ) -> np.ndarray:
  """Interpolates yearly TSI at the given timestamps
  (reference: solar_radiation.py:131-160)."""
  timestamps = pd.DatetimeIndex(timestamps)
  dates = pd.DatetimeIndex(timestamps.date)
  day_fraction = (timestamps - dates) / pd.Timedelta(days=1)
  year_length = 365 + timestamps.is_leap_year
  year_fraction = (timestamps.dayofyear - 1 + day_fraction) / year_length
  fractional_year = timestamps.year + year_fraction
  return np.interp(fractional_year, tsi_years, tsi_values)


@dataclasses.dataclass(frozen=True)
class OrbitalParameters:
  theta: jnp.ndarray
  rotational_phase: jnp.ndarray
  sin_declination: jnp.ndarray
  cos_declination: jnp.ndarray
  eq_of_time_seconds: jnp.ndarray
  solar_distance_au: jnp.ndarray


def get_j2000_days(timestamp: pd.Timestamp) -> float:
  return timestamp.to_julian_date() - _J2000_EPOCH


def get_orbital_parameters(j2000_days) -> OrbitalParameters:
  """ECCC GEM empirical orbital polynomials
  (reference: solar_radiation.py:197-290)."""
  theta = j2000_days / _JULIAN_YEAR_LENGTH_IN_DAYS
  rotational_phase = j2000_days % 1.0

  rel = 1.7535 + 6.283076 * theta     # mean longitude-ish angle
  rem = 6.240041 + 6.283020 * theta   # mean anomaly
  rlls = 4.8951 + 6.283076 * theta    # mean ecliptic longitude

  # Ecliptic longitude of the Sun.
  rllls = (4.8952 + 6.283320 * theta
           - 0.0075 * jnp.sin(rel) - 0.0326 * jnp.cos(rel)
           - 0.0003 * jnp.sin(2.0 * rel) + 0.0002 * jnp.cos(2.0 * rel))

  repsm = 0.409093  # obliquity (23.4393°) in radians

  sin_declination = jnp.sin(repsm) * jnp.sin(rllls)
  cos_declination = jnp.sqrt(1.0 - sin_declination ** 2)

  eq_of_time_seconds = (
      591.8 * jnp.sin(2.0 * rlls) - 459.4 * jnp.sin(rem)
      + 39.5 * jnp.sin(rem) * jnp.cos(2.0 * rlls)
      - 12.7 * jnp.sin(4.0 * rlls) - 4.8 * jnp.sin(2.0 * rem))

  solar_distance_au = (1.0001 - 0.0163 * jnp.sin(rel)
                       + 0.0037 * jnp.cos(rel))

  return OrbitalParameters(
      theta=theta, rotational_phase=rotational_phase,
      sin_declination=sin_declination, cos_declination=cos_declination,
      eq_of_time_seconds=eq_of_time_seconds,
      solar_distance_au=solar_distance_au)


def get_solar_sin_altitude(op: OrbitalParameters, sin_latitude, cos_latitude,
                           longitude):
  """Sine of the solar altitude angle
  (reference: solar_radiation.py:293-325)."""
  solar_time = op.rotational_phase + op.eq_of_time_seconds / _SECONDS_PER_DAY
  hour_angle = 2.0 * jnp.pi * solar_time + longitude
  return (cos_latitude * op.cos_declination * jnp.cos(hour_angle)
          + sin_latitude * op.sin_declination)


def get_radiation_flux(j2000_days, sin_latitude, cos_latitude, longitude,
                       tsi):
  """Instantaneous TOA incident flux in W·m⁻²
  (reference: solar_radiation.py:328-365)."""
  op = get_orbital_parameters(j2000_days)
  solar_factor = (1.0 / op.solar_distance_au) ** 2
  sin_altitude = get_solar_sin_altitude(op, sin_latitude, cos_latitude,
                                        longitude)
  return tsi * solar_factor * jnp.maximum(sin_altitude, 0.0)


def get_integrated_radiation(j2000_days, sin_latitude, cos_latitude,
                             longitude, tsi,
                             integration_period_seconds: float,
                             num_integration_bins: int):
  """Trapezoidal integral of the flux over the accumulation window ending at
  each timestamp; J·m⁻² (reference: solar_radiation.py:368-434)."""
  offsets_days = np.linspace(
      -integration_period_seconds / _SECONDS_PER_DAY, 0.0,
      num_integration_bins + 1)
  fluxes = get_radiation_flux(
      j2000_days=jnp.expand_dims(j2000_days, -1) + offsets_days,
      sin_latitude=jnp.expand_dims(sin_latitude, -1),
      cos_latitude=jnp.expand_dims(cos_latitude, -1),
      longitude=jnp.expand_dims(longitude, -1),
      tsi=jnp.expand_dims(tsi, -1))
  dx = integration_period_seconds / num_integration_bins
  return jax.scipy.integrate.trapezoid(fluxes, dx=dx)


_integrated_jitted = jax.jit(
    get_integrated_radiation,
    static_argnames=["integration_period_seconds", "num_integration_bins"])


def get_toa_incident_solar_radiation(
    timestamps: Sequence,
    latitude: np.ndarray,
    longitude: np.ndarray,
    tsi_data: Optional[tuple[np.ndarray, np.ndarray]] = None,
    integration_period: str = "1h",
    num_integration_bins: int = 360,
) -> np.ndarray:
  """TISR for each (timestamp, lat, lon); shape [T, n_lat, n_lon], J·m⁻².

  Timestamps are processed one at a time to bound memory
  (reference: solar_radiation.py:443-520).
  """
  if tsi_data is None:
    tsi_data = era5_tsi_data()
  period_s = pd.Timedelta(integration_period) / pd.Timedelta(seconds=1)
  lat_rad = np.deg2rad(np.asarray(latitude))[:, None]
  lon_rad = np.deg2rad(np.asarray(longitude))[None, :]
  sin_lat = np.sin(lat_rad)
  cos_lat = np.cos(lat_rad)
  tsi = get_tsi(timestamps, *tsi_data)
  results = []
  for idx, ts in enumerate(timestamps):
    j2000 = get_j2000_days(pd.Timestamp(ts))
    flux = _integrated_jitted(
        jnp.float32(j2000), sin_lat.astype(np.float32),
        cos_lat.astype(np.float32), lon_rad.astype(np.float32),
        jnp.float32(tsi[idx]),
        integration_period_seconds=float(period_s),
        num_integration_bins=num_integration_bins)
    results.append(np.asarray(flux))
  return np.stack(results, axis=0)
