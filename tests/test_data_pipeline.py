"""Tests: derived vars, TISR, input/target/forcing extraction
(modeled on data_utils_test.py and solar_radiation_test.py)."""

import numpy as np
import pandas as pd
import pytest

from graphcast_tpu.data import era5, solar_radiation
from graphcast_tpu.fields import Field, FieldSet


def make_timeseries(batch=1, nt=6, nlat=7, nlon=8, nlev=3, start="2020-01-01"):
  rng = np.random.RandomState(0)
  lat = np.linspace(-90, 90, nlat)
  lon = np.arange(0, 360, 360 / nlon)
  levels = np.array([500, 700, 850])[:nlev]
  step = np.timedelta64(6, "h")
  time = np.arange(nt) * step
  datetimes = (np.datetime64(start) + time)[None].repeat(batch, axis=0)
  fs = FieldSet(
      {
          "temperature": Field(
              rng.randn(batch, nt, nlev, nlat, nlon).astype(np.float32),
              ("batch", "time", "level", "lat", "lon")),
          "2m_temperature": Field(
              rng.randn(batch, nt, nlat, nlon).astype(np.float32),
              ("batch", "time", "lat", "lon")),
          "land_sea_mask": Field(
              rng.randn(nlat, nlon).astype(np.float32), ("lat", "lon")),
      },
      coords={"lat": lat, "lon": lon, "level": levels,
              "time": time.astype("timedelta64[ns]"),
              "datetime": datetimes})
  return fs


def test_year_progress_boundaries():
  # Epoch start: 0 progress.
  assert era5.get_year_progress(np.array([0.0]))[0] == pytest.approx(0.0)
  # One average year later: back to ~0.
  one_year = era5.AVG_SEC_PER_YEAR
  assert era5.get_year_progress(np.array([one_year]))[0] == pytest.approx(
      0.0, abs=1e-5)
  assert era5.get_year_progress(np.array([one_year / 2]))[0] == pytest.approx(
      0.5, abs=1e-5)


def test_day_progress_longitude_phase():
  secs = np.array([0.0])  # midnight UTC
  lons = np.array([0.0, 90.0, 180.0, 270.0])
  dp = era5.get_day_progress(secs, lons)
  np.testing.assert_allclose(dp[0], [0.0, 0.25, 0.5, 0.75], atol=1e-6)
  # Half a day later at Greenwich.
  dp2 = era5.get_day_progress(np.array([43200.0]), np.array([0.0]))
  assert dp2[0, 0] == pytest.approx(0.5)


def test_add_derived_vars():
  fs = make_timeseries()
  out = era5.add_derived_vars(fs)
  for name in ("year_progress_sin", "year_progress_cos",
               "day_progress_sin", "day_progress_cos"):
    assert name in out
  assert out["day_progress_sin"].dims == ("batch", "time", "lon")
  assert out["year_progress_sin"].dims == ("batch", "time")
  s = np.asarray(out.data("day_progress_sin"))
  c = np.asarray(out.data("day_progress_cos"))
  np.testing.assert_allclose(s ** 2 + c ** 2, 1.0, atol=1e-5)
  # Existing variables not overridden.
  out2 = era5.add_derived_vars(out)
  np.testing.assert_array_equal(out2.data("day_progress_sin"), s)


def test_extract_inputs_targets_forcings():
  fs = era5.add_derived_vars(make_timeseries(nt=6))
  inputs, targets, forcings = era5.extract_inputs_targets_forcings(
      fs,
      input_variables=("2m_temperature", "temperature", "land_sea_mask",
                       "day_progress_sin"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("day_progress_sin", "day_progress_cos"),
      pressure_levels=(500, 850),
      input_duration="12h",
      target_lead_times=slice("6h", "18h"))
  assert inputs.sizes["time"] == 2
  assert targets.sizes["time"] == 3
  assert forcings.sizes["time"] == 3
  assert inputs["temperature"].sizes["level"] == 2
  # Input time coords end at 0 (lead-time convention).
  t_in = pd.to_timedelta(inputs.coords["time"])
  assert t_in[-1] == pd.Timedelta(0)
  t_tgt = pd.to_timedelta(targets.coords["time"])
  assert t_tgt[0] == pd.Timedelta("6h")
  assert t_tgt[-1] == pd.Timedelta("18h")
  # Forcings come from the target timesteps.
  assert forcings.var_names == ("day_progress_cos", "day_progress_sin")
  # Static variable kept without time dim.
  assert inputs["land_sea_mask"].dims == ("lat", "lon")


def test_single_lead_time():
  fs = make_timeseries(nt=4)
  inputs, targets = era5.extract_input_target_times(
      fs, input_duration="12h", target_lead_times="6h")
  assert targets.sizes["time"] == 1
  assert inputs.sizes["time"] == 2


def test_tisr_physical_sanity():
  """TISR: zero at night, positive in daytime, correct magnitude."""
  lat = np.array([0.0])  # equator
  lon = np.array([0.0, 180.0])
  # Midday UTC on the equinox: sun roughly over lon 0.
  tisr = solar_radiation.get_toa_incident_solar_radiation(
      [pd.Timestamp("2020-03-20 12:00")], lat, lon,
      num_integration_bins=90)
  day_side = tisr[0, 0, 0]
  night_side = tisr[0, 0, 1]
  # 1h integral of ~1361 W/m² at near-normal incidence ≈ 4.9e6 J/m².
  assert 3.5e6 < day_side < 5.1e6, day_side
  assert night_side < 1e5, night_side


def test_tisr_matches_era5_units_over_day():
  """Sum of 24 hourly integrals ≈ daily insolation at the equator (~37.8 MJ
  on equinox: S0·day/π for normal-incidence fraction)."""
  lat = np.array([0.0])
  lon = np.array([0.0])
  stamps = [pd.Timestamp("2020-03-20") + pd.Timedelta(hours=h + 1)
            for h in range(24)]
  tisr = solar_radiation.get_toa_incident_solar_radiation(
      stamps, lat, lon, num_integration_bins=60)
  total = tisr.sum()
  expected = 1361.0 * 86400 / np.pi  # ≈ 37.4 MJ
  np.testing.assert_allclose(total, expected, rtol=0.05)


def test_add_tisr_var():
  fs = make_timeseries(nt=2, nlat=5, nlon=6)
  out = era5.add_tisr_var(fs)
  assert "toa_incident_solar_radiation" in out
  assert out["toa_incident_solar_radiation"].dims == (
      "batch", "time", "lat", "lon")
  data = np.asarray(out.data("toa_incident_solar_radiation"))
  assert (data >= 0).all()
  assert data.max() > 1e5  # some daytime cell


# ---------------------------------------------------------------------------
# Golden TSI + full-grid TISR parity with the reference implementation
# (reference: solar_radiation_test.py:135-236).
# ---------------------------------------------------------------------------


def _ref_solar():
  """Imports the reference's solar_radiation (needs only a DataArray-shaped
  xarray for the TSI tables)."""
  import sys
  from tests import fake_xarray
  fake_xarray.install_if_missing()
  if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
  from graphcast import solar_radiation as ref_sr
  return ref_sr


def test_tsi_golden_mid_2020():
  tsi = solar_radiation.get_tsi(
      [np.datetime64("2020-07-02T00:00:00")], *solar_radiation.era5_tsi_data())
  np.testing.assert_allclose(tsi, [1360.9440])  # 0.9965 * 1365.7240
  tsi_ref = solar_radiation.get_tsi(
      [np.datetime64("2020-07-02T00:00:00")],
      *solar_radiation.reference_tsi_data())
  np.testing.assert_allclose(tsi_ref, [1361.0])


@pytest.mark.parametrize("timestamp,expected", [
    ("2020-01-01T00:00:00", 1000.0),   # left boundary clamp
    ("2020-07-02T00:00:00", 1000.0),   # exact
    ("2021-01-01T00:00:00", 1150.0),   # interpolated
    ("2021-07-02T12:00:00", 1300.0),
    ("2022-01-01T00:00:00", 1250.0),
    ("2022-07-02T12:00:00", 1200.0),
    ("2023-01-01T00:00:00", 1200.0),   # right boundary clamp
])
def test_tsi_interpolation_golden(timestamp, expected):
  years = np.array([2020.5, 2021.5, 2022.5])
  values = np.array([1000.0, 1300.0, 1200.0])
  tsi = solar_radiation.get_tsi([np.datetime64(timestamp)], years, values)
  np.testing.assert_allclose(tsi, [expected])


def test_tisr_matches_reference_implementation():
  """Value-level parity with the reference's own solar_radiation module on a
  coarse grid (several timestamps, era5 TSI, 1h/360-bin integration)."""
  ref_sr = _ref_solar()
  timestamps = pd.date_range(start="2023-09-25", periods=3, freq="6h")
  lat = np.linspace(-90.0, 90.0, 25)
  lon = np.linspace(0.0, 360.0, 48, endpoint=False)

  ours = solar_radiation.get_toa_incident_solar_radiation(
      timestamps, lat, lon, integration_period="1h",
      num_integration_bins=360)
  theirs = np.asarray(ref_sr.get_toa_incident_solar_radiation(
      timestamps, lat, lon, integration_period="1h",
      num_integration_bins=360, use_jit=False))
  scale = max(theirs.max(), 1.0)
  np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-5)


def test_tisr_full_spatial_resolution():
  """Full ERA5 0.25 deg grid (721x1440), one timestamp — the reference's
  full-resolution test (solar_radiation_test.py:135-176) with value checks
  instead of timing-only."""
  timestamps = [np.datetime64("2023-09-25T12:00:00")]
  lat = np.linspace(-90.0, 90.0, 721)
  lon = np.linspace(0.0, 360.0, 1440, endpoint=False)
  out = solar_radiation.get_toa_incident_solar_radiation(
      timestamps, lat, lon, integration_period="1h",
      num_integration_bins=360)
  assert out.shape == (1, 721, 1440)
  assert np.isfinite(out).all()
  assert (out >= 0.0).all()
  # Upper bound: TSI x 1h (flux can't exceed TSI / distance^2; distance ~1 AU
  # +-1.7%).
  assert out.max() <= 1361.0 * 3600.0 * 1.05
  # Near the September equinox: subsolar point near the equator; poles dim.
  equator = out[0, 360]
  assert equator.max() > 0.9 * out.max()
  # Roughly half the planet is in darkness.
  frac_dark = (out == 0.0).mean()
  assert 0.35 < frac_dark < 0.55
