"""Evaluation metrics tests: analytic RMSE/ACC/CRPS cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu import evaluation
from graphcast_tpu.fields import Field, FieldSet

LAT = np.array([-45.0, 45.0])
LON = np.array([0.0, 90.0, 180.0, 270.0])
COORDS = {"lat": LAT, "lon": LON}


def fs(data, dims=("batch", "lat", "lon")):
  return FieldSet({"x": Field(jnp.asarray(data, jnp.float32), dims)},
                  coords=COORDS)


def test_rmse_constant_error():
  t = fs(np.zeros((1, 2, 4)))
  p = fs(np.full((1, 2, 4), 3.0))
  out = evaluation.rmse(p, t)
  np.testing.assert_allclose(float(out["x"][0]), 3.0, rtol=1e-6)


def test_rmse_latitude_weighting():
  """Error only at one latitude: weighted by that latitude's cell area."""
  t = fs(np.zeros((1, 2, 4)))
  err = np.zeros((1, 2, 4)); err[0, 0, :] = 2.0  # only lat=-45
  p = fs(err)
  from graphcast_tpu.losses import normalized_latitude_weights
  w = normalized_latitude_weights(LAT)
  expected = np.sqrt((2.0 ** 2) * w[0] / 2)
  np.testing.assert_allclose(float(evaluation.rmse(p, t)["x"][0]),
                             expected, rtol=1e-5)


def test_acc_perfect_and_anticorrelated():
  rng = np.random.RandomState(0)
  anom = rng.randn(1, 2, 4).astype(np.float32)
  clim = fs(rng.randn(1, 2, 4))
  t = fs(np.asarray(clim.data("x")) + anom)
  p_good = fs(np.asarray(clim.data("x")) + anom)
  p_bad = fs(np.asarray(clim.data("x")) - anom)
  assert float(evaluation.acc(p_good, t, clim)["x"][0]) == pytest.approx(
      1.0, abs=1e-5)
  assert float(evaluation.acc(p_bad, t, clim)["x"][0]) == pytest.approx(
      -1.0, abs=1e-5)


def test_crps_point_mass():
  """All members equal → CRPS = |x − y| (no spread term)."""
  members = fs(np.full((4, 2, 4), 1.0))
  truth = fs(np.zeros((1, 2, 4)))
  out = evaluation.crps_ensemble(members, truth)
  np.testing.assert_allclose(float(out["x"]), 1.0, rtol=1e-6)


def test_fair_crps_two_members_analytic():
  """M=2 members a,b; truth y. fair CRPS = ½(|a−y|+|b−y|) − ½|a−b|."""
  a, b, y = 1.0, -1.0, 0.25
  members = fs(np.stack([np.full((2, 4), a), np.full((2, 4), b)]))
  truth = fs(np.full((1, 2, 4), y))
  expected = 0.5 * (abs(a - y) + abs(b - y)) - 0.5 * abs(a - b)
  out = evaluation.crps_ensemble(members, truth, fair=True)
  np.testing.assert_allclose(float(out["x"]), expected, rtol=1e-6)


def test_crps_rewards_calibrated_spread():
  """Gaussian truth: a calibrated ensemble beats a collapsed one."""
  rng = np.random.RandomState(1)
  truth_val = rng.randn(1, 2, 4).astype(np.float32)
  truth = fs(truth_val)
  calibrated = fs(truth_val + rng.randn(32, 2, 4).astype(np.float32))
  collapsed = fs(np.repeat(truth_val + 1.5, 32, axis=0))
  c_cal = float(evaluation.crps_ensemble(calibrated, truth)["x"])
  c_col = float(evaluation.crps_ensemble(collapsed, truth)["x"])
  assert c_cal < c_col


def test_ensemble_mean_rmse():
  rng = np.random.RandomState(2)
  noise = rng.randn(8, 2, 4).astype(np.float32)
  noise -= noise.mean(axis=0, keepdims=True)  # exactly zero-mean members
  truth = fs(np.zeros((1, 2, 4)))
  members = fs(noise + 2.0)
  out = evaluation.ensemble_mean_rmse(members, truth)
  np.testing.assert_allclose(float(out["x"][0]), 2.0, rtol=1e-5)
