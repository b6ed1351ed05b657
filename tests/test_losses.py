"""Loss-weighting tests, incl. the reference's analytic pole-cell check."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu import losses
from graphcast_tpu.fields import Field, FieldSet


def test_latitude_weights_without_poles_are_cosine():
  lat = np.arange(-89.0, 90.0, 2.0)  # offset grid, no poles
  w = losses.normalized_latitude_weights(lat)
  expected = np.cos(np.deg2rad(lat))
  expected /= expected.mean()
  np.testing.assert_allclose(w, expected, rtol=1e-6)


def test_pole_cell_is_eighth_of_neighbor():
  """For small spacing, pole cell area → 1/8 of the nearest non-pole cell
  (reference: losses.py:121-139 and its test)."""
  lat = np.linspace(-90, 90, 721)  # 0.25°
  w = losses.latitude_cell_area_weights(lat)
  ratio = w[0] / w[1]
  np.testing.assert_allclose(ratio, 1 / 8, rtol=1e-3)


def test_latitude_weights_sum_telescopes():
  """With poles, Σ weights telescopes exactly:
  Σ cos(lat)·sin(Δ/2) + 2·sin²(Δ/4) = sin(90−Δ/2) + (1−cos(Δ/2)) = 1."""
  lat = np.linspace(-90, 90, 181)
  w = losses.latitude_cell_area_weights(lat)
  np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)


def test_nonuniform_latitude_raises():
  with pytest.raises(ValueError):
    losses.normalized_latitude_weights(np.array([0.0, 1.0, 3.0]))


def test_level_weights_proportional():
  level = np.array([100.0, 500.0, 1000.0])
  w = losses.normalized_level_weights(level)
  np.testing.assert_allclose(w, level / level.mean(), rtol=1e-6)
  np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)


def _fs(data, dims, coords):
  return FieldSet({"x": Field(jnp.asarray(data), dims)}, coords=coords)


def test_weighted_mse_hand_computed():
  lat = np.array([-45.0, 45.0])
  lon = np.array([0.0, 180.0])
  coords = {"lat": lat, "lon": lon}
  pred = _fs(np.ones((1, 2, 2), np.float32), ("batch", "lat", "lon"), coords)
  tgt = _fs(np.zeros((1, 2, 2), np.float32), ("batch", "lat", "lon"), coords)
  total, diag = losses.weighted_mse_per_level(pred, tgt, {})
  # err² = 1 everywhere; lat weights normalized to unit mean ⇒ loss = 1.
  np.testing.assert_allclose(float(total[0]), 1.0, rtol=1e-6)
  np.testing.assert_allclose(float(diag["x"][0]), 1.0, rtol=1e-6)


def test_per_variable_weighting():
  lat = np.array([-45.0, 45.0])
  coords = {"lat": lat, "lon": np.array([0.0])}
  ones = np.ones((1, 2, 1), np.float32)
  preds = FieldSet({"a": Field(jnp.asarray(ones), ("batch", "lat", "lon")),
                    "b": Field(jnp.asarray(ones), ("batch", "lat", "lon"))},
                   coords=coords)
  tgts = preds.map_data(jnp.zeros_like)
  total, _ = losses.weighted_mse_per_level(preds, tgts, {"a": 0.5})
  np.testing.assert_allclose(float(total[0]), 0.5 + 1.0, rtol=1e-6)
  with pytest.raises(ValueError):
    losses.weighted_mse_per_level(preds, tgts, {"unknown_var": 1.0})
