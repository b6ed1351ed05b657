"""Additional wrapper-level tests: casting, nan cleaning, normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.fields import Field, FieldSet
from graphcast_tpu.wrappers import Bfloat16Cast, NaNCleaner
from graphcast_tpu.wrappers.casting import infer_floating_dtype
from graphcast_tpu.wrappers.normalization import normalize, unnormalize


def fs(arr_map, coords=None):
  return FieldSet({k: Field(jnp.asarray(v), ("batch", "lat"))
                   for k, v in arr_map.items()}, coords=coords)


def test_infer_floating_dtype():
  a = fs({"x": np.ones((1, 2), np.float32)})
  assert infer_floating_dtype(a) == jnp.float32
  mixed = FieldSet({
      "x": Field(jnp.ones((1, 2), jnp.float32), ("batch", "lat")),
      "y": Field(jnp.ones((1, 2), jnp.bfloat16), ("batch", "lat"))})
  with pytest.raises(ValueError):
    infer_floating_dtype(mixed)
  # Integer fields don't participate.
  with_int = FieldSet({
      "x": Field(jnp.ones((1, 2), jnp.float32), ("batch", "lat")),
      "m": Field(jnp.ones((1, 2), jnp.int32), ("batch", "lat"))})
  assert infer_floating_dtype(with_int) == jnp.float32


class _EchoBf16:
  """Asserts it saw bf16 inputs; returns bf16 targets-shaped output."""

  def init(self, *a, **k):
    return {}

  def __call__(self, params, rng, inputs, targets_template, forcings, **kw):
    assert infer_floating_dtype(inputs) == jnp.bfloat16
    assert infer_floating_dtype(forcings) == jnp.bfloat16
    return targets_template.map_data(
        lambda x: jnp.zeros_like(x, jnp.bfloat16))

  def loss(self, *a, **k):
    raise NotImplementedError


def test_bf16_cast_roundtrip():
  inner = _EchoBf16()
  wrapper = Bfloat16Cast(inner)
  inputs = fs({"x": np.ones((1, 2), np.float32)})
  targets = fs({"x": np.ones((1, 2), np.float32)})
  forcings = fs({"f": np.ones((1, 2), np.float32)})
  out = wrapper({}, jax.random.PRNGKey(0), inputs, targets, forcings)
  assert out["x"].dtype == jnp.float32  # cast back to target dtype


def test_normalize_unnormalize_roundtrip():
  values = fs({"x": np.random.RandomState(0).randn(2, 3).astype(np.float32)})
  scales = FieldSet({"x": Field(jnp.asarray(2.5, jnp.float32), ())})
  locations = FieldSet({"x": Field(jnp.asarray(1.0, jnp.float32), ())})
  normed = normalize(values, scales, locations)
  np.testing.assert_allclose(
      np.asarray(normed.data("x")),
      (np.asarray(values.data("x")) - 1.0) / 2.5, rtol=1e-6)
  back = unnormalize(normed, scales, locations)
  np.testing.assert_allclose(np.asarray(back.data("x")),
                             np.asarray(values.data("x")), rtol=1e-6)


def test_normalize_missing_stats_warns_and_skips(caplog):
  values = fs({"x": np.ones((1, 2), np.float32)})
  scales = FieldSet({})
  out = normalize(values, scales, None)
  np.testing.assert_array_equal(np.asarray(out.data("x")),
                                np.asarray(values.data("x")))


class _IdentityTemplate:
  def init(self, *a, **k):
    return {}

  def __call__(self, params, rng, inputs, targets_template, forcings, **kw):
    # Echo the (cleaned) input values into the prediction.
    src = inputs["sst"].isel("time", -1)
    tf = targets_template["sst"]
    data = jnp.broadcast_to(
        jnp.expand_dims(src.data, tf.dims.index("time")), tf.shape)
    return FieldSet({"sst": Field(data, tf.dims)},
                    coords=targets_template.coords)

  def loss(self, *a, **k):
    raise NotImplementedError


def test_nan_cleaner_fills_and_reintroduces():
  inner = _IdentityTemplate()
  cleaner = NaNCleaner(inner, var_to_clean="sst", fill_value=7.0)
  arr = np.ones((1, 2, 3), np.float32)  # [batch, time, lat]
  arr[0, 1, 0] = np.nan
  inputs = FieldSet({"sst": Field(jnp.asarray(arr),
                                  ("batch", "time", "lat"))})
  targets = FieldSet({"sst": Field(jnp.zeros((1, 1, 3), np.float32),
                                   ("batch", "time", "lat"))})
  forcings = FieldSet({})
  out = cleaner({}, jax.random.PRNGKey(0), inputs, targets, forcings)
  got = np.asarray(out.data("sst"))
  # NaN position reintroduced from the last input frame's mask.
  assert np.isnan(got[0, 0, 0])
  # Other positions carry the filled value (1.0, not NaN, not 7 since
  # original was 1.0 there).
  np.testing.assert_allclose(got[0, 0, 1:], 1.0)


def test_nan_cleaner_no_reintroduce():
  inner = _IdentityTemplate()
  cleaner = NaNCleaner(inner, var_to_clean="sst", fill_value=7.0,
                       reintroduce_nans=False)
  arr = np.ones((1, 1, 3), np.float32)
  arr[0, 0, 0] = np.nan
  inputs = FieldSet({"sst": Field(jnp.asarray(arr),
                                  ("batch", "time", "lat"))})
  targets = FieldSet({"sst": Field(jnp.zeros((1, 1, 3), np.float32),
                                   ("batch", "time", "lat"))})
  out = cleaner({}, jax.random.PRNGKey(0), inputs, targets, FieldSet({}))
  got = np.asarray(out.data("sst"))
  assert np.isfinite(got).all()
  np.testing.assert_allclose(got[0, 0, 0], 7.0)  # filled value propagated
