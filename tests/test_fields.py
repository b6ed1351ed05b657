"""Tests for the FieldSet container (native xarray_jax replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.fields import (
    Field, FieldSet, from_stacked, stacked_channels, to_stacked)
from graphcast_tpu import field_tree


def make_fs(batch=2, time=3, level=4, lat=5, lon=6):
  rng = np.random.RandomState(0)
  fs = FieldSet(
      {
          "temperature": Field(
              rng.randn(batch, time, level, lat, lon).astype(np.float32),
              ("batch", "time", "level", "lat", "lon")),
          "2m_temperature": Field(
              rng.randn(batch, time, lat, lon).astype(np.float32),
              ("batch", "time", "lat", "lon")),
          "land_sea_mask": Field(
              rng.randn(lat, lon).astype(np.float32), ("lat", "lon")),
      },
      coords={"lat": np.linspace(-90, 90, lat),
              "lon": np.linspace(0, 354, lon),
              "level": np.arange(level)})
  return fs


def test_sorted_var_order():
  fs = make_fs()
  assert fs.var_names == ("2m_temperature", "land_sea_mask", "temperature")


def test_sizes_and_coords():
  fs = make_fs()
  assert fs.sizes == {"batch": 2, "time": 3, "level": 4, "lat": 5, "lon": 6}
  assert fs.coords["lat"].shape == (5,)


def test_pytree_roundtrip():
  fs = make_fs()
  leaves, treedef = jax.tree_util.tree_flatten(fs)
  assert len(leaves) == 3
  fs2 = jax.tree_util.tree_unflatten(treedef, leaves)
  assert fs2.var_names == fs.var_names
  np.testing.assert_array_equal(fs2.data("temperature"),
                                fs.data("temperature"))


def test_jit_through_fieldset():
  fs = make_fs()

  @jax.jit
  def double(x: FieldSet) -> FieldSet:
    return x * 2.0

  out = double(fs)
  assert isinstance(out, FieldSet)
  np.testing.assert_allclose(out.data("temperature"),
                             fs.data("temperature") * 2, rtol=1e-6)
  assert out.coords["lat"].shape == (5,)


def test_grad_through_fieldset():
  fs = make_fs()

  def loss(x: FieldSet):
    return sum(jnp.sum(x.data(n) ** 2) for n in x.var_names)

  g = jax.grad(loss)(fs)
  np.testing.assert_allclose(np.asarray(g.data("temperature")),
                             2 * fs.data("temperature"), rtol=1e-6)


def test_isel_slices_coords():
  fs = make_fs()
  out = fs.isel(time=slice(1, 3), level=slice(0, 2))
  assert out["temperature"].sizes["time"] == 2
  assert out["temperature"].sizes["level"] == 2
  assert out.coords["level"].tolist() == [0, 1]
  # land_sea_mask has no time dim: untouched.
  assert out["land_sea_mask"].dims == ("lat", "lon")


def test_concat_time():
  fs = make_fs()
  a = fs.isel(time=slice(0, 1)).select(["temperature"])
  b = fs.isel(time=slice(1, 3)).select(["temperature"])
  out = FieldSet.concat([a, b], "time")
  np.testing.assert_array_equal(out.data("temperature"),
                                fs.data("temperature"))


def test_broadcast_binop_by_level():
  fs = make_fs().select(["temperature"])
  stats = FieldSet({"temperature": Field(
      np.arange(4, dtype=np.float32) + 1.0, ("level",))})
  out = fs / stats
  expected = fs.data("temperature") / (np.arange(4) + 1.0)[None, None, :,
                                                           None, None]
  np.testing.assert_allclose(out.data("temperature"), expected, rtol=1e-6)


def test_stacking_roundtrip_and_order():
  fs = make_fs()
  stacked = to_stacked(fs)
  # channels: 2m_temperature time=3, land_sea_mask 1, temperature 3*4=12
  assert stacked.shape == (2, 5, 6, 3 + 1 + 12)
  assert stacked_channels(fs) == 16
  # Sorted name order: 2m_temperature first.
  np.testing.assert_allclose(
      np.asarray(stacked[..., 0]), fs.data("2m_temperature")[:, 0], rtol=1e-6)
  # time-major then level for temperature block (original dim order).
  np.testing.assert_allclose(
      np.asarray(stacked[..., 4]), fs.data("temperature")[:, 0, 0], rtol=1e-6)
  np.testing.assert_allclose(
      np.asarray(stacked[..., 5]), fs.data("temperature")[:, 0, 1], rtol=1e-6)

  back = from_stacked(stacked, fs)
  for n in fs.var_names:
    np.testing.assert_allclose(np.asarray(back.data(n)), fs.data(n),
                               rtol=1e-6)


def test_stacking_wrong_channels_raises():
  fs = make_fs()
  stacked = to_stacked(fs)
  with pytest.raises(ValueError):
    from_stacked(stacked[..., :-1], fs)


def test_map_structure_drops_none():
  fs = make_fs()
  out = field_tree.map_structure(
      lambda f: None if "mask" in str(f.dims) else f, fs)
  assert isinstance(out, FieldSet)

  out2 = field_tree.map_structure(
      lambda f: Field(f.data * 0, f.dims) if len(f.dims) == 2 else None, fs)
  assert out2.var_names == ("land_sea_mask",)


def test_recompile_on_coord_change():
  fs = make_fs()
  count = 0

  @jax.jit
  def fn(x):
    nonlocal count
    count += 1
    return x * 1.0

  fn(fs)
  fn(fs)
  assert count == 1
  fn(fs.assign_coords(lat=np.linspace(-80, 80, 5)))
  assert count == 2


def test_field_broadcast_like():
  f = Field(np.ones((3,), np.float32), ("level",))
  out = f.broadcast_like(("batch", "level", "lat"), {"batch": 2, "lat": 4})
  assert out.dims == ("batch", "level", "lat")
  assert out.shape == (2, 3, 4)


def test_field_transpose_and_expand():
  f = Field(np.arange(6, dtype=np.float32).reshape(2, 3), ("a", "b"))
  t = f.transpose("b", "a")
  assert t.shape == (3, 2)
  e = f.expand_dims("c", axis=1)
  assert e.dims == ("a", "c", "b")
  with pytest.raises(ValueError):
    f.expand_dims("a")


def test_fieldset_merge_overrides():
  a = FieldSet({"x": Field(np.zeros((2,), np.float32), ("lat",))},
               coords={"lat": np.array([0.0, 1.0])})
  b = FieldSet({"x": Field(np.ones((2,), np.float32), ("lat",)),
                "y": Field(np.ones((2,), np.float32), ("lat",))})
  m = FieldSet.merge([a, b])
  assert m.var_names == ("x", "y")
  np.testing.assert_array_equal(np.asarray(m.data("x")), 1.0)
  assert "lat" in m.coords


def test_binop_variable_mismatch_raises():
  a = FieldSet({"x": Field(np.zeros((2,), np.float32), ("lat",))})
  b = FieldSet({"y": Field(np.zeros((2,), np.float32), ("lat",))})
  with pytest.raises(ValueError):
    _ = a + b


def test_xarray_bridge_gated():
  from graphcast_tpu import xarray_bridge as xb
  if not xb.HAVE_XARRAY:
    with pytest.raises(ImportError):
      xb.to_xarray(make_fs())
