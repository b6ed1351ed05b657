"""Minimal xarray stand-in for environments without xarray.

Implements exactly the API surface consumed by graphcast_tpu.xarray_bridge
and by the reference's solar_radiation/get_tsi (DataArray with .data/.dims/
.coords; Dataset with .data_vars/.coords/.assign_coords), with real-xarray
construction semantics for those paths. Tests install it as
``sys.modules["xarray"]`` only when the real package is unavailable, so the
same tests run unchanged against real xarray.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np


class Variable:
  """xarray.Variable subset used by the reference's model_utils stacking
  (model_utils.py:594-724): dims/data/sizes, stack, set_dims, isel,
  unstack, transpose, and Variable.concat.

  Semantics follow real xarray:
  - ``stack(new=[d1, d2])`` moves the listed dims to the end in the listed
    order and folds them C-order (first listed dim varies slowest).
  - ``set_dims(dims)`` (dict dim→size) adds missing dims (broadcasting to
    the given size) and transposes the result to the dict's key order.
  - ``unstack({dim: sizes})`` splits ``dim`` (which must be last-positioned
    or is moved by transpose later) into the dict's dims C-order.
  """

  def __init__(self, dims, data):
    self.dims = tuple(str(d) for d in dims)
    self.data = data
    if np.ndim(data) != len(self.dims):
      raise ValueError(f"dims {self.dims} vs ndim {np.ndim(data)}")

  @property
  def shape(self):
    return np.shape(self.data)

  @property
  def sizes(self):
    return dict(zip(self.dims, np.shape(self.data)))

  def transpose(self, *dims):
    if set(dims) != set(self.dims):
      raise ValueError(f"transpose {dims} vs {self.dims}")
    axes = tuple(self.dims.index(d) for d in dims)
    return Variable(dims, np.transpose(self.data, axes))

  def stack(self, **kwargs):
    ((new_dim, stacked_dims),) = kwargs.items()
    stacked_dims = tuple(stacked_dims)
    other = tuple(d for d in self.dims if d not in stacked_dims)
    v = self.transpose(*(other + stacked_dims))
    lead = v.shape[:len(other)]
    folded = int(np.prod(v.shape[len(other):], dtype=np.int64)) \
        if stacked_dims else 1
    return Variable(other + (new_dim,),
                    np.reshape(v.data, lead + (folded,)))

  def unstack(self, sizes_by_dim):
    ((dim, sizes),) = sizes_by_dim.items()
    sizes = dict(sizes)
    axis = self.dims.index(dim)
    v = self if axis == len(self.dims) - 1 else self.transpose(
        *(tuple(d for d in self.dims if d != dim) + (dim,)))
    lead = v.shape[:-1]
    new_dims = v.dims[:-1] + tuple(sizes)
    return Variable(new_dims,
                    np.reshape(v.data, lead + tuple(sizes.values())))

  def set_dims(self, dims, shape=None):
    if isinstance(dims, str):
      dims = {dims: None}
    missing = set(self.dims) - set(dims)
    if missing:
      raise ValueError(f"existing dims {missing} not in {tuple(dims)}")
    extra = tuple(d for d in dims if d not in self.dims)
    tmp_dims = extra + self.dims
    tmp_shape = tuple(dims[d] for d in extra) + self.shape
    data = np.broadcast_to(self.data, tmp_shape)
    return Variable(tmp_dims, data).transpose(*dims)

  def isel(self, indexers):
    idx = [slice(None)] * len(self.dims)
    for d, sel in indexers.items():
      idx[self.dims.index(d)] = sel
    return Variable(self.dims, self.data[tuple(idx)])

  @staticmethod
  def concat(variables, dim):
    variables = list(variables)
    axis = variables[0].dims.index(dim)
    return Variable(variables[0].dims,
                    np.concatenate([v.data for v in variables], axis=axis))

  def __repr__(self):
    return f"FakeVariable(dims={self.dims}, shape={self.shape})"


class DataArray:

  def __init__(self, data, dims=None, coords=None, name: Optional[str] = None):
    if isinstance(data, Variable):
      if dims is None:
        dims = data.dims
      data = data.data
    self.data = data
    if dims is None:
      dims = tuple(f"dim_{i}" for i in range(np.ndim(data)))
    self.dims = tuple(str(d) for d in dims)
    if np.ndim(data) != len(self.dims):
      raise ValueError(f"dims {self.dims} do not match data ndim "
                       f"{np.ndim(data)}")
    self.coords = _wrap_coords(coords or {})
    self.name = name

  @property
  def shape(self):
    return np.shape(self.data)

  @property
  def sizes(self):
    return dict(zip(self.dims, self.shape))

  @property
  def variable(self) -> Variable:
    return Variable(self.dims, self.data)

  def __repr__(self):
    return f"FakeDataArray(dims={self.dims}, shape={self.shape})"


def _wrap_coords(coords: Mapping[str, Any]) -> dict[str, DataArray]:
  out = {}
  for k, v in coords.items():
    k = str(k)
    if isinstance(v, DataArray):
      out[k] = v
    elif isinstance(v, tuple) and len(v) == 2:  # (dims, data) convention
      out[k] = DataArray(np.asarray(v[1]), dims=v[0])
    else:
      v = np.asarray(v)
      out[k] = DataArray(v, dims=(k,) if v.ndim == 1 else None)
  return out


class Dataset:

  def __init__(self, data_vars: Optional[Mapping[str, Any]] = None,
               coords: Optional[Mapping[str, Any]] = None):
    self.data_vars: dict[str, DataArray] = {}
    for k, v in (data_vars or {}).items():
      k = str(k)
      if isinstance(v, DataArray):
        self.data_vars[k] = v
      elif isinstance(v, tuple) and len(v) == 2:
        self.data_vars[k] = DataArray(np.asarray(v[1]), dims=v[0])
      else:
        raise TypeError(f"unsupported data_var {k}: {type(v)}")
    self.coords = _wrap_coords(coords or {})

  def assign_coords(self, **kwargs) -> "Dataset":
    new = Dataset(self.data_vars, self.coords)
    new.coords.update(_wrap_coords(kwargs))
    return new

  @property
  def variables(self) -> dict[str, Variable]:
    """Data + coordinate variables as xarray.Variable objects."""
    out = {k: v.variable for k, v in self.data_vars.items()}
    for k, v in self.coords.items():
      out.setdefault(k, v.variable)
    return out

  @property
  def sizes(self) -> dict[str, int]:
    out: dict[str, int] = {}
    for v in self.data_vars.values():
      for d, s in v.sizes.items():
        if out.setdefault(d, s) != s:
          raise ValueError(f"inconsistent size for dim {d}")
    return out

  def keys(self):
    return self.data_vars.keys()

  def __getitem__(self, name: str) -> DataArray:
    return self.data_vars[name]

  def __contains__(self, name: str) -> bool:
    return name in self.data_vars

  def __repr__(self):
    return (f"FakeDataset(vars={sorted(self.data_vars)}, "
            f"coords={sorted(self.coords)})")


def install_if_missing():
  """Registers this module as ``xarray`` when the real one is absent.

  Returns the module that ends up installed (real or fake)."""
  import sys
  try:
    import xarray  # noqa: F401
    return sys.modules["xarray"]
  except ImportError:
    pass
  import types
  mod = sys.modules.get("xarray")
  if mod is None:
    mod = types.ModuleType("xarray")
    mod.DataArray = DataArray
    mod.Dataset = Dataset
    mod.Variable = Variable
    mod.__fake__ = True
    sys.modules["xarray"] = mod
  return mod
