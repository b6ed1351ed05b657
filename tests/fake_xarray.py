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


class DataArray:

  def __init__(self, data, dims=None, coords=None, name: Optional[str] = None):
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
    mod.__fake__ = True
    sys.modules["xarray"] = mod
  return mod
