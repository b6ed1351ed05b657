"""xarray ⇄ FieldSet boundary conversion.

The reference framework teaches xarray itself to hold JAX tracers
(xarray_jax.py, 810 LoC of numpy-protocol interception). TPU-first we keep
the jitted world in FieldSets (graphcast_tpu/fields.py) — a purpose-built
pytree with identical semantics (named dims, static coords, sorted-name
channel stacking) — and convert to/from xarray only at the program boundary.
This module is the boundary: it is import-gated so the core framework works
without xarray installed.

Usage:
  from graphcast_tpu import xarray_bridge as xb
  inputs = xb.from_xarray(ds_inputs)       # xarray.Dataset → FieldSet
  preds_ds = xb.to_xarray(predictions)     # FieldSet → xarray.Dataset
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from graphcast_tpu.fields import Field, FieldSet

try:
  import xarray  # type: ignore
  HAVE_XARRAY = True
except ImportError:  # pragma: no cover - depends on environment
  xarray = None
  HAVE_XARRAY = False


def _require_xarray():
  if not HAVE_XARRAY:
    raise ImportError(
        "xarray is not installed. The graphcast_tpu core works on FieldSets "
        "without it; install xarray to use the conversion boundary.")


# Dims the FieldSet layer understands; other coords are carried through.
_KNOWN_DIM_COORDS = ("batch", "time", "level", "lat", "lon")


def from_xarray(dataset: "xarray.Dataset") -> FieldSet:
  """Converts an xarray.Dataset (e.g. an ERA5 slice) to a FieldSet.

  - dim coords for (time, level, lat, lon) become static FieldSet coords;
  - a non-dim "datetime" coord (batch, time) is preserved for the derived-
    forcings pipeline;
  - variable data arrays are taken as-is (numpy or jax).
  """
  _require_xarray()
  fields = {}
  for name, var in dataset.data_vars.items():
    fields[str(name)] = Field(var.data, tuple(str(d) for d in var.dims))
  coords: dict[str, np.ndarray] = {}
  for cname, cval in dataset.coords.items():
    cname = str(cname)
    if cname == "datetime":
      data = np.asarray(cval.data)
      if data.ndim == 1:  # promote to [batch, time]
        data = data[None]
      coords["datetime"] = data
    elif cname in _KNOWN_DIM_COORDS:
      coords[cname] = np.asarray(cval.data)
  return FieldSet(fields, coords=coords)


def to_xarray(fs: FieldSet,
              extra_coords: Optional[dict[str, Any]] = None
              ) -> "xarray.Dataset":
  """Converts a FieldSet to an xarray.Dataset (device arrays → numpy)."""
  _require_xarray()
  data_vars = {}
  for name in fs.var_names:
    f = fs[name]
    data_vars[name] = xarray.DataArray(
        np.asarray(f.data), dims=f.dims)
  coords = dict(fs.coords)
  datetime = coords.pop("datetime", None)
  ds = xarray.Dataset(data_vars, coords=coords)
  if datetime is not None:
    ds = ds.assign_coords(
        datetime=xarray.DataArray(datetime, dims=("batch", "time")))
  if extra_coords:
    ds = ds.assign_coords(**extra_coords)
  return ds


def stats_from_xarray(dataset: "xarray.Dataset") -> FieldSet:
  """Converts a normalization-stats Dataset (per-variable scalars or
  per-level vectors, e.g. the published stddev_by_level.nc files)."""
  _require_xarray()
  fields = {}
  for name, var in dataset.data_vars.items():
    fields[str(name)] = Field(np.asarray(var.data),
                              tuple(str(d) for d in var.dims))
  coords = {}
  if "level" in dataset.coords:
    coords["level"] = np.asarray(dataset.coords["level"].data)
  return FieldSet(fields, coords=coords)
