"""Minimal xarray stand-in for environments without xarray.

Round 1-4 scope: exactly the API surface consumed by
graphcast_tpu.xarray_bridge and the reference's solar_radiation/get_tsi and
model_utils stacking (Variable stack/set_dims/isel/unstack/transpose/concat).

Round 5 scope (wrapper-stack / sampler / loss parity — VERDICT r4 #3/#4/#7):
enough of the xarray data model to run the reference's own
`normalization.InputsAndResiduals`, `casting.Bfloat16Cast`,
`autoregressive.Predictor`, `losses.weighted_mse_per_level` and
`dpm_solver_plus_plus_2s.Sampler` end to end under dm-haiku:

  * dim-ALIGNED arithmetic (xarray semantics: operands are matched by dim
    NAME, result dims = ordered union) on DataArray and Dataset;
  * reductions (mean/sum over named dims, skipna accepted and ignored — the
    parity tests carry no NaNs, so skipna=False == plain mean);
  * isel / tail / squeeze / expand_dims / transpose(..., Ellipsis) /
    drop_vars / rename / astype;
  * xarray.concat (existing or new dim), xarray.merge, xarray.zeros_like;
  * numpy ufunc interop on DataArray (np.cos(lat_coord) stays a DataArray,
    as the reference's latitude-weight code relies on);
  * jax pytree registration of Variable/DataArray/Dataset with hashable
    static coords (what the reference delegates to xarray_jax.py:231-290),
    so hk.scan/hk.fori_loop can carry Datasets.

Data ops dispatch to jax.numpy whenever any operand is a jax array/tracer
(the reference wrappers run under hk.transform), and to numpy otherwise
(coords stay numpy, exactly like xarray_jax keeps coords un-traced).

Tests install this as ``sys.modules["xarray"]`` only when the real package
is unavailable, so the same tests run unchanged against real xarray.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np


def _xp(*datas):
  """jax.numpy if any operand is a jax value (incl. tracers), else numpy."""
  import jax
  for d in datas:
    if isinstance(d, jax.Array) or isinstance(d, jax.core.Tracer):
      import jax.numpy as jnp
      return jnp
  return np


def _astype(data, dtype):
  return data.astype(dtype)


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
  def dtype(self):
    return self.data.dtype

  @property
  def sizes(self):
    return dict(zip(self.dims, np.shape(self.data)))

  def astype(self, dtype):
    return Variable(self.dims, _astype(self.data, dtype))

  def transpose(self, *dims):
    if set(dims) != set(self.dims):
      raise ValueError(f"transpose {dims} vs {self.dims}")
    axes = tuple(self.dims.index(d) for d in dims)
    return Variable(dims, _xp(self.data).transpose(self.data, axes))

  def stack(self, **kwargs):
    ((new_dim, stacked_dims),) = kwargs.items()
    stacked_dims = tuple(stacked_dims)
    other = tuple(d for d in self.dims if d not in stacked_dims)
    v = self.transpose(*(other + stacked_dims))
    lead = v.shape[:len(other)]
    folded = int(np.prod(v.shape[len(other):], dtype=np.int64)) \
        if stacked_dims else 1
    return Variable(other + (new_dim,),
                    _xp(v.data).reshape(v.data, lead + (folded,)))

  def unstack(self, sizes_by_dim):
    ((dim, sizes),) = sizes_by_dim.items()
    sizes = dict(sizes)
    axis = self.dims.index(dim)
    v = self if axis == len(self.dims) - 1 else self.transpose(
        *(tuple(d for d in self.dims if d != dim) + (dim,)))
    lead = v.shape[:-1]
    new_dims = v.dims[:-1] + tuple(sizes)
    return Variable(new_dims,
                    _xp(v.data).reshape(v.data, lead + tuple(sizes.values())))

  def set_dims(self, dims, shape=None):
    if isinstance(dims, str):
      dims = {dims: None}
    missing = set(self.dims) - set(dims)
    if missing:
      raise ValueError(f"existing dims {missing} not in {tuple(dims)}")
    extra = tuple(d for d in dims if d not in self.dims)
    tmp_dims = extra + self.dims
    tmp_shape = tuple(dims[d] for d in extra) + self.shape
    data = _xp(self.data).broadcast_to(self.data, tmp_shape)
    return Variable(tmp_dims, data).transpose(*dims)

  def isel(self, indexers):
    idx = [slice(None)] * len(self.dims)
    new_dims = list(self.dims)
    for d, sel in indexers.items():
      idx[self.dims.index(d)] = sel
      if isinstance(sel, (int, np.integer)):
        new_dims.remove(d)
    return Variable(new_dims, self.data[tuple(idx)])

  @staticmethod
  def concat(variables, dim):
    variables = list(variables)
    axis = variables[0].dims.index(dim)
    datas = [v.data for v in variables]
    return Variable(variables[0].dims,
                    _xp(*datas).concatenate(datas, axis=axis))

  def __repr__(self):
    return f"FakeVariable(dims={self.dims}, shape={self.shape})"


def _align(dims_a, data_a, dims_b, data_b):
  """xarray binary-op alignment: result dims = dims_a ++ (dims_b − dims_a);
  both operands transposed/size-1-expanded to the union order."""
  out_dims = tuple(dims_a) + tuple(d for d in dims_b if d not in dims_a)

  def expand(dims, data):
    if np.ndim(data) == 0 and not isinstance(data, np.ndarray):
      # Python scalar (or 0-d jax weak-typed value): leave it alone so
      # jnp's weak-type promotion applies (bf16 * 0.1 stays bf16, as it
      # does through real xarray's ufunc dispatch on jax duck arrays).
      return data
    xp = _xp(data)
    missing = tuple(d for d in out_dims if d not in dims)
    data = xp.reshape(data, (1,) * len(missing) + tuple(np.shape(data)))
    cur = missing + tuple(dims)
    perm = tuple(cur.index(d) for d in out_dims)
    return xp.transpose(data, perm)

  return out_dims, expand(dims_a, data_a), expand(dims_b, data_b)


def _operand(other):
  """(dims, data, coords) of a binary-op operand."""
  if isinstance(other, DataArray):
    return other.dims, other.data, other.coords
  if isinstance(other, Variable):
    return other.dims, other.data, {}
  if np.ndim(other) == 0:
    return (), other, {}
  raise TypeError(f"unsupported operand {type(other)} (ndim > 0 raw array)")


def _merge_coords(coords_list, out_dims):
  out = {}
  for coords in coords_list:
    for k, v in coords.items():
      if k not in out and all(d in out_dims for d in v.dims):
        out[k] = v
  return out


class DataArray:

  def __init__(self, data, dims=None, coords=None, name: Optional[str] = None):
    if isinstance(data, Variable):
      if dims is None:
        dims = data.dims
      data = data.data
    if isinstance(data, DataArray):
      if dims is None:
        dims = data.dims
      if coords is None:
        coords = data.coords
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
  def dtype(self):
    return self.data.dtype

  @property
  def sizes(self):
    return dict(zip(self.dims, self.shape))

  @property
  def variable(self) -> Variable:
    return Variable(self.dims, self.data)

  @property
  def values(self):
    return np.asarray(self.data)

  def astype(self, dtype):
    return DataArray(_astype(self.data, dtype), self.dims, self.coords,
                     self.name)

  def rename(self, name):
    return DataArray(self.data, self.dims, self.coords, name)

  # -- indexing ---------------------------------------------------------

  def isel(self, indexers=None, drop=False, **kwargs):
    indexers = dict(indexers or {}, **kwargs)
    idx = [slice(None)] * len(self.dims)
    dropped = set()
    for d, sel in indexers.items():
      idx[self.dims.index(d)] = sel
      if isinstance(sel, (int, np.integer)):
        dropped.add(d)
    new_dims = tuple(d for d in self.dims if d not in dropped)
    coords = {}
    for k, v in self.coords.items():
      if any(d in dropped for d in v.dims):
        continue  # removed-dim coords are dropped (scalar coords unsupported)
      sub = {d: indexers[d] for d in v.dims if d in indexers}
      coords[k] = v.isel(sub) if sub else v
    return DataArray(self.data[tuple(idx)], new_dims, coords, self.name)

  def __getitem__(self, key):
    """Positional indexing on the leading dim (coords['time'][:1] usage)."""
    if isinstance(key, dict):
      return self.isel(key)
    sel = {self.dims[0]: key}
    return self.isel(sel)

  def __setitem__(self, key, value):
    self.data = np.asarray(self.data).copy()
    self.data[key] = value

  # -- shape ops --------------------------------------------------------

  def transpose(self, *dims):
    if not dims:
      dims = tuple(reversed(self.dims))
    if Ellipsis in dims:
      named = tuple(d for d in dims if d is not Ellipsis)
      rest = tuple(d for d in self.dims if d not in named)
      i = dims.index(Ellipsis)
      dims = dims[:i] + rest + dims[i + 1:]
    dims = tuple(d for d in dims if d in self.dims)
    axes = tuple(self.dims.index(d) for d in dims)
    return DataArray(_xp(self.data).transpose(self.data, axes), dims,
                     self.coords, self.name)

  def expand_dims(self, dim=None, axis=0, **dim_kwargs):
    if dim is None:
      dim = dim_kwargs
    elif isinstance(dim, str):
      dim = {dim: 1}
    new = DataArray(self.data, self.dims, self.coords, self.name)
    for d, val in dim.items():
      coord_vals = None
      if isinstance(val, (int, np.integer)):
        size = int(val)
      else:
        coord_vals = val.data if isinstance(val, DataArray) else np.asarray(
            val)
        size = np.shape(coord_vals)[0]
      xp = _xp(new.data)
      data = xp.broadcast_to(xp.expand_dims(new.data, 0),
                             (size,) + tuple(np.shape(new.data)))
      dims = (d,) + new.dims
      coords = dict(new.coords)
      if coord_vals is not None:
        coords[d] = DataArray(coord_vals, (d,))
      new = DataArray(data, dims, coords, new.name)
      if axis not in (0, None):
        order = list(new.dims[1:])
        order.insert(axis, d)
        new = new.transpose(*order)
    return new

  def squeeze(self, dim=None, drop=False):
    dims = [dim] if isinstance(dim, str) else (
        dim or [d for d, s in self.sizes.items() if s == 1])
    return self.isel({d: 0 for d in dims}, drop=drop)

  # -- reductions -------------------------------------------------------

  def _reduce(self, fn_name, dim=None, skipna=None):
    del skipna  # no-NaN data: skipna=False == plain reduction
    if dim is None:
      dims = self.dims
    elif isinstance(dim, str):
      dims = (dim,)
    else:
      dims = tuple(dim)
    axes = tuple(self.dims.index(d) for d in dims)
    xp = _xp(self.data)
    data = getattr(xp, fn_name)(self.data, axis=axes)
    new_dims = tuple(d for d in self.dims if d not in dims)
    coords = {k: v for k, v in self.coords.items()
              if all(d not in dims for d in v.dims)}
    return DataArray(data, new_dims, coords, self.name)

  def mean(self, dim=None, skipna=None):
    return self._reduce("mean", dim, skipna)

  def sum(self, dim=None, skipna=None):
    return self._reduce("sum", dim, skipna)

  # -- arithmetic (dim-aligned, xarray semantics) -------------------------

  def _binop(self, other, op, reflexive=False):
    dims_b, data_b, coords_b = _operand(other)
    a, b = (data_b, self.data) if reflexive else (self.data, data_b)
    da, db = (dims_b, self.dims) if reflexive else (self.dims, dims_b)
    out_dims, xa, xb = _align(da, a, db, b)
    xp = _xp(xa, xb)
    data = op(xp, xa, xb)
    coords = _merge_coords([self.coords, coords_b], out_dims)
    name = self.name if (not isinstance(other, DataArray)
                         or other.name == self.name) else None
    return DataArray(data, out_dims, coords, name)

  def __add__(self, o):
    return self._binop(o, lambda xp, a, b: xp.add(a, b))

  __radd__ = __add__

  def __sub__(self, o):
    return self._binop(o, lambda xp, a, b: xp.subtract(a, b))

  def __rsub__(self, o):
    return self._binop(o, lambda xp, a, b: xp.subtract(a, b), reflexive=True)

  def __mul__(self, o):
    return self._binop(o, lambda xp, a, b: xp.multiply(a, b))

  __rmul__ = __mul__

  def __truediv__(self, o):
    return self._binop(o, lambda xp, a, b: xp.divide(a, b))

  def __rtruediv__(self, o):
    return self._binop(o, lambda xp, a, b: xp.divide(a, b), reflexive=True)

  def __pow__(self, o):
    return self._binop(o, lambda xp, a, b: xp.power(a, b))

  def __neg__(self):
    return DataArray(-self.data, self.dims, self.coords, self.name)

  # -- numpy interop ------------------------------------------------------

  def __array__(self, dtype=None):
    out = np.asarray(self.data)
    return out.astype(dtype) if dtype is not None else out

  def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
    """np.cos/np.deg2rad/... on a DataArray stay DataArrays (the reference's
    latitude-weight code multiplies the result back against dim-ful data).
    Reductions (np.max/np.min/...) fall back to plain numpy scalars."""
    if method != "__call__" or kwargs:
      vals = [np.asarray(x.data) if isinstance(x, DataArray) else x
              for x in inputs]
      return getattr(ufunc, method)(*vals, **kwargs)
    dims = None
    coords = {}
    vals = []
    for x in inputs:
      if isinstance(x, DataArray):
        if dims is not None and dims != x.dims:
          return NotImplemented
        dims, coords = x.dims, x.coords
        vals.append(x.data)
      elif np.ndim(x) == 0:
        vals.append(x)
      else:
        return NotImplemented
    return DataArray(ufunc(*vals), dims, coords, self.name)

  def __repr__(self):
    return f"FakeDataArray(dims={self.dims}, shape={self.shape})"


def _wrap_coords(coords: Mapping[str, Any]) -> dict[str, DataArray]:
  out = {}
  for k, v in coords.items():
    k = str(k)
    if isinstance(v, DataArray):
      out[k] = DataArray(v.data, v.dims, None, k)
    elif isinstance(v, tuple) and len(v) == 2:  # (dims, data) convention
      out[k] = DataArray(np.asarray(v[1]), dims=v[0], name=k)
    else:
      v = np.asarray(v)
      out[k] = DataArray(v, dims=(k,) if v.ndim == 1 else None, name=k)
  return out


class Dataset:
  """Data variables (coords stripped; attached on __getitem__) + dataset
  coords — the xarray model where coords live on the dataset and views of
  the variables carry the coords relevant to their dims."""

  def __init__(self, data_vars: Optional[Mapping[str, Any]] = None,
               coords: Optional[Mapping[str, Any]] = None):
    self.data_vars: dict[str, DataArray] = {}
    coords = dict(coords or {})
    for k, v in (data_vars or {}).items():
      k = str(k)
      if isinstance(v, DataArray):
        for ck, cv in v.coords.items():
          coords.setdefault(ck, cv)
        self.data_vars[k] = DataArray(v.data, v.dims, None, k)
      elif isinstance(v, Variable):
        self.data_vars[k] = DataArray(v.data, v.dims, None, k)
      elif isinstance(v, tuple) and len(v) == 2:
        self.data_vars[k] = DataArray(np.asarray(v[1]), dims=v[0], name=k)
      else:
        raise TypeError(f"unsupported data_var {k}: {type(v)}")
    self.coords = _wrap_coords(coords)

  def assign_coords(self, coords=None, **kwargs) -> "Dataset":
    new = Dataset(self.data_vars, self.coords)
    new.coords.update(_wrap_coords(dict(coords or {}, **kwargs)))
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

  @property
  def dims(self) -> dict[str, int]:
    return self.sizes

  def keys(self):
    return self.data_vars.keys()

  def items(self):
    return {k: self[k] for k in self.data_vars}.items()

  def values(self):
    return [self[k] for k in self.data_vars]

  def __iter__(self):
    return iter(self.data_vars)

  def __len__(self):
    return len(self.data_vars)

  def __getitem__(self, name):
    if isinstance(name, (list, tuple, set)):
      return Dataset({k: self.data_vars[k] for k in name}, self.coords)
    v = self.data_vars[name]
    coords = {k: c for k, c in self.coords.items()
              if all(d in v.dims for d in c.dims)}
    return DataArray(v.data, v.dims, coords, name)

  def __contains__(self, name: str) -> bool:
    return name in self.data_vars

  # -- structural ops ----------------------------------------------------

  def _map_vars(self, fn, coords=None) -> "Dataset":
    return Dataset({k: fn(v) for k, v in self.data_vars.items()},
                   self.coords if coords is None else coords)

  def map(self, fn) -> "Dataset":
    return Dataset({k: fn(self[k]) for k in self.data_vars}, self.coords)

  def astype(self, dtype) -> "Dataset":
    return self._map_vars(lambda v: v.astype(dtype))

  def drop_vars(self, names, errors="raise") -> "Dataset":
    if isinstance(names, str):
      names = [names]
    names = set(names)
    missing = names - set(self.data_vars)
    if missing and errors != "ignore":
      raise KeyError(f"missing variables {missing}")
    return Dataset({k: v for k, v in self.data_vars.items()
                    if k not in names}, self.coords)

  def isel(self, indexers=None, drop=False, **kwargs) -> "Dataset":
    indexers = dict(indexers or {}, **kwargs)
    out_vars = {}
    for k, v in self.data_vars.items():
      sub = {d: s for d, s in indexers.items() if d in v.dims}
      out_vars[k] = v.isel(sub, drop=drop) if sub else v
    dropped = {d for d, s in indexers.items()
               if isinstance(s, (int, np.integer))}
    coords = {}
    for k, v in self.coords.items():
      if any(d in dropped for d in v.dims):
        continue
      sub = {d: s for d, s in indexers.items() if d in v.dims}
      coords[k] = v.isel(sub) if sub else v
    return Dataset(out_vars, coords)

  def tail(self, indexers=None, **kwargs) -> "Dataset":
    indexers = dict(indexers or {}, **kwargs)
    return self.isel({d: slice(-int(n), None) for d, n in indexers.items()})

  def squeeze(self, dim=None, drop=False) -> "Dataset":
    dims = [dim] if isinstance(dim, str) else (
        dim or [d for d, s in self.sizes.items() if s == 1])
    return self.isel({d: 0 for d in dims}, drop=drop)

  def expand_dims(self, dim=None, axis=0, **dim_kwargs) -> "Dataset":
    if dim is None:
      dim = dim_kwargs
    elif isinstance(dim, str):
      dim = {dim: 1}
    new = self
    for d, val in dim.items():
      out_vars = {k: v.expand_dims({d: val}, axis=axis)
                  for k, v in new.data_vars.items()}
      coords = dict(new.coords)
      if not isinstance(val, (int, np.integer)):
        cv = val.data if isinstance(val, DataArray) else np.asarray(val)
        coords[d] = DataArray(cv, (d,))
      new = Dataset(out_vars, coords)
    return new

  def transpose(self, *dims) -> "Dataset":
    return self._map_vars(lambda v: v.transpose(*dims))

  # -- arithmetic ----------------------------------------------------------

  def _binop(self, other, opname) -> "Dataset":
    if isinstance(other, Dataset):
      if set(other.data_vars) != set(self.data_vars):
        raise ValueError("Dataset binop with mismatched variables")
      return Dataset(
          {k: getattr(self[k], opname)(other[k]) for k in self.data_vars},
          self.coords)
    return Dataset({k: getattr(self[k], opname)(other)
                    for k in self.data_vars}, self.coords)

  def __add__(self, o):
    return self._binop(o, "__add__")

  __radd__ = __add__

  def __sub__(self, o):
    return self._binop(o, "__sub__")

  def __mul__(self, o):
    return self._binop(o, "__mul__")

  __rmul__ = __mul__

  def __truediv__(self, o):
    return self._binop(o, "__truediv__")

  def __pow__(self, o):
    return self._binop(o, "__pow__")

  def __repr__(self):
    return (f"FakeDataset(vars={sorted(self.data_vars)}, "
            f"coords={sorted(self.coords)})")


# ---------------------------------------------------------------------------
# Module-level functions (xarray.concat / merge / zeros_like).
# ---------------------------------------------------------------------------


def concat(objs, dim, join=None, **kwargs):
  del join, kwargs
  objs = list(objs)
  if isinstance(objs[0], Dataset):
    first = objs[0]
    out_vars = {}
    for k in first.data_vars:
      # Align later operands to the first's dim order (xarray concatenates
      # by NAME: a (time, batch, ...) frame concats onto (batch, time, ...)).
      vs = [o.data_vars[k].transpose(*first.data_vars[k].dims) for o in objs]
      datas = [v.data for v in vs]
      axis = vs[0].dims.index(dim)
      out_vars[k] = DataArray(_xp(*datas).concatenate(datas, axis=axis),
                              vs[0].dims, None, k)
    coords = dict(first.coords)
    if all(dim in o.coords for o in objs):
      cs = [np.asarray(o.coords[dim].data) for o in objs]
      coords[dim] = DataArray(np.concatenate(cs), (dim,))
    return Dataset(out_vars, coords)
  # DataArrays.
  first = objs[0]
  if dim in first.dims:
    datas = [o.transpose(*first.dims).data for o in objs]
    axis = first.dims.index(dim)
    data = _xp(*datas).concatenate(datas, axis=axis)
    coords = {k: v for k, v in first.coords.items() if dim not in v.dims}
    return DataArray(data, first.dims, coords, first.name)
  # New dim: stack along a new leading axis (xarray places new dims first).
  datas, out_dims = [], (dim,) + first.dims
  for o in objs:
    dims_o, data_o, _ = _operand(o)
    _, _, x = _align(first.dims, first.data, dims_o, data_o)
    datas.append(x)
  data = _xp(*datas).stack(datas, axis=0)
  coords = dict(first.coords)
  return DataArray(data, out_dims, coords, first.name)


def merge(objs, join=None, compat=None, **kwargs):
  del join, compat, kwargs
  out_vars: dict[str, DataArray] = {}
  coords: dict[str, DataArray] = {}
  for o in objs:
    if isinstance(o, Dataset):
      for k, v in o.data_vars.items():
        if k in out_vars:
          raise ValueError(f"merge conflict on variable {k}")
        out_vars[k] = v
      for k, v in o.coords.items():
        coords.setdefault(k, v)
    elif isinstance(o, DataArray):
      if o.name is None:
        raise ValueError("cannot merge unnamed DataArray")
      if o.name in out_vars:
        raise ValueError(f"merge conflict on variable {o.name}")
      out_vars[o.name] = o
      for k, v in o.coords.items():
        coords.setdefault(k, v)
    elif isinstance(o, Mapping):
      for k, v in o.items():
        if k in out_vars:
          raise ValueError(f"merge conflict on variable {k}")
        out_vars[k] = v
    else:
      raise TypeError(f"cannot merge {type(o)}")
  return Dataset(out_vars, coords)


def zeros_like(obj):
  import jax.numpy as jnp
  if isinstance(obj, Dataset):
    return Dataset({k: DataArray(jnp.zeros_like(v.data), v.dims, None, k)
                    for k, v in obj.data_vars.items()}, obj.coords)
  return DataArray(jnp.zeros_like(obj.data), obj.dims, obj.coords, obj.name)


# ---------------------------------------------------------------------------
# jax pytree registration (what the reference's xarray_jax.py provides for
# real xarray). Leaves are the raw data arrays; dims/coords/names are static
# aux data with value-based hash/eq so scan/fori_loop treedefs compare equal
# across iterations.
# ---------------------------------------------------------------------------


class _HashableCoords:
  """Static, hashable snapshot of a coords dict (coords stay numpy)."""

  def __init__(self, coords: Mapping[str, DataArray]):
    self._coords = {k: v for k, v in coords.items()}
    self._key = tuple(sorted(
        (k, v.dims, str(np.asarray(v.data).dtype),
         np.asarray(v.data).tobytes())
        for k, v in coords.items()))

  @property
  def dict(self):
    return self._coords

  def __hash__(self):
    return hash(self._key)

  def __eq__(self, other):
    return isinstance(other, _HashableCoords) and self._key == other._key


def _flatten_variable(v):
  return (v.data,), v.dims


def _unflatten_variable(aux, children):
  v = object.__new__(Variable)
  v.dims = aux
  v.data = children[0]
  return v


def _flatten_dataarray(d):
  return (d.data,), (d.dims, _HashableCoords(d.coords), d.name)


def _unflatten_dataarray(aux, children):
  dims, coords, name = aux
  d = object.__new__(DataArray)
  d.data = children[0]
  d.dims = dims
  d.coords = coords.dict
  d.name = name
  return d


def _flatten_dataset(ds):
  names = tuple(sorted(ds.data_vars))
  children = tuple(ds.data_vars[k].data for k in names)
  dims = tuple(ds.data_vars[k].dims for k in names)
  return children, (names, dims, _HashableCoords(ds.coords))


def _unflatten_dataset(aux, children):
  names, dims, coords = aux
  ds = object.__new__(Dataset)
  ds.data_vars = {}
  for k, dd, data in zip(names, dims, children):
    v = object.__new__(DataArray)
    v.data, v.dims, v.coords, v.name = data, dd, {}, k
    ds.data_vars[k] = v
  ds.coords = coords.dict
  return ds


def _register_pytrees():
  import jax
  try:
    jax.tree_util.register_pytree_node(
        Variable, _flatten_variable, _unflatten_variable)
    jax.tree_util.register_pytree_node(
        DataArray, _flatten_dataarray, _unflatten_dataarray)
    jax.tree_util.register_pytree_node(
        Dataset, _flatten_dataset, _unflatten_dataset)
  except ValueError:
    pass  # already registered (module reimport)


_register_pytrees()


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
    mod.concat = concat
    mod.merge = merge
    mod.zeros_like = zeros_like
    mod.__fake__ = True
    sys.modules["xarray"] = mod
  return mod


def install_reference_xarray_jax():
  """Installs a functional ``graphcast.xarray_jax`` shim backed by this fake
  xarray (the reference module wraps REAL xarray types in jax-aware
  containers, xarray_jax.py:60-140; here data is stored raw, so unwrap is
  near-trivial). Returns the module."""
  import sys
  import types
  name = "graphcast.xarray_jax"
  mod = sys.modules.get(name)
  if mod is not None and getattr(mod, "__functional_fake__", False):
    return mod
  mod = types.ModuleType(name)

  def unwrap(value, require_jax=False):
    if isinstance(value, (DataArray, Variable)):
      return value.data
    return value

  def unwrap_data(value, require_jax=False):
    return value.data

  mod.DataArray = DataArray
  mod.Variable = Variable
  mod.Dataset = Dataset
  mod.unwrap = unwrap
  mod.unwrap_data = unwrap_data
  mod.jax_data = unwrap_data
  mod.__functional_fake__ = True
  sys.modules[name] = mod
  pkg = sys.modules.get("graphcast")
  if pkg is not None:
    pkg.xarray_jax = mod
  return mod
