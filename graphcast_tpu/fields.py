"""Named-dimension array containers that are JAX pytrees.

``FieldSet`` is the TPU-native replacement for the reference framework's
xarray-Dataset-through-jit layer (reference: graphcast/xarray_jax.py, 810 LoC
of numpy-protocol duck-typing). Instead of teaching xarray to hold tracers, we
use a small, purpose-built container:

- A ``Field`` is an array plus a tuple of dimension names.
- A ``FieldSet`` is an ordered (sorted-by-name) mapping of variable name →
  ``Field``, plus static per-dimension coordinate arrays.
- ``FieldSet`` is registered as a pytree whose leaves are the data arrays and
  whose treedef (names, dims, coords) is static/hashable — so whole model
  steps can be ``jax.jit`` / ``grad`` / ``shard_map``-ed over FieldSets, and
  changing coords triggers recompilation exactly like the reference's
  ``_HashableCoords`` (xarray_jax.py:692-735).

Variables are kept in sorted name order so that channel stacking
(``to_stacked``) matches the reference's ``sorted(dataset.data_vars.keys())``
convention (model_utils.py:650-652) — important for checkpoint compatibility.
"""

from __future__ import annotations

import collections.abc
from typing import Any, Callable, Iterable, Mapping, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Field(NamedTuple):
  """An array with named dimensions.

  Attributes:
    data: array of shape matching ``dims``.
    dims: names for each axis of ``data``, e.g. ("batch", "time", "lat", "lon").
  """
  data: Any
  dims: tuple[str, ...]

  @property
  def shape(self):
    return tuple(self.data.shape)

  @property
  def dtype(self):
    return self.data.dtype

  @property
  def sizes(self) -> dict[str, int]:
    return dict(zip(self.dims, self.data.shape))

  def transpose(self, *dims: str) -> "Field":
    """Reorders axes by name. All of the field's dims must be given."""
    if set(dims) != set(self.dims):
      raise ValueError(f"transpose dims {dims} != field dims {self.dims}")
    perm = tuple(self.dims.index(d) for d in dims)
    return Field(jnp.transpose(self.data, perm), tuple(dims))

  def isel(self, dim: str, index) -> "Field":
    """Integer/slice selection along a named dim."""
    if dim not in self.dims:
      raise KeyError(f"dim {dim!r} not in {self.dims}")
    axis = self.dims.index(dim)
    idx = [slice(None)] * len(self.dims)
    idx[axis] = index
    data = self.data[tuple(idx)]
    if isinstance(index, int):
      dims = self.dims[:axis] + self.dims[axis + 1:]
    else:
      dims = self.dims
    return Field(data, dims)

  def expand_dims(self, dim: str, axis: int = 0) -> "Field":
    if dim in self.dims:
      raise ValueError(f"dim {dim!r} already present in {self.dims}")
    data = jnp.expand_dims(self.data, axis)
    dims = self.dims[:axis] + (dim,) + self.dims[axis:]
    return Field(data, dims)

  def broadcast_like(self, dims: tuple[str, ...],
                     sizes: Mapping[str, int]) -> "Field":
    """Broadcasts/aligns this field to the given dim order.

    ``dims`` must be a superset of this field's dims, in a compatible order.
    """
    missing = [d for d in self.dims if d not in dims]
    if missing:
      raise ValueError(f"cannot broadcast {self.dims} to {dims}: {missing}")
    # Insert length-1 axes for dims we don't have, in target order. Requires
    # our dims to appear in the same relative order as in `dims`.
    our_order = [d for d in dims if d in self.dims]
    field = self if tuple(our_order) == self.dims else self.transpose(*our_order)
    data = field.data
    shape = []
    for d in dims:
      shape.append(field.sizes.get(d, 1))
    data = jnp.reshape(data, shape)
    full_shape = tuple(
        field.sizes.get(d, sizes.get(d, 1)) for d in dims)
    data = jnp.broadcast_to(data, full_shape)
    return Field(data, tuple(dims))

  def astype(self, dtype) -> "Field":
    return Field(self.data.astype(dtype), self.dims)


class _HashableArray:
  """Wraps a numpy array to make it hashable (static jit aux data)."""

  __slots__ = ("value", "_hash")

  def __init__(self, value: np.ndarray):
    self.value = np.asarray(value)
    self.value.setflags(write=False)
    self._hash = None

  def __hash__(self):
    if self._hash is None:
      self._hash = hash(
          (self.value.shape, str(self.value.dtype), self.value.tobytes()))
    return self._hash

  def __eq__(self, other):
    if not isinstance(other, _HashableArray):
      return NotImplemented
    return (self.value.shape == other.value.shape
            and self.value.dtype == other.value.dtype
            and np.array_equal(self.value, other.value))

  def __repr__(self):
    return f"_HashableArray({self.value!r})"


def _freeze_coords(coords: Optional[Mapping[str, Any]]) -> tuple:
  if not coords:
    return ()
  out = []
  for k in sorted(coords):
    v = coords[k]
    if v is None:
      continue
    out.append((k, v if isinstance(v, _HashableArray) else _HashableArray(np.asarray(v))))
  return tuple(out)


class FieldSet(collections.abc.Mapping):
  """An ordered mapping of variable name → Field, with static coords.

  Pytree leaves are the per-variable data arrays (sorted by name); dims and
  coords are static treedef data.
  """

  __slots__ = ("_fields", "_coords")

  def __init__(self,
               fields: Mapping[str, Field] | Iterable[tuple[str, Field]] = (),
               coords: Optional[Mapping[str, Any]] = None,
               _frozen_coords: Optional[tuple] = None):
    items = dict(fields)
    for name, f in items.items():
      if not isinstance(f, Field):
        raise TypeError(f"value for {name!r} must be a Field, got {type(f)}")
      if hasattr(f.data, "ndim") and f.data.ndim != len(f.dims):
        raise ValueError(
            f"{name!r}: data ndim {f.data.ndim} != len(dims) {f.dims}")
    self._fields = {k: items[k] for k in sorted(items)}
    if _frozen_coords is not None:
      self._coords = _frozen_coords
    else:
      self._coords = _freeze_coords(coords)

  # --- Mapping protocol ---

  def __getitem__(self, name: str) -> Field:
    return self._fields[name]

  def __iter__(self):
    return iter(self._fields)

  def __len__(self):
    return len(self._fields)

  def __repr__(self):
    lines = ["FieldSet("]
    for k, f in self._fields.items():
      lines.append(f"  {k}: dims={f.dims} shape={tuple(f.data.shape)} "
                   f"dtype={f.data.dtype}")
    lines.append(f"  coords: {[k for k, _ in self._coords]}")
    lines.append(")")
    return "\n".join(lines)

  # --- accessors ---

  @property
  def var_names(self) -> tuple[str, ...]:
    return tuple(self._fields)

  def data(self, name: str):
    return self._fields[name].data

  @property
  def coords(self) -> dict[str, np.ndarray]:
    return {k: v.value for k, v in self._coords}

  @property
  def sizes(self) -> dict[str, int]:
    out: dict[str, int] = {}
    for f in self._fields.values():
      for d, s in zip(f.dims, f.data.shape):
        if d in out and out[d] != s:
          raise ValueError(f"inconsistent size for dim {d!r}: {out[d]} vs {s}")
        out[d] = s
    return out

  @property
  def dims(self) -> tuple[str, ...]:
    seen = {}
    for f in self._fields.values():
      for d in f.dims:
        seen[d] = None
    return tuple(seen)

  def dtype(self):
    dtypes = {f.data.dtype for f in self._fields.values()
              if jnp.issubdtype(f.data.dtype, jnp.floating)}
    if len(dtypes) > 1:
      raise ValueError(f"mixed floating dtypes: {dtypes}")
    return dtypes.pop() if dtypes else None

  # --- construction helpers ---

  def replace(self, **updates: Field) -> "FieldSet":
    fields = dict(self._fields)
    fields.update(updates)
    return FieldSet(fields, _frozen_coords=self._coords)

  def replace_data(self, name: str, data) -> "FieldSet":
    return self.replace(**{name: Field(data, self._fields[name].dims)})

  def select(self, names: Sequence[str]) -> "FieldSet":
    missing = [n for n in names if n not in self._fields]
    if missing:
      raise KeyError(f"variables not present: {missing}")
    return FieldSet({n: self._fields[n] for n in names},
                    _frozen_coords=self._coords)

  def drop(self, names: Sequence[str]) -> "FieldSet":
    names = set(names)
    return FieldSet({n: f for n, f in self._fields.items() if n not in names},
                    _frozen_coords=self._coords)

  def assign_coords(self, **coords) -> "FieldSet":
    merged = self.coords
    for k, v in coords.items():
      if v is None:
        merged.pop(k, None)
      else:
        merged[k] = np.asarray(v)
    return FieldSet(self._fields, coords=merged)

  def isel(self, **indexers) -> "FieldSet":
    """Index/slice along named dims; coords for those dims are sliced too."""
    fields = {}
    for name, f in self._fields.items():
      for dim, idx in indexers.items():
        if dim in f.dims:
          f = f.isel(dim, idx)
      fields[name] = f
    coords = self.coords
    for dim, idx in indexers.items():
      if dim in coords:
        c = coords[dim][idx]
        if np.ndim(c) == 0:
          del coords[dim]
        else:
          coords[dim] = c
    return FieldSet(fields, coords=coords)

  def expand_dims(self, dim: str, axis: int = 0) -> "FieldSet":
    return FieldSet({n: f.expand_dims(dim, axis)
                     for n, f in self._fields.items()},
                    _frozen_coords=self._coords)

  @staticmethod
  def concat(sets: Sequence["FieldSet"], dim: str) -> "FieldSet":
    """Concatenates FieldSets along a named dim (all must share variables)."""
    if not sets:
      raise ValueError("need at least one FieldSet")
    names = sets[0].var_names
    for fs in sets[1:]:
      if fs.var_names != names:
        raise ValueError(f"variable mismatch: {names} vs {fs.var_names}")
    fields = {}
    for n in names:
      dims = sets[0][n].dims
      axis = dims.index(dim)
      fields[n] = Field(
          jnp.concatenate([fs[n].data for fs in sets], axis=axis), dims)
    coords = sets[0].coords
    if all(dim in fs.coords for fs in sets):
      coords[dim] = np.concatenate([fs.coords[dim] for fs in sets])
    else:
      coords.pop(dim, None)
    return FieldSet(fields, coords=coords)

  @staticmethod
  def merge(sets: Sequence["FieldSet"]) -> "FieldSet":
    """Merges variable sets (later sets override earlier on name clash)."""
    fields: dict[str, Field] = {}
    coords: dict[str, np.ndarray] = {}
    for fs in sets:
      fields.update(fs._fields)  # pylint: disable=protected-access
      coords.update(fs.coords)
    return FieldSet(fields, coords=coords)

  # --- elementwise / arithmetic ---

  def map(self, fn: Callable[[str, Field], Field]) -> "FieldSet":
    return FieldSet({n: fn(n, f) for n, f in self._fields.items()},
                    _frozen_coords=self._coords)

  def map_data(self, fn: Callable[[Any], Any]) -> "FieldSet":
    return self.map(lambda n, f: Field(fn(f.data), f.dims))

  def astype(self, dtype, floating_only: bool = True) -> "FieldSet":
    def cast(data):
      if floating_only and not jnp.issubdtype(data.dtype, jnp.floating):
        return data
      return data.astype(dtype)
    return self.map_data(cast)

  def _binop(self, other, op) -> "FieldSet":
    if isinstance(other, FieldSet):
      if set(other.var_names) != set(self.var_names):
        raise ValueError(
            f"binop variable mismatch: {self.var_names} vs {other.var_names}")
      def fn(n, f):
        g = other[n]
        g_aligned = _align_for_broadcast(g, f)
        return Field(op(f.data, g_aligned), f.dims)
      return self.map(fn)
    if isinstance(other, Field):
      return self.map(
          lambda n, f: Field(op(f.data, _align_for_broadcast(other, f)), f.dims))
    return self.map(lambda n, f: Field(op(f.data, other), f.dims))

  def __add__(self, other):
    return self._binop(other, lambda a, b: a + b)

  def __sub__(self, other):
    return self._binop(other, lambda a, b: a - b)

  def __mul__(self, other):
    return self._binop(other, lambda a, b: a * b)

  def __truediv__(self, other):
    return self._binop(other, lambda a, b: a / b)

  def __pow__(self, other):
    return self._binop(other, lambda a, b: a ** b)

  def __neg__(self):
    return self.map_data(lambda a: -a)

  # --- pytree protocol ---

  def tree_flatten(self):
    names = tuple(self._fields)
    leaves = tuple(f.data for f in self._fields.values())
    dims = tuple(f.dims for f in self._fields.values())
    return leaves, (names, dims, self._coords)

  @classmethod
  def tree_unflatten(cls, aux, leaves):
    names, dims, coords = aux
    fields = {n: Field(x, d) for n, d, x in zip(names, dims, leaves)}
    obj = cls.__new__(cls)
    obj._fields = fields  # already sorted (flatten preserved sorted order)
    obj._coords = coords
    return obj


jax.tree_util.register_pytree_node(
    FieldSet,
    lambda fs: fs.tree_flatten(),
    FieldSet.tree_unflatten)


def _align_for_broadcast(src: Field, dst: Field):
  """Reshapes ``src.data`` so it broadcasts against ``dst`` by dim name.

  ``src``'s dims must be a subset of ``dst``'s, in the same relative order.
  Returns a raw array shaped for broadcasting (1s on dims src lacks).
  """
  extra = [d for d in src.dims if d not in dst.dims]
  if extra:
    raise ValueError(f"cannot broadcast {src.dims} onto {dst.dims}: "
                     f"extra dims {extra}")
  order = [d for d in dst.dims if d in src.dims]
  f = src if tuple(order) == src.dims else src.transpose(*order)
  shape = tuple(f.sizes.get(d, 1) for d in dst.dims)
  return jnp.reshape(f.data, shape)


# ---------------------------------------------------------------------------
# Stacking: FieldSet ⇄ single channel-major array.
# Mirrors reference model_utils.variable_to_stacked / dataset_to_stacked /
# stacked_to_dataset (model_utils.py:594-720): variables sorted by name,
# non-preserved dims folded (in their original order) into a trailing
# "channels" axis.
# ---------------------------------------------------------------------------

DEFAULT_PRESERVED_DIMS = ("batch", "lat", "lon")


def field_to_stacked(field: Field,
                     sizes: Mapping[str, int],
                     preserved_dims: tuple[str, ...] = DEFAULT_PRESERVED_DIMS):
  """Returns array of shape preserved_dims + (channels,)."""
  stack_dims = [d for d in field.dims if d not in preserved_dims]
  order = [d for d in preserved_dims if d in field.dims] + stack_dims
  f = field if tuple(order) == field.dims else field.transpose(*order)
  n_preserved_present = len(order) - len(stack_dims)
  channels = 1
  for d in stack_dims:
    channels *= f.sizes[d]
  data = jnp.reshape(f.data, f.data.shape[:n_preserved_present] + (channels,))
  # Broadcast in any missing preserved dims.
  full_dims = tuple(preserved_dims) + ("channels",)
  present = tuple(d for d in preserved_dims if d in field.dims) + ("channels",)
  out_field = Field(data, present).broadcast_like(
      full_dims, {**dict(sizes), "channels": channels})
  return out_field.data


def to_stacked(fs: FieldSet,
               preserved_dims: tuple[str, ...] = DEFAULT_PRESERVED_DIMS,
               sizes: Optional[Mapping[str, int]] = None):
  """FieldSet → array [*preserved_dims, total_channels], sorted var order."""
  if sizes is None:
    sizes = fs.sizes
  if not len(fs):
    raise ValueError("cannot stack an empty FieldSet")
  parts = [field_to_stacked(fs[n], sizes, preserved_dims) for n in fs.var_names]
  return jnp.concatenate(parts, axis=-1)


def stacked_channels(fs: FieldSet,
                     preserved_dims: tuple[str, ...] = DEFAULT_PRESERVED_DIMS
                     ) -> int:
  """Number of channels ``to_stacked`` would produce (static, from dims)."""
  total = 0
  for n in fs.var_names:
    c = 1
    for d, s in fs[n].sizes.items():
      if d not in preserved_dims:
        c *= s
    total += c
  return total


def from_stacked(stacked,
                 template: FieldSet,
                 preserved_dims: tuple[str, ...] = DEFAULT_PRESERVED_DIMS
                 ) -> FieldSet:
  """Inverse of ``to_stacked`` given a template FieldSet for shapes/dims."""
  expected = stacked_channels(template, preserved_dims)
  if expected != stacked.shape[-1]:
    raise ValueError(
        f"template expects {expected} channels, stacked has "
        f"{stacked.shape[-1]}")
  fields = {}
  index = 0
  for name in template.var_names:
    tf = template[name]
    stack_dims = [d for d in tf.dims if d not in preserved_dims]
    channels = 1
    for d in stack_dims:
      channels *= tf.sizes[d]
    chunk = stacked[..., index:index + channels]
    index += channels
    present_preserved = tuple(d for d in preserved_dims if d in tf.dims)
    # Drop preserved axes the template doesn't have (they must be size-1
    # broadcasts — we take index 0).
    for i, d in reversed(list(enumerate(preserved_dims))):
      if d not in tf.dims:
        chunk = jnp.take(chunk, 0, axis=i)
    shape = tuple(tf.sizes[d] for d in present_preserved) + tuple(
        tf.sizes[d] for d in stack_dims)
    data = jnp.reshape(chunk, shape)
    dims = present_preserved + tuple(stack_dims)
    f = Field(data, dims)
    if dims != tf.dims:
      f = f.transpose(*tf.dims)
    fields[name] = f
  return FieldSet(fields, coords=template.coords)
