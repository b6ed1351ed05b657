"""Device-mesh parallelism over ICI (replaces the reference's pmap path).

The reference parallelizes over ensemble members / batch with ``jax.pmap``
(xarray_jax.py:535-605, rollout.py:78-202). TPU-first, we instead express
data/ensemble parallelism with ``jax.sharding``: build a Mesh, annotate the
batch/sample dim of every field with a NamedSharding, and let XLA's SPMD
partitioner insert the (ICI) collectives. The same jitted step runs on 1 or
N chips; cross-replica loss/grad averaging falls out of global-mean
semantics under jit (the reference's contract at predictor_base.py:118-120).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphcast_tpu.fields import FieldSet


def make_mesh(axis_sizes: Optional[dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
  """Builds a Mesh; default: all devices on one "batch" axis."""
  if devices is None:
    devices = jax.devices()
  if axis_sizes is None:
    axis_sizes = {"batch": len(devices)}
  names = tuple(axis_sizes)
  sizes = tuple(axis_sizes.values())
  if int(np.prod(sizes)) != len(devices):
    raise ValueError(f"mesh {axis_sizes} needs {np.prod(sizes)} devices, "
                     f"have {len(devices)}")
  dev_array = np.asarray(devices).reshape(sizes)
  return Mesh(dev_array, names)


def make_hybrid_mesh(axis_sizes: dict[str, int],
                     dcn_axes: Optional[dict[str, int]] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
  """Multi-slice Mesh: per-axis ICI×DCN factors (scaling past one pod slice).

  ``axis_sizes`` gives each logical axis's TOTAL size; ``dcn_axes`` the
  factor of that size carried over DCN (the slow cross-slice network) —
  the rest rides ICI within a slice. Only weak-scaling axes (data/ensemble,
  one gradient/loss all-reduce per step) belong on DCN; keep tp/sp axes
  ICI-only. Mirrors the reference's implicit single-network pmap
  (rollout.py:78-202) while extending it across slices.

  On real multi-slice TPU (devices expose ``slice_index``) this delegates to
  ``mesh_utils.create_hybrid_device_mesh``. Elsewhere (CPU test meshes,
  single slice) it emulates the same dcn-major block arrangement: device
  index along an axis = dcn_coord * ici_size + ici_coord.
  """
  if devices is None:
    devices = jax.devices()
  dcn_axes = dict(dcn_axes or {})
  if unknown := set(dcn_axes) - set(axis_sizes):
    raise ValueError(f"dcn_axes {unknown} not in axis_sizes {set(axis_sizes)}")
  names = tuple(axis_sizes)
  dcn_shape = tuple(dcn_axes.get(n, 1) for n in names)
  ici_shape = []
  for n in names:
    total, dcn = axis_sizes[n], dcn_axes.get(n, 1)
    if total % dcn:
      raise ValueError(f"axis {n}: size {total} not divisible by DCN "
                       f"factor {dcn}")
    ici_shape.append(total // dcn)
  ici_shape = tuple(ici_shape)
  n_dcn = int(np.prod(dcn_shape))
  n_ici = int(np.prod(ici_shape))
  if n_dcn * n_ici != len(devices):
    raise ValueError(f"mesh {axis_sizes} needs {n_dcn * n_ici} devices, "
                     f"have {len(devices)}")
  slice_ids = {getattr(d, "slice_index", None) for d in devices}
  if None not in slice_ids and len(slice_ids) > 1:
    # Real multi-slice hardware: the dcn factorization MUST match the
    # physical slice count, else ICI axes would silently span DCN links
    # (the exact topology error this function exists to prevent).
    if len(slice_ids) != n_dcn:
      raise ValueError(
          f"devices span {len(slice_ids)} slices but dcn_axes {dcn_axes} "
          f"give a total DCN factor of {n_dcn}; set dcn_axes so their "
          "product equals the slice count (ICI axes must not cross DCN)")
    from jax.experimental import mesh_utils
    dev_array = mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices)
  else:
    # Emulate create_hybrid_device_mesh's np.block arrangement with
    # contiguous device chunks as granules ("slices").
    granules = [np.asarray(devices[i * n_ici:(i + 1) * n_ici]
                           ).reshape(ici_shape) for i in range(n_dcn)]
    granule_mesh = np.arange(n_dcn).reshape(dcn_shape)
    blocks = np.vectorize(lambda i: granules[i], otypes=[object])(
        granule_mesh)
    dev_array = np.block(blocks.tolist())
  return Mesh(dev_array, names)


def fieldset_sharding(fs: FieldSet, mesh: Mesh,
                      dim_to_axis: Optional[dict[str, str]] = None):
  """A pytree of NamedShardings for `fs`: each named dim in `dim_to_axis`
  is sharded over the corresponding mesh axis; all else replicated."""
  if dim_to_axis is None:
    dim_to_axis = {"batch": "batch"}
  leaves, treedef = jax.tree_util.tree_flatten(fs)
  names = fs.var_names
  specs = []
  for name in names:
    dims = fs[name].dims
    spec = tuple(dim_to_axis.get(d) for d in dims)
    specs.append(NamedSharding(mesh, P(*spec)))
  assert len(specs) == len(leaves)
  return jax.tree_util.tree_unflatten(treedef, specs)


def shard_fieldsets(mesh: Mesh, *fieldsets: FieldSet,
                    dim_to_axis: Optional[dict[str, str]] = None):
  """device_puts FieldSets with their batch dims sharded over the mesh."""
  out = []
  for fs in fieldsets:
    sharding = fieldset_sharding(fs, mesh, dim_to_axis)
    out.append(jax.device_put(fs, sharding))
  return out if len(out) > 1 else out[0]


def replicate(tree, mesh: Mesh):
  """Fully replicates a pytree (e.g. params) across the mesh."""
  sharding = NamedSharding(mesh, P())
  return jax.device_put(tree, sharding)


def shard_params_tensor_parallel(params, mesh: Mesh,
                                 model_axis: str = "model"):
  """Tensor-parallel parameter sharding over the mesh's model axis.

  Megatron-style PAIRED sharding: within every 2-layer MLP the first linear
  is column-parallel (hidden dim sharded over ``model_axis``) and the second
  row-parallel, so the MLP's hidden activations shard over the model axis
  but its OUTPUT — and therefore every node table consumed by the edge
  gathers — stays replicated there. SPMD then inserts exactly one
  reduce(-scatter)/psum per MLP and the AD-generated gathers never touch a
  model-sharded table (round-2's "[SPMD] Involuntary full rematerialization"
  warnings came from sharding every weight column-wise). Transformer
  ffw_up/ffw_down and mha projections/final pair the same way. LayerNorms,
  norm-conditioning layers, deeper MLPs, and graph statics replicate.
  """
  size = mesh.shape[model_axis]
  col = NamedSharding(mesh, P(None, model_axis))
  row = NamedSharding(mesh, P(model_axis, None))
  vec = NamedSharding(mesh, P(model_axis))
  rep = NamedSharding(mesh, P())

  def shard_linear(linear: dict, mode: str) -> dict:
    out = {}
    for name, x in linear.items():
      if mode == "col" and name == "w":
        out[name] = col
      elif mode == "col" and name == "b":
        out[name] = vec
      elif mode == "row" and name == "w":
        out[name] = row
      else:  # row-parallel bias (added after the psum) and anything else
        out[name] = rep
    return out

  def hidden_ok(n: int) -> bool:
    return n % size == 0 and n >= size * 8

  COL_NAMES = ("ffw_up", "mha_proj_q", "mha_proj_k", "mha_proj_v")
  ROW_NAMES = ("ffw_down", "mha_final")

  def assign(tree):
    if not isinstance(tree, dict):
      return rep
    linears = sorted(
        (k for k in tree if k.startswith("linear_")
         and isinstance(tree.get(k), dict) and "w" in tree[k]),
        key=lambda s: int(s.split("_")[-1]))
    pair = None
    if len(linears) == 2:
      w0, w1 = tree[linears[0]]["w"], tree[linears[1]]["w"]
      if (w0.ndim == 2 and w1.ndim == 2 and w0.shape[-1] == w1.shape[0]
          and hidden_ok(w0.shape[-1])):
        pair = (linears[0], linears[1])
    out = {}
    for k, v in tree.items():
      if pair and k == pair[0]:
        out[k] = shard_linear(v, "col")
      elif pair and k == pair[1]:
        out[k] = shard_linear(v, "row")
      elif (k in COL_NAMES and isinstance(v, dict) and "w" in v
            and v["w"].ndim == 2 and hidden_ok(v["w"].shape[-1])):
        out[k] = shard_linear(v, "col")
      elif (k in ROW_NAMES and isinstance(v, dict) and "w" in v
            and v["w"].ndim == 2 and hidden_ok(v["w"].shape[0])):
        out[k] = shard_linear(v, "row")
      elif isinstance(v, dict):
        out[k] = assign(v)
      else:
        out[k] = rep
    return out

  shardings = assign(params)
  return jax.device_put(params, shardings)
