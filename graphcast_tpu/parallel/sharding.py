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

  Megatron-style column parallelism for the GNN/transformer MLPs: every 2-D
  weight has its output (last) dim sharded over ``model_axis`` when it
  divides evenly, with matching bias sharding; everything else (layer norms,
  small conditioning layers, graph statics) is replicated. Under jit, XLA's
  SPMD partitioner propagates these shardings through the matmuls and
  inserts the ICI collectives.
  """
  size = mesh.shape[model_axis]

  def spec_for(path, x):
    del path
    if hasattr(x, "ndim") and x.ndim == 2 and x.shape[-1] % size == 0 and (
        x.shape[-1] >= size * 8):
      return NamedSharding(mesh, P(None, model_axis))
    if hasattr(x, "ndim") and x.ndim == 1 and x.shape[0] % size == 0 and (
        x.shape[0] >= size * 8):
      return NamedSharding(mesh, P(model_axis))
    return NamedSharding(mesh, P())

  shardings = jax.tree_util.tree_map_with_path(spec_for, params)
  return jax.device_put(params, shardings)
