"""Long-horizon inference rollouts (reference: graphcast/rollout.py).

Two mechanisms:

- The *differentiable, fully-jitted* multi-step rollout is
  ``wrappers.Autoregressive`` (a single lax.scan — subsumes the reference's
  autoregressive.py for both training and medium-length inference).
- For very long horizons or when predictions should stream back to host,
  ``chunked_prediction[_generator]`` below runs a Python loop over chunks of
  a jitted predictor (reference: rollout.py:205-401), re-using fixed chunk
  time coordinates so every chunk hits the same compiled program
  (reference: rollout.py:330-342).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.fields import Field, FieldSet

# predictor_fn(rng, inputs, targets_template, forcings) -> predictions
PredictorFn = Callable[..., FieldSet]


def _strip_time(fs: FieldSet) -> FieldSet:
  return fs.assign_coords(time=None)


def get_next_inputs(prev_inputs: FieldSet, predictions: FieldSet,
                    forcings: FieldSet) -> FieldSet:
  """Rolls the input window forward using predictions + forcings
  (reference: rollout.py:379-401)."""
  time_dep_names = [n for n in prev_inputs.var_names
                    if "time" in prev_inputs[n].dims]
  constant = prev_inputs.drop(time_dep_names)
  window = prev_inputs.select(time_dep_names)
  num_times = window.sizes["time"]
  next_frames = FieldSet.merge(
      [_strip_time(predictions), _strip_time(forcings)])
  next_frames = next_frames.select(
      [n for n in time_dep_names])
  merged = FieldSet.concat([_strip_time(window), next_frames], "time")
  rolled = merged.isel(time=slice(-num_times, None))
  return FieldSet.merge([constant, rolled])


def chunked_prediction_generator(
    predictor_fn: PredictorFn,
    rng,
    inputs: FieldSet,
    targets_template: FieldSet,
    forcings: FieldSet,
    num_steps_per_chunk: int = 1,
    pull_to_host: bool = True,
    carry_constraint: Optional[Callable[[FieldSet], FieldSet]] = None,
) -> Iterator[FieldSet]:
  """Yields per-chunk predictions; feeds each chunk back as next inputs.

  Each chunk is evaluated with the *same* time coordinates (those of the
  first chunk) so the jitted predictor compiles once; the yielded chunks are
  re-stamped with their true target times.

  ``pull_to_host`` streams only the *yielded* predictions to host; the
  carried input window always stays device-resident so shardings (e.g. an
  ensemble ``sample`` axis over a Mesh) survive into the next chunk
  (reference behavior: rollout.py:350-360 device_gets only the yielded
  predictions, never the pmapped carry). ``carry_constraint`` (if given) is
  applied to the carried inputs after every chunk — used to re-pin
  NamedShardings that eager host-side ops might lose.
  """
  num_target_steps = targets_template.sizes["time"]
  if num_target_steps % num_steps_per_chunk:
    raise ValueError(
        f"num_steps_per_chunk {num_steps_per_chunk} must divide the "
        f"{num_target_steps} target steps")
  num_chunks = num_target_steps // num_steps_per_chunk
  target_times = targets_template.coords.get("time")
  # The chunked rollout re-uses the first chunk's time coordinates for every
  # predictor call and re-stamps the yields, which is only correct for
  # equispaced targets (reference: rollout.py:302-303).
  if target_times is not None and len(np.atleast_1d(target_times)) > 1:
    diffs = np.diff(np.atleast_1d(target_times))
    if np.issubdtype(diffs.dtype, np.inexact):
      # Float time coords evenly spaced up to rounding (e.g. np.arange with
      # a non-representable step) must not be rejected for ULP noise.
      equispaced = np.allclose(diffs, diffs.flat[0], rtol=1e-6, atol=0.0)
    else:
      equispaced = np.unique(diffs).size <= 1
    if not equispaced:
      raise ValueError(
          "targets_template time coordinates must be evenly spaced for "
          f"chunked prediction; got {target_times!r}")
  # Wall-clock "datetime" coords differ per chunk and would retrace the
  # predictor; strip them from everything the jitted function sees and
  # re-stamp the yielded predictions (reference: rollout.py:283-293).
  target_datetimes = targets_template.coords.get("datetime")
  inputs = inputs.assign_coords(datetime=None)
  targets_template = targets_template.assign_coords(datetime=None)
  forcings = forcings.assign_coords(datetime=None)

  chunk_template = _strip_time(
      targets_template.isel(time=slice(0, num_steps_per_chunk)))
  # Commit the one-chunk template to device ONCE: callers keep the full
  # N-step template host-side (at 0.25° x 30 steps it is ~14 GB — far too
  # big to device_put whole), and a host-side template would otherwise
  # re-upload through the jit boundary on every chunk.
  chunk_template = jax.device_put(chunk_template)
  full_forcings = _strip_time(forcings)
  current_inputs = inputs

  for chunk_idx in range(num_chunks):
    t0 = chunk_idx * num_steps_per_chunk
    chunk_forcings = full_forcings.isel(
        time=slice(t0, t0 + num_steps_per_chunk))
    rng, chunk_rng = jax.random.split(rng)
    predictions = predictor_fn(
        rng=chunk_rng, inputs=current_inputs,
        targets_template=chunk_template, forcings=chunk_forcings)
    current_inputs = get_next_inputs(current_inputs, predictions,
                                     chunk_forcings)
    if carry_constraint is not None:
      current_inputs = carry_constraint(current_inputs)
    if pull_to_host:
      # Stream results off-device so long rollouts don't accumulate HBM
      # (reference: rollout.py:350-360). Only the yielded predictions move;
      # the carry stays on device with its shardings.
      predictions = jax.tree_util.tree_map(np.asarray, predictions)
    if target_times is not None:
      predictions = predictions.assign_coords(
          time=target_times[t0:t0 + num_steps_per_chunk])
    if target_datetimes is not None:
      predictions = predictions.assign_coords(
          datetime=np.atleast_1d(target_datetimes)[
              ..., t0:t0 + num_steps_per_chunk])
    yield predictions


def chunked_prediction(
    predictor_fn: PredictorFn,
    rng,
    inputs: FieldSet,
    targets_template: FieldSet,
    forcings: FieldSet,
    num_steps_per_chunk: int = 1,
    pull_to_host: bool = True,
    carry_constraint: Optional[Callable[[FieldSet], FieldSet]] = None,
) -> FieldSet:
  """Concatenation of all chunks (reference: rollout.py:205-242)."""
  chunks = list(chunked_prediction_generator(
      predictor_fn, rng, inputs, targets_template, forcings,
      num_steps_per_chunk, pull_to_host, carry_constraint))
  out = FieldSet.concat(chunks, "time")
  times = targets_template.coords.get("time")
  if times is not None:
    out = out.assign_coords(time=times)
  datetimes = targets_template.coords.get("datetime")
  if datetimes is not None:
    out = out.assign_coords(datetime=datetimes)
  return out


def tile_batch(fs: FieldSet, factor: int) -> FieldSet:
  """Repeats every batched variable along the batch axis (ensemble fan-out)."""
  def fn(name, f):
    if "batch" not in f.dims:
      return f
    axis = f.dims.index("batch")
    return type(f)(jnp.repeat(f.data, factor, axis=axis), f.dims)
  return fs.map(fn)


def chunked_ensemble_prediction(
    predictor_fn: PredictorFn,
    rng,
    inputs: FieldSet,
    targets_template: FieldSet,
    forcings: FieldSet,
    num_samples: int,
    mesh=None,
    mesh_axis: str = "batch",
    num_steps_per_chunk: int = 1,
    pull_to_host: bool = True,
) -> FieldSet:
  """Ensemble inference: N samples, optionally sharded over a device Mesh.

  TPU-native replacement for the reference's pmap-based
  ``chunked_prediction_generator_multiple_runs`` (rollout.py:78-202): the
  ensemble is a batch axis; each batch element receives independent noise
  inside the probabilistic predictor, and the batch axis is sharded across
  the mesh's ``mesh_axis`` so members run SPMD over ICI. Returns predictions
  with batch size ``input_batch * num_samples`` (sample-major per input).
  """
  inputs = tile_batch(inputs, num_samples)
  targets_template = tile_batch(targets_template, num_samples)
  forcings = tile_batch(forcings, num_samples)
  carry_constraint = None
  if mesh is not None:
    from graphcast_tpu.parallel import sharding as sharding_lib
    dim_to_axis = {"batch": mesh_axis}
    inputs, targets_template, forcings = sharding_lib.shard_fieldsets(
        mesh, inputs, targets_template, forcings, dim_to_axis=dim_to_axis)
    # Re-pin the sample-axis sharding on the carried inputs every chunk —
    # without this the carry silently de-shards after chunk 1 and members
    # would replicate onto one chip from chunk 2 on.
    carry_constraint = lambda fs: sharding_lib.shard_fieldsets(  # noqa: E731
        mesh, fs, dim_to_axis=dim_to_axis)
  return chunked_prediction(
      predictor_fn, rng, inputs, targets_template, forcings,
      num_steps_per_chunk=num_steps_per_chunk, pull_to_host=pull_to_host,
      carry_constraint=carry_constraint)


def extend_targets_template(targets_template: FieldSet,
                            required_num_steps: int) -> FieldSet:
  """Extends a template along time to `required_num_steps`
  (reference: rollout.py:404-461, without the dask laziness)."""
  current = targets_template.sizes["time"]
  if current >= required_num_steps:
    return targets_template.isel(time=slice(0, required_num_steps))
  fields = {}
  for name in targets_template.var_names:
    f = targets_template[name]
    t_axis = f.dims.index("time")
    shape = list(f.shape)
    shape[t_axis] = required_num_steps
    fields[name] = Field(np.zeros(shape, f.dtype), f.dims)
  coords = targets_template.coords
  if "time" in coords and current >= 2:
    t = coords["time"]
    delta = t[1] - t[0]
    coords["time"] = t[0] + delta * np.arange(required_num_steps)
  elif "time" in coords and current == 1:
    coords["time"] = coords["time"][0] * np.arange(1, required_num_steps + 1)
  return FieldSet(fields, coords=coords)
