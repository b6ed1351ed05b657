"""Ensemble GenCast inference sharded over an 8-device mesh."""

import jax
import numpy as np
from jax.sharding import NamedSharding

from graphcast_tpu import rollout
from graphcast_tpu.data import synthetic
from graphcast_tpu.parallel import sharding as sharding_lib
from tests.test_gencast import TINY_TASK, make_batch, tiny_gencast


def test_chunked_ensemble_prediction_sharded():
  predictor = tiny_gencast(num_noise_levels=3)
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  import jax as _jax

  @_jax.jit
  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  mesh = sharding_lib.make_mesh({"sample": 8})
  preds = rollout.chunked_ensemble_prediction(
      predictor_fn, rng, inputs, targets, forcings,
      num_samples=8, mesh=mesh, mesh_axis="sample",
      num_steps_per_chunk=1)
  assert preds["temperature"].sizes["batch"] == 8
  data = np.asarray(preds.data("temperature"))
  assert np.isfinite(data).all()
  # Members differ (independent noise per batch element).
  assert not np.allclose(data[0], data[1])
  assert not np.allclose(data[3], data[7])


def test_multichunk_sharded_carry_keeps_sharding_and_values():
  """≥2 chunks: the carried inputs must stay sharded over the sample axis
  for every chunk (round-1 bug: pull_to_host de-sharded the carry after
  chunk 1, replicating the ensemble onto one device), and member values
  must equal the unsharded run."""
  predictor = tiny_gencast(num_noise_levels=3)
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=3,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets.isel(time=slice(0, 1)),
                          forcings.isel(time=slice(0, 1)))

  mesh = sharding_lib.make_mesh({"sample": 8})
  expected_sharding = NamedSharding(
      mesh, jax.sharding.PartitionSpec("sample"))

  chunk_input_shardings = []

  @jax.jit
  def predictor_fn_inner(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  def predictor_fn(rng, inputs, targets_template, forcings):
    # Record the sharding of a batch-leading input leaf at every chunk.
    leaf = inputs.data("temperature")
    chunk_input_shardings.append(getattr(leaf, "sharding", None))
    return predictor_fn_inner(rng, inputs, targets_template, forcings)

  sharded = rollout.chunked_ensemble_prediction(
      predictor_fn, rng, inputs, targets, forcings, num_samples=8,
      mesh=mesh, mesh_axis="sample", num_steps_per_chunk=1)

  assert len(chunk_input_shardings) == 3
  for i, s in enumerate(chunk_input_shardings):
    assert s is not None and s.is_equivalent_to(expected_sharding, 4), (
        f"chunk {i}: carry sharding lost: {s}")

  unsharded = rollout.chunked_ensemble_prediction(
      predictor_fn_inner, rng, inputs, targets, forcings, num_samples=8,
      mesh=None, num_steps_per_chunk=1)
  np.testing.assert_allclose(
      np.asarray(sharded.data("temperature")),
      np.asarray(unsharded.data("temperature")), rtol=2e-4, atol=2e-4)


def test_ensemble_members_match_unsharded():
  """Sharding over the mesh must not change member values."""
  predictor = tiny_gencast(num_noise_levels=3)
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  @jax.jit
  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  unsharded = rollout.chunked_ensemble_prediction(
      predictor_fn, rng, inputs, targets, forcings, num_samples=8, mesh=None)
  mesh = sharding_lib.make_mesh({"sample": 8})
  sharded = rollout.chunked_ensemble_prediction(
      predictor_fn, rng, inputs, targets, forcings, num_samples=8,
      mesh=mesh, mesh_axis="sample")
  np.testing.assert_allclose(
      np.asarray(sharded.data("temperature")),
      np.asarray(unsharded.data("temperature")), rtol=2e-4, atol=2e-4)
