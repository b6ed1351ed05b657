"""Ensemble GenCast inference sharded over an 8-device mesh."""

import jax
import numpy as np

from graphcast_tpu import rollout
from graphcast_tpu.parallel import sharding as sharding_lib
from tests.test_gencast import make_batch, tiny_gencast


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
