"""Reference (Haiku) checkpoint compatibility round-trip tests."""

import io

import jax
import numpy as np

from graphcast_tpu.compat import haiku_checkpoint
from graphcast_tpu.models.graphcast import GraphCast
from tests.test_graphcast_model import TINY_MODEL, TINY_TASK
from graphcast_tpu.data import synthetic


def init_tiny_graphcast():
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1)
  model = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")
  params = model.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  return model, params, (inputs, targets, forcings)


def test_param_name_roundtrip():
  from graphcast_tpu import train
  _, full_params, _ = init_tiny_graphcast()
  params, _ = train.partition_params(full_params)
  haiku = haiku_checkpoint.native_params_to_haiku(params)
  # Haiku keys look like the reference's module paths.
  assert any(k.startswith("grid2mesh_gnn/~_networks_builder/"
                          "encoder_edges_grid2mesh_mlp/~/linear_")
             for k in haiku)
  assert any("processor_edges_0_mesh" in k for k in haiku)
  back = haiku_checkpoint.haiku_params_to_native(haiku)

  flat1 = jax.tree_util.tree_leaves_with_path(params)
  flat2 = jax.tree_util.tree_leaves_with_path(back)
  assert len(flat1) == len(flat2)
  for (p1, v1), (p2, v2) in zip(sorted(flat1, key=str),
                                sorted(flat2, key=str)):
    assert str(p1) == str(p2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_checkpoint_bundle_roundtrip_and_forward():
  model, params, (inputs, targets, forcings) = init_tiny_graphcast()
  buf = io.BytesIO()
  haiku_checkpoint.save_graphcast_checkpoint(
      buf, params, TINY_MODEL, TINY_TASK, description="tiny", license="mit")
  buf.seek(0)
  loaded_params, model_config, task_config, desc, _ = (
      haiku_checkpoint.load_graphcast_checkpoint(buf))
  assert model_config == TINY_MODEL
  assert task_config == TINY_TASK
  assert desc == "tiny"

  rng = jax.random.PRNGKey(0)
  model2 = GraphCast(model_config, task_config, cache_dir="")
  out1 = model(params, rng, inputs, targets, forcings)
  out2 = model2(loaded_params, rng, inputs, targets, forcings)
  np.testing.assert_allclose(np.asarray(out1.data("temperature")),
                             np.asarray(out2.data("temperature")),
                             rtol=1e-6)


def test_gencast_param_roundtrip():
  from graphcast_tpu import train
  from tests.test_gencast import make_batch, tiny_gencast
  predictor = tiny_gencast()
  inputs, targets, forcings = make_batch(batch=1)
  params = predictor.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  trainable, _ = train.partition_params(params)
  haiku = haiku_checkpoint.native_gencast_params_to_haiku(trainable)
  assert any(k.startswith("mesh_transformer/~/transformer/block_00/")
             for k in haiku)
  # Two unshared norm-conditioning modules per block (attn + ffw pre-norms).
  assert ("mesh_transformer/~/transformer/block_00/"
          "block_00_norm_conditioning/linear") in haiku
  assert ("mesh_transformer/~/transformer/block_00/"
          "block_00_norm_conditioning_1/linear") in haiku
  assert any(k.startswith("fourier_features_mlp/") for k in haiku)
  assert any(k.startswith("grid2mesh_gnn/~_networks_builder/") for k in haiku)
  # Norm conditioning present (GenCast GNNs are conditioned).
  assert any("norm_conditioning" in k for k in haiku)
  back = haiku_checkpoint.gencast_haiku_params_to_native(haiku)
  flat1 = jax.tree_util.tree_leaves_with_path(trainable)
  flat2 = jax.tree_util.tree_leaves_with_path(back)
  assert len(flat1) == len(flat2)
  for (p1, v1), (p2, v2) in zip(sorted(flat1, key=str),
                                sorted(flat2, key=str)):
    assert str(p1) == str(p2), (p1, p2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
