"""End-to-end tests: GraphCast model + wrapper stack + AR rollout/loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.data import synthetic
from graphcast_tpu.fields import Field, FieldSet
from graphcast_tpu.models import configs
from graphcast_tpu.models.graphcast import GraphCast
from graphcast_tpu.wrappers import (
    Autoregressive, Bfloat16Cast, InputsAndResiduals)


TINY_TASK = configs.TaskConfig(
    input_variables=(
        "2m_temperature", "temperature", "toa_incident_solar_radiation",
        "land_sea_mask"),
    target_variables=("2m_temperature", "temperature"),
    forcing_variables=("toa_incident_solar_radiation",),
    pressure_levels=(500, 850),
    input_duration="12h",
)

TINY_MODEL = configs.ModelConfig(
    resolution=30.0, mesh_size=1, latent_size=16, gnn_msg_steps=2,
    hidden_layers=1, radius_query_fraction_edge_length=0.6)


def build_stack(num_targets=1, grad_ckpt=False):
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2, num_target_times=num_targets)
  stddev, mean, diffs_stddev = synthetic.make_norm_stats(TINY_TASK)
  predictor = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")
  predictor = Bfloat16Cast(predictor)
  predictor = InputsAndResiduals(
      predictor, stddev_by_level=stddev, mean_by_level=mean,
      diffs_stddev_by_level=diffs_stddev)
  predictor = Autoregressive(predictor, gradient_checkpointing=grad_ckpt)
  return predictor, inputs, targets, forcings


def test_one_step_forward_shapes():
  predictor, inputs, targets, forcings = build_stack(num_targets=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  preds = predictor(params, rng, inputs, targets, forcings)
  assert preds.var_names == targets.var_names
  for n in targets.var_names:
    assert preds[n].shape == targets[n].shape, n
    assert preds[n].dtype == jnp.float32
    assert np.isfinite(np.asarray(preds[n].data)).all()


def test_ar_rollout_jitted():
  predictor, inputs, targets, forcings = build_stack(num_targets=3)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  @jax.jit
  def forward(params, rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  preds = forward(params, rng, inputs, targets, forcings)
  assert preds["temperature"].sizes["time"] == 3
  assert np.isfinite(np.asarray(preds["temperature"].data)).all()
  # Steps differ (autoregression is actually feeding back).
  t0 = np.asarray(preds["temperature"].isel("time", 0).data)
  t2 = np.asarray(preds["temperature"].isel("time", 2).data)
  assert not np.allclose(t0, t2)


def test_ar_loss_and_grads():
  predictor, inputs, targets, forcings = build_stack(
      num_targets=2, grad_ckpt=True)
  rng = jax.random.PRNGKey(0)
  from graphcast_tpu import train
  params = predictor.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_fn(p):
    (loss, diagnostics) = predictor.loss(
        train.merge_params(p, statics), rng, inputs, targets, forcings)
    return jnp.mean(loss), diagnostics

  (loss, diagnostics), grads = jax.jit(
      jax.value_and_grad(loss_fn, has_aux=True))(trainable)
  assert np.isfinite(float(loss))
  assert set(diagnostics) == {"2m_temperature", "temperature"}
  flat = jax.tree_util.tree_leaves(grads)
  assert all(np.isfinite(np.asarray(g)).all() for g in flat)
  assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_one_step_loss_equals_ar_loss_one_step():
  """AR loss with 1 step delegates to the inner predictor's loss
  (reference behavior: autoregressive.py:231-236)."""
  predictor, inputs, targets, forcings = build_stack(num_targets=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  loss_ar, _ = predictor.loss(params, rng, inputs, targets, forcings)
  loss_inner, _ = predictor._predictor.loss(
      params, rng, inputs, targets, forcings)
  np.testing.assert_allclose(np.asarray(loss_ar), np.asarray(loss_inner),
                             rtol=1e-6)


def test_bf16_inner_compute():
  """The inner model computes in bf16 but returns target dtype."""
  predictor, inputs, targets, forcings = build_stack()
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  # All trainable params stored f32 (master copies); graph statics excluded.
  from graphcast_tpu import train
  trainable, statics = train.partition_params(params)
  for leaf in jax.tree_util.tree_leaves(trainable):
    assert leaf.dtype == jnp.float32
  assert statics is not None
  preds = predictor(params, rng, inputs, targets, forcings)
  assert preds["temperature"].dtype == jnp.float32


class _IdentityPredictor:
  """Predicts the last input frame, normalized domain (for wrapper math)."""

  def init(self, rng, *a, **k):
    return {}

  def __call__(self, params, rng, inputs, targets_template, forcings, **kw):
    out = {}
    for name in targets_template.var_names:
      tf = targets_template[name]
      # predict zeros: residual-normalized zero → prediction = last input
      out[name] = Field(jnp.zeros(tf.shape, tf.dtype), tf.dims)
    return FieldSet(out, coords=targets_template.coords)

  def loss(self, *a, **k):
    raise NotImplementedError


def test_inputs_and_residuals_math():
  """Zero normalized-residual prediction must map back to the last input."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1)
  stddev, mean, diffs_stddev = synthetic.make_norm_stats(TINY_TASK)
  wrapper = InputsAndResiduals(
      _IdentityPredictor(), stddev_by_level=stddev, mean_by_level=mean,
      diffs_stddev_by_level=diffs_stddev)
  preds = wrapper({}, jax.random.PRNGKey(0), inputs, targets, forcings)
  for name in ("2m_temperature", "temperature"):
    last_input = np.asarray(inputs[name].isel("time", -1).data)
    got = np.asarray(preds[name].isel("time", 0).data)
    np.testing.assert_allclose(got, last_input, rtol=1e-5)


def test_chunked_decode_matches_full():
  """decode_chunks > 1 must be numerically equivalent to the full decoder."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2)
  rng = jax.random.PRNGKey(0)
  m_full = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")
  m_chunk = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="", decode_chunks=4)
  params = m_full.init(rng, inputs, targets, forcings)
  out_full = m_full(params, rng, inputs, targets, forcings)
  out_chunk = m_chunk(params, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_chunk.data(n)), np.asarray(out_full.data(n)),
        rtol=2e-5, atol=2e-5)


def test_chunked_encode_matches_full():
  """encode_chunks > 1 must match the full grid2mesh encoder."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2)
  rng = jax.random.PRNGKey(0)
  m_full = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")
  m_chunk = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      encode_chunks=4, decode_chunks=4)
  params = m_full.init(rng, inputs, targets, forcings)
  out_full = m_full(params, rng, inputs, targets, forcings)
  # The chunked model's graph statics use the balanced node-chunk layout —
  # attach its own statics to the shared learned params.
  from graphcast_tpu import train
  learned, _ = train.partition_params(params)
  params_chunk = m_chunk.attach_graph_statics(dict(learned), inputs)
  out_chunk = m_chunk(params_chunk, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_chunk.data(n)), np.asarray(out_full.data(n)),
        rtol=3e-5, atol=3e-5)


def test_fused_padded_aggregation_matches_unfused():
  """fused_aggregation=True (padded mesh edge layout + one-hot kernel,
  interpret mode on CPU) must match the segment-sum path, for batch > 1 too.
  Params are NOT shared verbatim between the two models because the fused
  model's graph_statics are padded — the learned params are identical."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=False)
  m_fused = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=True)
  params = m_plain.init(rng, inputs, targets, forcings)
  from graphcast_tpu import train
  learned, _ = train.partition_params(params)
  params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
  # The padded layout is visible in the statics.
  assert (params_fused["graph_statics"]["mesh_senders"].shape[0]
          >= params["graph_statics"]["mesh_senders"].shape[0])

  out_plain = m_plain(params, rng, inputs, targets, forcings)
  out_fused = m_fused(params_fused, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_fused.data(n)), np.asarray(out_plain.data(n)),
        rtol=2e-4, atol=2e-4)


def test_fused_edge_step_model_matches_unfused_batch1():
  """batch=1 engages the fully-fused Pallas edge step (interpret on CPU);
  outputs must match the unfused model."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=False)
  m_fused = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=True)
  params = m_plain.init(rng, inputs, targets, forcings)
  from graphcast_tpu import train
  learned, _ = train.partition_params(params)
  params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
  # The fused step must actually be engaged for the mesh edge set.
  assert m_fused._mesh_gnn.fused_edge_steps is not None

  out_plain = m_plain(params, rng, inputs, targets, forcings)
  out_fused = m_fused(params_fused, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_fused.data(n)), np.asarray(out_plain.data(n)),
        rtol=5e-4, atol=5e-4)

  # Gradients flow through the fused path (custom VJP).
  def loss_fn(p):
    loss, _ = m_fused.loss(p, rng, inputs, targets, forcings)
    return jnp.mean(loss)
  g = jax.grad(lambda lp: loss_fn(
      m_fused.attach_graph_statics(dict(lp), inputs)))(learned)
  leaves = jax.tree_util.tree_leaves(g)
  assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
  assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_fused_encoder_mode_matches_unfused():
  """fused_aggregation="encoder" (fused processor + fused g2m encode,
  CHUNKED decoder — the ar4 memory-probe config) must match the unfused
  model, with the fused decoder disengaged."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=False)
  m_enc = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                    fused_aggregation="encoder")
  params = m_plain.init(rng, inputs, targets, forcings)
  from graphcast_tpu import train
  learned, _ = train.partition_params(params)
  params_enc = m_enc.attach_graph_statics(dict(learned), inputs)
  assert m_enc._g2m_summer is not None
  assert m_enc._m2g_decoder is None
  out_plain = m_plain(params, rng, inputs, targets, forcings)
  out_enc = m_enc(params_enc, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_enc.data(n)), np.asarray(out_plain.data(n)),
        rtol=5e-4, atol=5e-4)


def test_hoisted_static_edge_latents_match():
  """precompute_step_statics' hoisted encoder/decoder constants must give
  the same predictions as the per-step computation, and the Autoregressive
  wrapper must produce identical rollouts with hoisting active."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2, num_target_times=2)
  rng = jax.random.PRNGKey(0)
  m = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="", encode_chunks=4,
                decode_chunks=4)
  t1 = targets.isel(time=slice(0, 1))
  f1 = forcings.isel(time=slice(0, 1))
  params = m.init(rng, inputs, t1, f1)

  out_plain = m(params, rng, inputs, t1, f1)
  hoisted = m.precompute_step_statics(params, inputs)
  assert "static_edge_latents" in hoisted
  sel = hoisted["static_edge_latents"]
  assert set(sel) == {"g2m_const", "m2g_const"}
  out_hoisted = m(params, rng, inputs, t1, f1, **hoisted)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_hoisted.data(n)), np.asarray(out_plain.data(n)),
        rtol=2e-5, atol=2e-5)

  # Through the full wrapper stack (f32 so the 2-step AR comparison is
  # tight): hoisting ON (automatic via Autoregressive.precompute) must
  # equal hoisting OFF on the same model.
  stddev, mean, diffs_stddev = synthetic.make_norm_stats(TINY_TASK)
  pred = Autoregressive(InputsAndResiduals(
      m, stddev_by_level=stddev, mean_by_level=mean,
      diffs_stddev_by_level=diffs_stddev))
  out_hoist = pred(params, rng, inputs, targets, forcings)
  from unittest import mock
  with mock.patch.object(GraphCast, "precompute_step_statics",
                         return_value={}):
    out_nohoist = pred(params, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_hoist.data(n)), np.asarray(out_nohoist.data(n)),
        rtol=1e-4, atol=1e-4)


def test_windowed_sender_gather_matches(monkeypatch):
  """GC_G2M_WINDOWED (banded g2m layout + two-stage windowed sender gather,
  ops/window_gather.py — the round-5 default) must be BIT-equal to the
  refinement-order layout with the flat row gather."""
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1)
  rng = jax.random.PRNGKey(0)
  from graphcast_tpu.ops import window_gather
  monkeypatch.setattr(window_gather, "MIN_TABLE_ROWS", 0)
  monkeypatch.setenv("GC_G2M_WINDOWED", "0")
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=True)
  params = m_plain.init(rng, inputs, targets, forcings)
  from graphcast_tpu import train
  learned, _ = train.partition_params(params)
  out_plain = m_plain(params, rng, inputs, targets, forcings)

  monkeypatch.setenv("GC_G2M_WINDOWED", "1")
  m_win = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                    fused_aggregation=True)
  params_win = m_win.attach_graph_statics(dict(learned), inputs)
  assert m_win._g2m_window_plan is not None
  assert params_win["graph_statics"].get("g2m_win_base") is not None
  out_win = m_win(params_win, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_array_equal(
        np.asarray(out_win.data(n)), np.asarray(out_plain.data(n)),
        err_msg=n)
