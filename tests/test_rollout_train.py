"""Tests: chunked rollout, train step, batch sharding over a device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphcast_tpu import rollout, train
from graphcast_tpu.data import synthetic
from graphcast_tpu.fields import FieldSet
from graphcast_tpu.models import configs
from graphcast_tpu.models.graphcast import GraphCast
from graphcast_tpu.parallel import sharding as sharding_lib
from graphcast_tpu.wrappers import (
    Autoregressive, Bfloat16Cast, InputsAndResiduals)
from tests.test_graphcast_model import TINY_MODEL, TINY_TASK


def build(num_targets, batch=2, grad_ckpt=False):
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=batch, num_target_times=num_targets)
  stddev, mean, diffs = synthetic.make_norm_stats(TINY_TASK)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=grad_ckpt)
  return predictor, inputs, targets, forcings


def test_chunked_prediction_matches_scan_rollout():
  """The Python chunked driver must agree with the in-graph lax.scan AR."""
  predictor, inputs, targets, forcings = build(num_targets=4, batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  direct = predictor(params, rng, inputs, targets, forcings)

  @jax.jit
  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  chunked = rollout.chunked_prediction(
      predictor_fn, rng, inputs, targets, forcings, num_steps_per_chunk=2)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(chunked.data(n)), np.asarray(direct.data(n)),
        rtol=2e-2, atol=2e-2)  # bf16 tolerance

  # Chunk of 1 as well.
  chunked1 = rollout.chunked_prediction(
      predictor_fn, rng, inputs, targets, forcings, num_steps_per_chunk=1)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(chunked1.data(n)), np.asarray(chunked.data(n)),
        rtol=2e-2, atol=2e-2)


def test_extend_targets_template():
  _, _, targets, _ = build(num_targets=2, batch=1)
  ext = rollout.extend_targets_template(targets, 5)
  assert ext.sizes["time"] == 5
  assert ext.coords["time"].shape == (5,)


def test_train_step_decreases_loss():
  predictor, inputs, targets, forcings = build(num_targets=2, grad_ckpt=True)
  rng = jax.random.PRNGKey(0)
  optimizer = optax.adam(3e-4)
  state = train.init_train_state(
      predictor, optimizer, rng, inputs, targets, forcings)
  step = train.make_train_step(predictor, optimizer, donate=False)
  losses = []
  for i in range(5):
    state, loss, diagnostics = step(
        state, jax.random.PRNGKey(i), inputs, targets, forcings)
    losses.append(float(loss))
  assert int(state.step) == 5
  assert losses[-1] < losses[0]
  assert np.isfinite(losses).all()


def test_batch_sharded_train_step():
  """Train step with the batch axis sharded over an 8-device CPU mesh."""
  predictor, inputs, targets, forcings = build(num_targets=1, batch=8)
  rng = jax.random.PRNGKey(0)
  optimizer = optax.sgd(1e-3)
  state = train.init_train_state(
      predictor, optimizer, rng, inputs, targets, forcings)

  mesh = sharding_lib.make_mesh({"batch": 8})
  inputs_s, targets_s, forcings_s = sharding_lib.shard_fieldsets(
      mesh, inputs, targets, forcings)
  state = sharding_lib.replicate(state, mesh)
  step = train.make_train_step(predictor, optimizer, donate=False)
  state2, loss_sharded, _ = step(state, rng, inputs_s, targets_s, forcings_s)

  # Same result as unsharded.
  state_r = train.init_train_state(
      predictor, optimizer, jax.random.PRNGKey(0), inputs, targets, forcings)
  _, loss_unsharded, _ = step(state_r, rng, inputs, targets, forcings)
  np.testing.assert_allclose(float(loss_sharded), float(loss_unsharded),
                             rtol=1e-4)

  # Params stay replicated, grads were all-reduced.
  leaf = jax.tree_util.tree_leaves(state2.params)[0]
  assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_forward_matches_single_device():
  predictor, inputs, targets, forcings = build(num_targets=2, batch=8)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  fwd = jax.jit(functools.partial(predictor, params))
  expected = fwd(rng, inputs, targets, forcings)

  mesh = sharding_lib.make_mesh({"batch": 8})
  inputs_s, targets_s, forcings_s = sharding_lib.shard_fieldsets(
      mesh, inputs, targets, forcings)
  got = fwd(rng, inputs_s, targets_s, forcings_s)
  for n in targets.var_names:
    np.testing.assert_allclose(np.asarray(got.data(n)),
                               np.asarray(expected.data(n)),
                               rtol=2e-2, atol=2e-2)


def test_tensor_parallel_forward_matches():
  """TP-sharded params (model axis) produce the same outputs."""
  predictor, inputs, targets, forcings = build(num_targets=1, batch=2)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  fwd = jax.jit(functools.partial(predictor, params))
  expected = fwd(rng, inputs, targets, forcings)

  mesh = sharding_lib.make_mesh({"batch": 2, "model": 4})
  params_tp = sharding_lib.shard_params_tensor_parallel(params, mesh)
  inputs_s, targets_s, forcings_s = sharding_lib.shard_fieldsets(
      mesh, inputs, targets, forcings)
  fwd_tp = jax.jit(functools.partial(predictor, params_tp))
  got = fwd_tp(rng, inputs_s, targets_s, forcings_s)
  for n in targets.var_names:
    np.testing.assert_allclose(np.asarray(got.data(n)),
                               np.asarray(expected.data(n)),
                               rtol=2e-2, atol=2e-2)


def test_hybrid_mesh_arrangement():
  """DCN-major block layout: axis index = dcn_coord * ici_size + ici_coord,
  matching mesh_utils.create_hybrid_device_mesh's np.block arrangement."""
  devs = jax.devices()[:8]
  mesh = sharding_lib.make_hybrid_mesh(
      {"batch": 4, "model": 2}, dcn_axes={"batch": 2}, devices=devs)
  assert mesh.axis_names == ("batch", "model")
  assert mesh.devices.shape == (4, 2)
  # Granule g = devs[4g:4g+4] reshaped to (2, 2) occupies batch rows
  # [2g, 2g+1]: rows 0-1 from slice 0, rows 2-3 from slice 1.
  expected = np.asarray(devs).reshape(2, 2, 2).reshape(4, 2)
  assert (mesh.devices == expected).all()

  import pytest
  with pytest.raises(ValueError, match="not divisible"):
    sharding_lib.make_hybrid_mesh({"batch": 4}, dcn_axes={"batch": 3},
                                  devices=devs[:4])
  with pytest.raises(ValueError, match="not in axis_sizes"):
    sharding_lib.make_hybrid_mesh({"batch": 8}, dcn_axes={"dp": 2},
                                  devices=devs)
  with pytest.raises(ValueError, match="devices"):
    sharding_lib.make_hybrid_mesh({"batch": 4}, dcn_axes={"batch": 2},
                                  devices=devs)


def test_hybrid_mesh_train_step_matches_unsharded():
  """dp-over-DCN x dp-over-ICI x tp train step == single-device numerics.

  Emulates 2 slices x 4 chips on the 8-device CPU mesh: the batch axis
  spans DCN x ICI (only a gradient all-reduce crosses DCN), the model axis
  stays within a slice.
  """
  predictor, inputs, targets, forcings = build(num_targets=1, batch=4)
  rng = jax.random.PRNGKey(0)
  optimizer = optax.sgd(1e-3)
  state = train.init_train_state(
      predictor, optimizer, rng, inputs, targets, forcings)

  mesh = sharding_lib.make_hybrid_mesh(
      {"batch": 4, "model": 2}, dcn_axes={"batch": 2})
  inputs_s, targets_s, forcings_s = sharding_lib.shard_fieldsets(
      mesh, inputs, targets, forcings)
  state = train.TrainState(
      params=sharding_lib.shard_params_tensor_parallel(state.params, mesh),
      opt_state=sharding_lib.replicate(state.opt_state, mesh),
      step=state.step)
  step = train.make_train_step(predictor, optimizer, donate=False)
  _, loss_sharded, _ = step(state, rng, inputs_s, targets_s, forcings_s)

  state_r = train.init_train_state(
      predictor, optimizer, jax.random.PRNGKey(0), inputs, targets, forcings)
  _, loss_unsharded, _ = step(state_r, rng, inputs, targets, forcings)
  # TP resharding reorders the bf16 matmul reductions; the loss itself is
  # bf16-quantized, so allow one ulp-ish of relative slack (same budget as
  # test_tensor_parallel_forward_matches).
  np.testing.assert_allclose(float(loss_sharded), float(loss_unsharded),
                             rtol=1e-2)


def test_chunked_prediction_rejects_uneven_target_times():
  """Non-equispaced target times would be silently mis-stamped (the chunk
  template re-uses the first chunk's coordinates) — must raise instead
  (reference: rollout.py:302-303)."""
  predictor, inputs, targets, forcings = build(num_targets=4, batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  bad_times = np.array([6, 12, 24, 48], dtype=np.int64)  # not equispaced
  targets_bad = targets.assign_coords(time=bad_times)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  gen = rollout.chunked_prediction_generator(
      predictor_fn, rng, inputs, targets_bad, forcings,
      num_steps_per_chunk=2)
  with np.testing.assert_raises_regex(ValueError, "evenly spaced"):
    next(gen)


def test_chunked_prediction_rejects_nondividing_chunk():
  predictor, inputs, targets, forcings = build(num_targets=4, batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  gen = rollout.chunked_prediction_generator(
      predictor_fn, rng, inputs, targets, forcings, num_steps_per_chunk=3)
  with np.testing.assert_raises_regex(ValueError, "divide"):
    next(gen)


def test_chunked_prediction_strips_and_restamps_datetime():
  """Wall-clock datetime coords must not reach the jitted predictor (they
  change every chunk and would retrace) but must be re-stamped on the
  outputs (reference: rollout.py:283-293)."""
  predictor, inputs, targets, forcings = build(num_targets=4, batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  datetimes = np.arange(
      np.datetime64("2020-01-01T06"), np.datetime64("2020-01-02T06"),
      np.timedelta64(6, "h"))
  targets_dt = targets.assign_coords(datetime=datetimes)
  inputs_dt = inputs.assign_coords(
      datetime=datetimes[:2] - np.timedelta64(12, "h"))
  forcings_dt = forcings.assign_coords(datetime=datetimes)

  seen_coords = []

  def predictor_fn(rng, inputs, targets_template, forcings):
    for fs in (inputs, targets_template, forcings):
      seen_coords.append(set(fs.coords))
    return predictor(params, rng, inputs, targets_template, forcings)

  chunks = list(rollout.chunked_prediction_generator(
      predictor_fn, rng, inputs_dt, targets_dt, forcings_dt,
      num_steps_per_chunk=2))
  assert all("datetime" not in c for c in seen_coords)
  np.testing.assert_array_equal(chunks[0].coords["datetime"], datetimes[:2])
  np.testing.assert_array_equal(chunks[1].coords["datetime"], datetimes[2:])

  out = rollout.chunked_prediction(
      predictor_fn, rng, inputs_dt, targets_dt, forcings_dt,
      num_steps_per_chunk=2)
  np.testing.assert_array_equal(out.coords["datetime"], datetimes)


def test_two_step_ar_loss_equals_manual_unroll():
  """The 2-step AR training loss must equal the mean of two manual 1-step
  losses with the window rolled forward by the step-1 predictions
  (reference semantics: autoregressive.py:289-304)."""
  predictor, inputs, targets, forcings = build(num_targets=2, batch=1,
                                                grad_ckpt=True)
  rng = jax.random.PRNGKey(3)
  params = predictor.init(rng, inputs, targets, forcings)

  (loss_ar, _), preds = predictor.loss_and_predictions(
      params, rng, inputs, targets, forcings)

  # Manual: replicate the scan's rng schedule.
  inner = predictor._predictor
  rng2, _noise = jax.random.split(rng)
  rngs = jax.random.split(rng2, 2)
  t0 = targets.isel(time=slice(0, 1))
  f0 = forcings.isel(time=slice(0, 1))
  (l0, _), p0 = inner.loss_and_predictions(params, rngs[0], inputs, t0, f0)
  next_inputs = rollout.get_next_inputs(inputs, p0, f0)
  t1 = targets.isel(time=slice(1, 2)).assign_coords(time=None)
  f1 = forcings.isel(time=slice(1, 2)).assign_coords(time=None)
  (l1, _), p1 = inner.loss_and_predictions(
      params, rngs[1], next_inputs.assign_coords(time=None), t1, f1)

  np.testing.assert_allclose(
      np.asarray(loss_ar), (np.asarray(l0) + np.asarray(l1)) / 2,
      rtol=2e-3)
  # And the stacked predictions match the per-step ones.
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(preds.isel(time=slice(0, 1)).data(n)),
        np.asarray(p0.data(n)), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(preds.isel(time=slice(1, 2)).data(n)),
        np.asarray(p1.data(n)), rtol=2e-2, atol=2e-2)


def test_loss_scan_unroll_invariance():
  """loss_scan_unroll is a memory/scheduling knob: the loss and grads must
  be identical whatever the unroll factor."""
  from graphcast_tpu.data import synthetic as synth
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (Autoregressive, Bfloat16Cast,
                                      InputsAndResiduals)

  inputs, targets, forcings = synth.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=3)
  stddev, mean, diffs = synth.make_norm_stats(TINY_TASK)

  def build_unroll(u):
    return Autoregressive(
        InputsAndResiduals(
            Bfloat16Cast(GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")),
            stddev_by_level=stddev, mean_by_level=mean,
            diffs_stddev_by_level=diffs),
        gradient_checkpointing=True, loss_scan_unroll=u)

  rng = jax.random.PRNGKey(0)
  p1 = build_unroll(1)
  params = p1.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_of(model):
    def fn(trainable):
      loss, _ = model.loss(train.merge_params(trainable, statics), rng,
                           inputs, targets, forcings)
      return jnp.mean(loss)
    return fn

  l1, g1 = jax.value_and_grad(loss_of(p1))(trainable)
  l3, g3 = jax.value_and_grad(loss_of(build_unroll(3)))(trainable)
  np.testing.assert_allclose(float(l1), float(l3), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g1)[0],
      jax.tree_util.tree_flatten_with_path(g3)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
        err_msg=f"{jax.tree_util.keystr(path)}")


def test_loss_scan_block_invariance():
  """loss_scan_block (two-level AR checkpointing) is a memory knob: loss
  and grads must be identical to the per-step-checkpointed scan."""
  from graphcast_tpu.data import synthetic as synth
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (Autoregressive, Bfloat16Cast,
                                      InputsAndResiduals)

  inputs, targets, forcings = synth.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=4)
  stddev, mean, diffs = synth.make_norm_stats(TINY_TASK)

  def build_block(k):
    return Autoregressive(
        InputsAndResiduals(
            Bfloat16Cast(GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")),
            stddev_by_level=stddev, mean_by_level=mean,
            diffs_stddev_by_level=diffs),
        gradient_checkpointing=True, loss_scan_unroll=4, loss_scan_block=k)

  rng = jax.random.PRNGKey(0)
  p1 = build_block(1)
  params = p1.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_of(model):
    def fn(trainable):
      loss, _ = model.loss(train.merge_params(trainable, statics), rng,
                           inputs, targets, forcings)
      return jnp.mean(loss)
    return fn

  l1, g1 = jax.value_and_grad(loss_of(p1))(trainable)
  l2, g2 = jax.value_and_grad(loss_of(build_block(2)))(trainable)
  np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g1)[0],
      jax.tree_util.tree_flatten_with_path(g2)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
        err_msg=f"{jax.tree_util.keystr(path)}")


def test_loss_carry_offload_invariance():
  """loss_carry_offload (host-staged AR carries) is a memory knob: loss and
  grads must match the per-step-checkpointed scan. f32 model (no
  Bfloat16Cast) so the comparison is tight: the python-unrolled offload
  graph fuses differently from the scan body, which at bf16 reassociates
  segment sums to ~1e-3 grad noise — in f32 the residual drift is ~1e-5
  and any structural bug (wrong carry, dropped step) is orders louder."""
  from graphcast_tpu.data import synthetic as synth
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import Autoregressive, InputsAndResiduals

  inputs, targets, forcings = synth.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=3)
  stddev, mean, diffs = synth.make_norm_stats(TINY_TASK)

  def build(offload):
    return Autoregressive(
        InputsAndResiduals(
            GraphCast(TINY_MODEL, TINY_TASK, cache_dir=""),
            stddev_by_level=stddev, mean_by_level=mean,
            diffs_stddev_by_level=diffs),
        gradient_checkpointing=True, loss_carry_offload=offload)

  rng = jax.random.PRNGKey(0)
  p0 = build(False)
  params = p0.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_of(model):
    def fn(trainable):
      loss, _ = model.loss(train.merge_params(trainable, statics), rng,
                           inputs, targets, forcings)
      return jnp.mean(loss)
    return fn

  l0, g0 = jax.value_and_grad(loss_of(p0))(trainable)
  l1, g1 = jax.value_and_grad(loss_of(build(True)))(trainable)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g0)[0],
      jax.tree_util.tree_flatten_with_path(g1)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
        err_msg=f"{jax.tree_util.keystr(path)}")
  # And the knob fails fast without per-step checkpoints.
  import pytest
  inner = p0._predictor
  with pytest.raises(ValueError, match="gradient_checkpointing"):
    Autoregressive(inner, gradient_checkpointing=False,
                   loss_carry_offload=True)


def test_loss_offload_processor_carries_invariance():
  """loss_offload_processor_carries (host-staged mesh-processor block
  boundaries via the named-residual offload policy) is a memory knob:
  loss and grads must match the plain per-step-checkpointed scan.
  remat_processor=True so the named "mp_block_carry" boundaries actually
  exist (nn/deep_gnn.py names every inter-block boundary)."""
  from graphcast_tpu.data import synthetic as synth
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import Autoregressive, InputsAndResiduals

  inputs, targets, forcings = synth.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=2)
  stddev, mean, diffs = synth.make_norm_stats(TINY_TASK)

  def build(offload):
    return Autoregressive(
        InputsAndResiduals(
            GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      remat_processor=True),
            stddev_by_level=stddev, mean_by_level=mean,
            diffs_stddev_by_level=diffs),
        gradient_checkpointing=True,
        loss_offload_processor_carries=offload)

  rng = jax.random.PRNGKey(0)
  p0 = build(False)
  params = p0.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_of(model):
    def fn(trainable):
      loss, _ = model.loss(train.merge_params(trainable, statics), rng,
                           inputs, targets, forcings)
      return jnp.mean(loss)
    return fn

  l0, g0 = jax.value_and_grad(loss_of(p0))(trainable)
  l1, g1 = jax.value_and_grad(loss_of(build(True)))(trainable)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g0)[0],
      jax.tree_util.tree_flatten_with_path(g1)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
        err_msg=f"{jax.tree_util.keystr(path)}")
  import pytest
  with pytest.raises(ValueError, match="gradient_checkpointing"):
    Autoregressive(p0._predictor, gradient_checkpointing=False,
                   loss_offload_processor_carries=True)
  # 1-step losses have no per-AR-step checkpoint to attach the offload
  # policy to — it must fail fast instead of silently running the plain
  # path (regression: the silent fallthrough surfaced only as an OOM).
  with pytest.raises(ValueError, match="no effect for 1-step"):
    build(True).loss(params, rng, inputs,
                     targets.isel(time=slice(0, 1)),
                     forcings.isel(time=slice(0, 1)))
  with pytest.raises(ValueError, match="no effect for 1-step"):
    build(True).loss_and_predictions(params, rng, inputs,
                                     targets.isel(time=slice(0, 1)),
                                     forcings.isel(time=slice(0, 1)))


def test_loss_carry_offload_block_invariance():
  """loss_carry_offload composed with loss_scan_block (the form that fits
  4-step AR at 0.25° in 16 GB: block scan serializes per-block backwards,
  intra-block carries staged on host) must match the plain scan."""
  from graphcast_tpu.data import synthetic as synth
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import Autoregressive, InputsAndResiduals

  inputs, targets, forcings = synth.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=4)
  stddev, mean, diffs = synth.make_norm_stats(TINY_TASK)

  def build(**kw):
    return Autoregressive(
        InputsAndResiduals(
            GraphCast(TINY_MODEL, TINY_TASK, cache_dir=""),
            stddev_by_level=stddev, mean_by_level=mean,
            diffs_stddev_by_level=diffs),
        gradient_checkpointing=True, **kw)

  rng = jax.random.PRNGKey(0)
  p0 = build()
  params = p0.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_of(model):
    def fn(trainable):
      loss, _ = model.loss(train.merge_params(trainable, statics), rng,
                           inputs, targets, forcings)
      return jnp.mean(loss)
    return fn

  l0, g0 = jax.value_and_grad(loss_of(p0))(trainable)
  l1, g1 = jax.value_and_grad(
      loss_of(build(loss_scan_block=2, loss_carry_offload=True)))(trainable)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g0)[0],
      jax.tree_util.tree_flatten_with_path(g1)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
        err_msg=f"{jax.tree_util.keystr(path)}")

  # block >= num_steps (one block) must still ENGAGE the offload — it
  # routes through the unrolled form rather than silently falling back to
  # the plain per-step scan (the 19.1 GB shape the knob exists to avoid).
  m_eq = build(loss_scan_block=4, loss_carry_offload=True)   # block == steps
  m_gt = build(loss_scan_block=8, loss_carry_offload=True)   # block > steps
  calls = []
  orig = Autoregressive._unrolled_offload_loss
  try:
    def spy(step, inputs, xs_of, num_steps):
      calls.append(num_steps)
      return orig(step, inputs, xs_of, num_steps)
    Autoregressive._unrolled_offload_loss = staticmethod(spy)
    l2, g2 = jax.value_and_grad(loss_of(m_eq))(trainable)
    l3, _ = jax.value_and_grad(loss_of(m_gt))(trainable)
  finally:
    Autoregressive._unrolled_offload_loss = staticmethod(orig)
  assert calls == [4, 4], f"offload not engaged for one-block configs: {calls}"
  np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
  np.testing.assert_allclose(float(l0), float(l3), rtol=1e-6)
  for (path, a), (_, b) in zip(
      jax.tree_util.tree_flatten_with_path(g0)[0],
      jax.tree_util.tree_flatten_with_path(g2)[0]):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
        err_msg=f"{jax.tree_util.keystr(path)}")


def test_hybrid_mesh_rejects_slice_mismatch():
  """Real multi-slice hardware whose slice count contradicts the requested
  DCN factorization must raise — the contiguous-chunk emulation would lay
  ICI axes across DCN links."""
  import types
  import pytest
  fake = [types.SimpleNamespace(slice_index=i // 2) for i in range(8)]
  with pytest.raises(ValueError, match="span 4 slices"):
    sharding_lib.make_hybrid_mesh(
        {"batch": 4, "model": 2}, dcn_axes={"batch": 2}, devices=fake)
  # n_dcn == 1 on multi-slice devices is the same topology error.
  with pytest.raises(ValueError, match="slices"):
    sharding_lib.make_hybrid_mesh({"batch": 8}, devices=fake)


def test_loss_scan_block_validation():
  """Invalid loss_scan_block configs fail fast (construction or trace time)
  instead of silently falling back to the per-step scan (whose backward
  OOMs at 0.25 deg after a long compile)."""
  import pytest
  predictor, inputs, targets, forcings = build(num_targets=3, batch=1)
  inner = predictor._predictor
  with pytest.raises(ValueError, match="loss_scan_block"):
    Autoregressive(inner, gradient_checkpointing=True, loss_scan_block=0)
  with pytest.raises(ValueError, match="gradient_checkpointing"):
    Autoregressive(inner, gradient_checkpointing=False, loss_scan_block=2)
  ar = Autoregressive(inner, gradient_checkpointing=True, loss_scan_block=2)
  rng = jax.random.PRNGKey(0)
  params = ar.init(rng, inputs, targets, forcings)
  with pytest.raises(ValueError, match="must divide"):
    ar.loss(params, rng, inputs, targets, forcings)  # 3 steps, block 2


def test_chunked_prediction_accepts_float_time_rounding():
  """Float time coords evenly spaced up to ULP rounding (np.arange with a
  non-representable step) must not be rejected."""
  predictor, inputs, targets, forcings = build(num_targets=4, batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  times = np.arange(0.0, 0.4, 0.1)[:4]  # diffs differ at the ULP level
  assert np.unique(np.diff(times)).size > 1  # the old exact check rejected
  targets_f = targets.assign_coords(time=times)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  chunks = list(rollout.chunked_prediction_generator(
      predictor_fn, rng, inputs, targets_f, forcings, num_steps_per_chunk=2))
  assert len(chunks) == 2
