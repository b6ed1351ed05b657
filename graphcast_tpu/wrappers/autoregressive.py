"""Autoregressive multi-step wrapper as a single jittable lax.scan.

Native re-design of the reference's autoregressive.py:39-312 (hk.scan with
flattened xarray forcings). A one-step predictor is unrolled over the target
times inside one compiled program: the rolling input window is the scan
carry, per-step forcings/targets are scan xs with the time axis moved to the
scan dimension, and per-step gradient checkpointing (jax.checkpoint, the
reference's hk.remat at autoregressive.py:201-209) bounds memory for BPTT.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp

from graphcast_tpu.fields import Field, FieldSet
from graphcast_tpu.models.base import Predictor, WrapperPredictor


def _split_constant_inputs(inputs: FieldSet, targets: FieldSet,
                           forcings: FieldSet):
  """Constant (timeless) inputs vs time-dependent ones
  (reference: autoregressive.py:88-98)."""
  constant_names = [n for n in inputs.var_names
                    if n not in targets and n not in forcings]
  for name in constant_names:
    if "time" in inputs[name].dims:
      raise ValueError(
          f"time-dependent input {name!r} must be a forcing or target "
          "variable to allow autoregressive feedback")
  constant = inputs.select(constant_names)
  time_dep = inputs.drop(constant_names)
  return constant, time_dep


def _validate(targets: FieldSet, forcings: FieldSet):
  for name in targets.var_names:
    if "time" not in targets[name].dims:
      raise ValueError(f"target {name!r} must be time-dependent")
  for name in forcings.var_names:
    if "time" not in forcings[name].dims:
      raise ValueError(f"forcing {name!r} must be time-dependent")
  overlap = set(targets.var_names) & set(forcings.var_names)
  if overlap:
    raise ValueError(f"variables are both targets and forcings: {overlap}")


def _to_scan_xs(fs: FieldSet):
  """{name: array [T, *rest]} with the time axis moved to front/removed."""
  xs = {}
  for name in fs.var_names:
    f = fs[name]
    t_axis = f.dims.index("time")
    xs[name] = jnp.moveaxis(f.data, t_axis, 0)
  return xs


def _from_scan_x(xs: dict, template: FieldSet) -> FieldSet:
  """Rebuilds a single-timestep FieldSet (time size 1) from scan slices."""
  fields = {}
  for name in template.var_names:
    f = template[name]
    t_axis = f.dims.index("time")
    data = jnp.expand_dims(xs[name], t_axis)
    fields[name] = Field(data, f.dims)
  return FieldSet(fields, coords=template.coords)


def _update_window(window: FieldSet, next_frame: FieldSet) -> FieldSet:
  """Appends the new frame, keeps the trailing `num_input_times` frames
  (reference: autoregressive.py:114-125)."""
  num_times = window.sizes["time"]
  new_frame = next_frame.select(list(window.var_names))
  merged = FieldSet.concat([window, new_frame], "time")
  return merged.isel(time=slice(-num_times, None))


class Autoregressive(WrapperPredictor):
  """Multi-step predictor from a one-step predictor."""

  def __init__(self, predictor: Predictor,
               noise_level: Optional[float] = None,
               gradient_checkpointing: bool = False,
               loss_scan_unroll: int = 1,
               loss_scan_block: int = 1,
               loss_carry_offload: bool = False,
               loss_offload_processor_carries: bool = False):
    """``loss_scan_unroll``: unroll factor for the AR-loss scan (clamped to
    the number of AR steps). At 0.25° the fully-unrolled 2-step backward
    packs ~2 GB tighter than the while-loop form (7% vs 32-34% buffer
    fragmentation — the scan's hoisted double-buffered allocations pack
    badly), which is the difference between fitting a 16 GB chip and not;
    beyond 2 unrolled steps XLA overlaps the per-step backward recomputes
    and memory grows ~linearly, so keep this at 2-4.

    ``loss_scan_block``: two-level checkpointing for the AR-loss scan.
    With block k > 1 (requires gradient_checkpointing and k | num_steps),
    steps are grouped into blocks of k; jax.checkpoint wraps each BLOCK
    (so the scan saves only one carry window per k steps — the [2-frame,
    0.25°] window is ~0.8 GB each) and the per-step checkpoints inside the
    block bound the transient during the block's backward recompute. Same
    math, +1 extra forward recompute per step in exchange for the carry
    stacks.

    ``loss_carry_offload``: stage the inter-step carry windows in the TPU
    host's pinned memory instead of HBM. Device HBM then holds no stacked
    carry windows at all (each 2-frame 0.25° window is ~0.8 GB — the
    stacks are what kept 4-step AR at 19.1 GB > 16 GB), at the price of
    one d2h+h2d round trip per step, overlapped by XLA's async copies.
    Three forms by ``loss_scan_block``:

    - ``== 1`` (default): host-carry scan — the scan carry itself lives in
      host memory (``jax.memory.Space.Host``), so the scan AD's stacked
      carry residuals sit off-device AND the while-loop serializes the
      per-step backwards that unrolled forms let XLA overlap. This is the
      preferred form.
    - ``> 1``, dividing num_steps: composes with the block scan — intra-
      block carries are offloaded via ``checkpoint_name`` + the
      ``save_and_offload_only_these_names`` policy (measured at
      0.25°/4-step: 18.37 GB, the within-block backward overlap remains).
    - ``>= num_steps``: fully python-unrolled inside one outer offloading
      checkpoint (measured WORSE: 24.7 GB at 0.25°/4-step — XLA overlaps
      all the unrolled steps' backward transients).

    Requires ``gradient_checkpointing``.

    ``loss_offload_processor_carries``: checkpoint each AR step with a
    policy that stages the inner model's NAMED "mp_block_carry"
    residuals (the mesh processor's inter-block boundary latents, see
    nn/deep_gnn.py remat_steps — 4 x ~364 MB at 0.25°/mesh-6) in pinned
    host memory during the step's backward instead of HBM. Composes
    with loss_carry_offload (the AR carries and the processor carries
    are independent residual families). Requires
    ``gradient_checkpointing`` AND multi-step targets (the policy rides
    the per-AR-step checkpoint, which only exists for num_steps > 1 —
    1-step losses raise rather than silently skipping the offload), and
    only has an effect when the inner model's processor remat block path
    emits the names (deep_typed_graph_net ``remat_processor`` with
    ``remat_steps`` < total MP steps)."""
    super().__init__(predictor)
    if loss_scan_block < 1:
      raise ValueError(f"loss_scan_block must be >= 1, got {loss_scan_block}")
    if loss_scan_block > 1 and not gradient_checkpointing:
      raise ValueError(
          "loss_scan_block > 1 requires gradient_checkpointing=True (the "
          "block level IS a checkpoint boundary)")
    if loss_carry_offload and not gradient_checkpointing:
      raise ValueError(
          "loss_carry_offload requires gradient_checkpointing=True (the "
          "offloaded carries are checkpoint residuals)")
    if loss_offload_processor_carries and not gradient_checkpointing:
      raise ValueError(
          "loss_offload_processor_carries requires "
          "gradient_checkpointing=True (the offloaded boundaries are "
          "checkpoint residuals)")
    self._noise_level = noise_level
    self._gradient_checkpointing = gradient_checkpointing
    self._loss_scan_unroll = loss_scan_unroll
    self._loss_scan_block = loss_scan_block
    self._loss_carry_offload = loss_carry_offload
    self._loss_offload_processor_carries = loss_offload_processor_carries

  def init(self, rng, inputs, targets_template, forcings, **kwargs):
    # The inner one-step predictor only ever sees single-timestep targets
    # and forcings inside the scan.
    return self._predictor.init(
        rng, inputs,
        targets_template.isel(time=slice(0, 1)),
        forcings.isel(time=slice(0, 1)), **kwargs)

  def __call__(self, params, rng, inputs, targets_template, forcings,
               **kwargs):
    # Hoist scan-invariant inner-model precomputations (e.g. static edge
    # latents) out of the per-step scan body.
    kwargs = {**kwargs, **self.precompute_step_statics(params, inputs)}
    constant_inputs, inputs = _split_constant_inputs(
        inputs, targets_template, forcings)
    _validate(targets_template, forcings)
    num_steps = targets_template.sizes["time"]
    # Strip time coords so the scan carry treedef stays fixed across steps
    # (the reference re-assigns time coords each step for the same reason,
    # autoregressive.py:121-125 / rollout.py:330-342).
    inputs = inputs.assign_coords(time=None)
    template_1 = targets_template.isel(
        time=slice(0, 1)).assign_coords(time=None)
    forcings = forcings.assign_coords(time=None)

    forcings_xs = _to_scan_xs(forcings)
    forcings_template = forcings.isel(time=slice(0, 1))
    rngs = jax.random.split(rng, num_steps)

    def step(window, xs):
      step_rng, forcing_slices = xs
      forcings_t = _from_scan_x(forcing_slices, forcings_template)
      all_inputs = FieldSet.merge([constant_inputs, window])
      predictions = self._predictor(
          params, step_rng, all_inputs, template_1, forcings_t, **kwargs)
      next_frame = FieldSet.merge([predictions, forcings_t])
      next_window = _update_window(window, next_frame)
      ys = {n: predictions[n].isel("time", 0).data
            for n in predictions.var_names}
      return next_window, ys

    if self._gradient_checkpointing and num_steps > 1:
      step = jax.checkpoint(step)

    _, ys = jax.lax.scan(step, inputs, (rngs, forcings_xs))

    fields = {}
    for name in targets_template.var_names:
      tf = targets_template[name]
      t_axis = tf.dims.index("time")
      fields[name] = Field(jnp.moveaxis(ys[name], 0, t_axis), tf.dims)
    return FieldSet(fields, coords=targets_template.coords)

  def rollout_final(self, params, rng, inputs, targets_template, forcings,
                    **kwargs) -> FieldSet:
    """Runs the full multi-step rollout but returns only the *final* input
    window (the state at the last lead time) instead of the stacked
    trajectory.

    At 0.25° a 40-step trajectory is ~25 GB and cannot live in HBM; when
    only the end state (or streaming via rollout.chunked_prediction) is
    needed, this keeps memory flat in the number of steps.

    The number of steps is taken from the forcings' time length, so
    targets_template only needs a single timestep (a full-horizon template
    would itself be a multi-GB argument at 0.25°).
    """
    kwargs = {**kwargs, **self.precompute_step_statics(params, inputs)}
    constant_inputs, inputs = _split_constant_inputs(
        inputs, targets_template, forcings)
    _validate(targets_template, forcings)
    num_steps = forcings.sizes["time"]
    inputs = inputs.assign_coords(time=None)
    template_1 = targets_template.isel(
        time=slice(0, 1)).assign_coords(time=None)
    forcings = forcings.assign_coords(time=None)
    forcings_xs = _to_scan_xs(forcings)
    forcings_template = forcings.isel(time=slice(0, 1))
    rngs = jax.random.split(rng, num_steps)

    def step(window, xs):
      step_rng, forcing_slices = xs
      forcings_t = _from_scan_x(forcing_slices, forcings_template)
      all_inputs = FieldSet.merge([constant_inputs, window])
      predictions = self._predictor(
          params, step_rng, all_inputs, template_1, forcings_t, **kwargs)
      next_frame = FieldSet.merge([predictions, forcings_t])
      return _update_window(window, next_frame), None

    if self._gradient_checkpointing and num_steps > 1:
      step = jax.checkpoint(step)
    final_window, _ = jax.lax.scan(step, inputs, (rngs, forcings_xs))
    return final_window

  def loss(self, params, rng, inputs, targets, forcings, **kwargs):
    if targets.sizes["time"] == 1:
      self._check_processor_offload_applies(1)
      # Delegate directly; no AR feedback needed
      # (reference: autoregressive.py:231-236). NB an outer jax.checkpoint
      # here was measured to INCREASE peak HBM at 0.25° (26.7 vs 20.6 GB) —
      # the chunk-level remat inside the model is what bounds memory.
      return self._predictor.loss(params, rng, inputs, targets, forcings,
                                  **kwargs)
    (loss, diagnostics), _ = self._loss_scan(
        params, rng, inputs, targets, forcings, want_predictions=False,
        **kwargs)
    return loss, diagnostics

  def loss_and_predictions(self, params, rng, inputs, targets, forcings,
                           **kwargs):
    return self._loss_scan(params, rng, inputs, targets, forcings, **kwargs)

  def _check_processor_offload_applies(self, num_steps):
    """The processor-carry offload policy rides the per-AR-step checkpoint,
    which only exists for num_steps > 1 — fail at trace time rather than
    silently running the plain path (the silent-fallthrough class the
    loss_scan_block divisibility check exists for: the miss would surface
    only as an OOM after a long remote compile)."""
    if self._loss_offload_processor_carries and num_steps == 1:
      raise ValueError(
          "loss_offload_processor_carries has no effect for 1-step losses "
          "(there is no per-AR-step checkpoint to attach the offload "
          "policy to) — disable it, or train with multiple AR steps")

  def _finalize(self, losses, diagnostics, pred_ys, targets,
                want_predictions):
    """Averages per-timestep losses over time (reference:
    autoregressive.py:303-312) and rebuilds the stacked-prediction
    FieldSet from the per-step scan/unroll outputs."""
    loss = jnp.mean(losses, axis=0)
    diagnostics = {k: jnp.mean(v, axis=0) for k, v in diagnostics.items()}
    if not want_predictions:
      return (loss, diagnostics), None
    fields = {}
    for name in targets.var_names:
      tf = targets[name]
      t_axis = tf.dims.index("time")
      fields[name] = Field(jnp.moveaxis(pred_ys[name], 0, t_axis), tf.dims)
    return (loss, diagnostics), FieldSet(fields, coords=targets.coords)

  def _loss_scan(self, params, rng, inputs, targets, forcings,
                 want_predictions=True, **kwargs):
    # NB: unlike the inference rollouts above, the loss scan must NOT hoist
    # precompute_step_statics: the hoisted [E, 512] static edge latents are
    # computed FROM params, so under grad each rematerialized step saves its
    # own copy of the stacks and f32 cotangents accumulate for them —
    # measured +33 GB of the 73 GB that kept 2-step AR training at 0.25°
    # off a 16 GB chip. The in-chunk embed path recomputes them per step
    # (two [E,512] matmul passes) and keeps grads exact.
    constant_inputs, inputs = _split_constant_inputs(
        inputs, targets, forcings)
    _validate(targets, forcings)
    num_steps = targets.sizes["time"]
    self._check_processor_offload_applies(num_steps)

    rng, noise_rng = jax.random.split(rng)
    if self._noise_level:
      # Add input noise to time-dependent inputs only
      # (reference: autoregressive.py:244-249).
      noise_rngs = jax.random.split(noise_rng, len(inputs.var_names))
      inputs = FieldSet(
          {n: Field(f.data + self._noise_level * jax.random.normal(
              k, f.data.shape, f.data.dtype), f.dims)
           for (n, f), k in zip(inputs.items(), noise_rngs)},
          coords=inputs.coords)

    inputs = inputs.assign_coords(time=None)
    targets_nc = targets.assign_coords(time=None)
    forcings = forcings.assign_coords(time=None)
    targets_template_1 = targets_nc.isel(time=slice(0, 1))
    forcings_template = forcings.isel(time=slice(0, 1))

    rngs = jax.random.split(rng, num_steps)

    def step(window, xs):
      step_rng, target_slices, forcing_slices = xs
      forcings_t = _from_scan_x(forcing_slices, forcings_template)
      targets_t = _from_scan_x(target_slices, targets_template_1)
      all_inputs = FieldSet.merge([constant_inputs, window])
      (loss, diagnostics), predictions = (
          self._predictor.loss_and_predictions(
              params, step_rng, all_inputs, targets_t, forcings_t, **kwargs))
      next_frame = FieldSet.merge([predictions, forcings_t])
      next_window = _update_window(window, next_frame)
      # loss() discards predictions: emit no per-step ys at all rather than
      # trusting DCE to prune the [T, ...] stacks out of the checkpointed
      # scan's backward.
      pred_ys = ({n: predictions[n].isel("time", 0).data
                  for n in predictions.var_names} if want_predictions else {})
      return next_window, (loss, diagnostics, pred_ys)

    if self._gradient_checkpointing and num_steps > 1:
      if self._loss_offload_processor_carries:
        # Default checkpoint saves NOTHING (full recompute); this policy
        # additionally stages the inner model's named "mp_block_carry"
        # residuals (mesh-processor block boundaries, nn/deep_gnn.py) in
        # pinned host memory during the step's backward — at 0.25°/mesh-6
        # they are 4 x ~364 MB of the per-step backward transient.
        step = jax.checkpoint(
            step,
            policy=jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=["mp_block_carry"],
                offload_src="device", offload_dst="pinned_host"))
      else:
        step = jax.checkpoint(step)

    unroll = max(1, min(self._loss_scan_unroll, num_steps))
    if (self._loss_carry_offload and num_steps > 1
        and self._loss_scan_block == 1):
      # Host-carry scan form (the loss_carry_offload default): the scan's
      # inter-step carry windows live in pinned host memory — each body
      # iteration fetches the window to device, runs the checkpointed step,
      # and stores the next window back to host, so the scan AD's stacked
      # carry residuals ([T, window] — the buffers that kept 4-step AR at
      # 19.1 GB) sit on the HOST, and the while-loop (unroll=1) hard-
      # serializes the per-step backwards that the unrolled/block forms let
      # XLA overlap (measured at 0.25°/4-step: unrolled-offload 24.7 GB,
      # block-2 offload 18.37 GB, block-2 + scan-unroll-1 20.55 GB — all
      # over the 16 GB chip; the overlap of per-step encoder recomputes is
      # the dominant term, see BENCH notes in docs/STATUS.md).
      # Scan over (rng, step-index) only and dynamic-slice the step's
      # targets/forcings from the closure inside the body: the moveaxis'd
      # [T-major] xs stacks otherwise materialize as whole-trajectory HLO
      # temp copies (2×315 MB per target var at 0.25°/4-step — rig rule:
      # reshaped scan xs cost layout copies; slice from the closure).
      def host_body(window_host, xs_i):
        rng_i, i = xs_i
        tgt = {n: jax.lax.dynamic_index_in_dim(
            targets_nc[n].data, i, targets_nc[n].dims.index("time"),
            keepdims=False) for n in targets_nc.var_names}
        frc = {n: jax.lax.dynamic_index_in_dim(
            forcings[n].data, i, forcings[n].dims.index("time"),
            keepdims=False) for n in forcings.var_names}
        window = jax.device_put(window_host, jax.memory.Space.Device)
        next_window, y = step(window, (rng_i, tgt, frc))
        return jax.device_put(next_window, jax.memory.Space.Host), y

      inputs_host = jax.device_put(inputs, jax.memory.Space.Host)
      _, (losses, diagnostics, pred_ys) = jax.lax.scan(
          host_body, inputs_host, (rngs, jnp.arange(num_steps)), unroll=1)
      return self._finalize(losses, diagnostics, pred_ys, targets,
                            want_predictions)
    if (self._loss_carry_offload and num_steps > 1
        and num_steps <= self._loss_scan_block):
      # With loss_scan_block >= num_steps there is only one block, so the
      # block scan below would never engage and the offload would silently
      # be dropped (leaving the 19.1 GB HBM shape the knob exists to avoid,
      # surfacing only as an OOM after a long remote compile). A single
      # block of k unrolled offloaded steps is structurally the unrolled
      # form, so route there.
      # Fully-unrolled offload form. NB measured at 0.25°/4-step: the
      # unrolled backward OVERLAPS per-step encoder transients (24.7 GB —
      # worse than the scan's 19.1); prefer loss_scan_block == 1 (the
      # host-carry scan above), which keeps the backward serialized and the
      # carries off-device.
      # Per-step STATIC time slices instead of the scan's moveaxis'd xs:
      # the [T-major] transposes of the full targets/forcings (~1.8 GB at
      # 0.25°/4-step) otherwise live as HLO temps across the whole unrolled
      # program; a static index_in_dim per step slices straight from the
      # arguments and is rematerialized per step in the backward.
      def xs_of(i):
        tgt = {n: jax.lax.index_in_dim(
            targets_nc[n].data, i, targets_nc[n].dims.index("time"),
            keepdims=False) for n in targets_nc.var_names}
        frc = {n: jax.lax.index_in_dim(
            forcings[n].data, i, forcings[n].dims.index("time"),
            keepdims=False) for n in forcings.var_names}
        return (rngs[i], tgt, frc)

      losses, diagnostics, pred_ys = self._unrolled_offload_loss(
          step, inputs, xs_of, num_steps)
      return self._finalize(losses, diagnostics, pred_ys, targets,
                            want_predictions)
    xs = (rngs, _to_scan_xs(targets_nc), _to_scan_xs(forcings))
    k = self._loss_scan_block
    if k > 1 and num_steps > k and num_steps % k:
      # Fail at trace time (seconds) rather than silently falling back to
      # the per-step-checkpoint scan, whose backward can need tens of GB at
      # 0.25° — discovered only after a ~27-minute cold compile on this rig.
      raise ValueError(
          f"loss_scan_block={k} must divide the number of AR steps "
          f"({num_steps})")
    if k > 1 and num_steps > k:
      # Two-level checkpointing: scan over blocks of k checkpointed steps,
      # with the block itself checkpointed — only block-boundary carries
      # are saved across the scan. With loss_carry_offload, the
      # INTRA-block carries (intermediates of the block, so nameable) are
      # additionally staged in pinned host memory; the scan's sequential
      # dependency still serializes the per-block backward (the unrolled
      # form overlaps them — see above).
      nb = num_steps // k

      def block(window, xs_block):
        ys = []
        for i in range(k):
          xs_i = jax.tree_util.tree_map(lambda x, i=i: x[i], xs_block)
          window, y = step(window, xs_i)
          if self._loss_carry_offload and i + 1 < k:
            window = jax.tree_util.tree_map(
                lambda a: checkpoint_name(a, "ar_carry"), window)
          ys.append(y)
        return window, jax.tree_util.tree_map(
            lambda *a: jnp.stack(a), *ys)

      if self._loss_carry_offload:
        block = jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=["ar_carry"],
                offload_src="device", offload_dst="pinned_host"))
      else:
        block = jax.checkpoint(block)
      xs_b = jax.tree_util.tree_map(
          lambda x: x.reshape(nb, k, *x.shape[1:]), xs)
      _, ys_b = jax.lax.scan(block, inputs, xs_b,
                             unroll=max(1, min(unroll // k, nb)))
      losses, diagnostics, pred_ys = jax.tree_util.tree_map(
          lambda x: x.reshape(num_steps, *x.shape[2:]), ys_b)
    else:
      _, (losses, diagnostics, pred_ys) = jax.lax.scan(
          step, inputs, xs, unroll=unroll)

    return self._finalize(losses, diagnostics, pred_ys, targets,
                          want_predictions)

  @staticmethod
  def _unrolled_offload_loss(step, inputs, xs_of, num_steps):
    """Python-unrolled AR loss with host-offloaded inter-step carries.

    The whole unrolled chain sits inside ONE outer jax.checkpoint whose
    policy saves nothing on device and offloads the named ``ar_carry``
    windows to pinned host memory; everything else is rematerialized in the
    backward, with the per-step inner checkpoints (already applied to
    ``step``) bounding each step's transient. The backward of step i then
    starts from carry i-1 fetched from the host instead of from a
    device-resident stack (reference semantics: autoregressive.py:289-304;
    the memory scheme is ours — the reference has no 0.25° training path)."""
    policy = jax.checkpoint_policies.save_and_offload_only_these_names(
        names_which_can_be_saved=[],
        names_which_can_be_offloaded=["ar_carry"],
        offload_src="device", offload_dst="pinned_host")

    def whole(window):
      # xs_of(i) is called INSIDE the checkpointed region: the per-step
      # target/forcing slices are then rematerialized from the (closed-over
      # tracer) arguments during the backward instead of being saved — had
      # they been passed in as checkpoint inputs, all T slices (~1.8 GB at
      # 0.25°/4-step) would be residuals pinned in HBM.
      ys = []
      for i in range(num_steps):
        window, y = step(window, xs_of(i))
        if i + 1 < num_steps:
          window = jax.tree_util.tree_map(
              lambda a: checkpoint_name(a, "ar_carry"), window)
        ys.append(y)
      return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ys)

    whole = jax.checkpoint(whole, policy=policy)
    return whole(inputs)
