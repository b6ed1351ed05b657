"""Training step: multi-step AR loss + grads + optimizer, shardable.

The reference ships no training executable (its harness is external JAXline,
README.md:161); the notebook-level grads_fn (graphcast_demo.ipynb cell 26,
SURVEY §3.3) is promoted here to a first-class API: a jitted train step over
FieldSets with optional batch sharding over a device Mesh, gradient
checkpointing per AR step via the Autoregressive wrapper, and f32 master
params updated by optax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from graphcast_tpu.fields import FieldSet
from graphcast_tpu.models.base import Predictor
from graphcast_tpu.parallel import sharding as sharding_lib


@dataclasses.dataclass
class TrainState:
  params: Any
  opt_state: Any
  step: jnp.ndarray


def init_train_state(predictor: Predictor, optimizer, rng,
                     inputs: FieldSet, targets: FieldSet,
                     forcings: FieldSet) -> TrainState:
  params = predictor.init(rng, inputs, targets, forcings)
  trainable, _ = partition_params(params)
  opt_state = optimizer.init(trainable)
  return TrainState(params=params, opt_state=opt_state,
                    step=jnp.zeros((), jnp.int32))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(params=c[0], opt_state=c[1], step=c[2]))


def make_loss_fn(predictor: Predictor):
  """(params, rng, inputs, targets, forcings) → (scalar loss, diagnostics).

  The loss is the batch mean of the predictor's per-sample loss; under a
  batch-sharded jit this is a global mean across replicas (the reference's
  cross-replica averaging contract, predictor_base.py:118-120).
  """
  def loss_fn(params, rng, inputs, targets, forcings):
    loss, diagnostics = predictor.loss(params, rng, inputs, targets, forcings)
    return jnp.mean(loss, axis=0), {
        k: jnp.mean(v, axis=0) for k, v in diagnostics.items()}
  return loss_fn


STATICS_KEYS = ("graph_statics", "noise_statics")
STATICS_KEY = "graph_statics"  # backwards-compat alias


def partition_params(params):
  """Splits a params tree into (trainable, statics): any dict entry named
  "graph_statics" or "noise_statics" (at any level) is non-trainable data
  threaded as a jit argument (graph artifacts / SHT synthesis tensors)."""
  if not isinstance(params, dict):
    return params, None
  trainable, statics = {}, {}
  for k, v in params.items():
    if k in STATICS_KEYS:
      statics[k] = v
    elif isinstance(v, dict):
      t, s = partition_params(v)
      trainable[k] = t
      if s:
        statics[k] = s
    else:
      trainable[k] = v
  return trainable, (statics or None)


def merge_params(trainable, statics):
  if statics is None:
    return trainable
  merged = dict(trainable) if isinstance(trainable, dict) else trainable
  for k, v in statics.items():
    if k in STATICS_KEYS:
      merged[k] = v
    else:
      merged[k] = merge_params(merged.get(k, {}), v)
  return merged


def make_train_step(predictor: Predictor,
                    optimizer: optax.GradientTransformation,
                    mesh=None,
                    donate: bool = True):
  """Returns jitted train_step(state, rng, inputs, targets, forcings)
  → (state, loss, diagnostics).

  state.params holds the full tree (incl. graph statics); gradients and
  optimizer updates apply only to the trainable partition.
  """
  loss_fn = make_loss_fn(predictor)

  def train_step(state: TrainState, rng, inputs, targets, forcings):
    trainable, statics = partition_params(state.params)

    def trainable_loss(trainable):
      return loss_fn(merge_params(trainable, statics), rng, inputs, targets,
                     forcings)

    (loss, diagnostics), grads = jax.value_and_grad(
        trainable_loss, has_aux=True)(trainable)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, trainable)
    new_trainable = optax.apply_updates(trainable, updates)
    new_state = TrainState(params=merge_params(new_trainable, statics),
                           opt_state=new_opt_state,
                           step=state.step + 1)
    return new_state, loss, diagnostics

  donate_argnums = (0,) if donate else ()
  return jax.jit(train_step, donate_argnums=donate_argnums)


def shard_batch(mesh, *fieldsets):
  """Shards the batch dim of the given FieldSets over the mesh."""
  return sharding_lib.shard_fieldsets(mesh, *fieldsets)


def autoregressive_curriculum(
    total_steps: int = 300_000,
    fine_tune_steps: int = 11_000,
    max_ar_steps: int = 12):
  """The GraphCast paper's AR training curriculum.

  Phase 1 trains on 1-step targets; phase 2 fine-tunes with the number of
  autoregressive steps increasing from 2 to `max_ar_steps` (one increment
  every `fine_tune_steps / (max_ar_steps - 1)` steps).

  Returns a function step → num_ar_steps usable to pick the targets window
  per phase. (Changing the window length recompiles once per phase; the
  scan itself is jitted per length.)
  """
  ramp = fine_tune_steps / max(max_ar_steps - 1, 1)

  def num_ar_steps(step: int) -> int:
    if step < total_steps - fine_tune_steps:
      return 1
    into = step - (total_steps - fine_tune_steps)
    return min(2 + int(into / ramp), max_ar_steps)

  return num_ar_steps


def graphcast_optimizer(
    peak_lr: float = 1e-3,
    warmup_steps: int = 1_000,
    total_steps: int = 300_000,
    weight_decay: float = 0.1,
    clip_norm: float = 32.0) -> optax.GradientTransformation:
  """The GraphCast paper's schedule: linear warmup, cosine decay, AdamW,
  global-norm clipping."""
  schedule = optax.warmup_cosine_decay_schedule(
      init_value=0.0, peak_value=peak_lr,
      warmup_steps=warmup_steps, decay_steps=total_steps)
  return optax.chain(
      optax.clip_by_global_norm(clip_norm),
      optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=weight_decay))
