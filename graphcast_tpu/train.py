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
  opt_state = optimizer.init(params)
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


def make_train_step(predictor: Predictor,
                    optimizer: optax.GradientTransformation,
                    mesh=None,
                    donate: bool = True):
  """Returns jitted train_step(state, rng, inputs, targets, forcings)
  → (state, loss, diagnostics)."""
  loss_fn = make_loss_fn(predictor)

  def train_step(state: TrainState, rng, inputs, targets, forcings):
    (loss, diagnostics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, rng, inputs, targets, forcings)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=new_params, opt_state=new_opt_state,
                           step=state.step + 1)
    return new_state, loss, diagnostics

  donate_argnums = (0,) if donate else ()
  return jax.jit(train_step, donate_argnums=donate_argnums)


def shard_batch(mesh, *fieldsets):
  """Shards the batch dim of the given FieldSets over the mesh."""
  return sharding_lib.shard_fieldsets(mesh, *fieldsets)


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
