"""bfloat16 activation casting wrapper (reference: casting.py:31-152).

Casts floating inputs/targets/forcings to bfloat16 before the inner
predictor and casts predictions back to the original target dtype. The other
half of the reference's precision policy — float32 master params with bf16
compute (casting.py:155-205 ``bfloat16_variable_view``) — is built into this
framework's NN core (graphcast_tpu/nn/core.py): params are always stored
f32 and cast to the activation dtype at use, so grads accumulate in f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from graphcast_tpu.fields import FieldSet
from graphcast_tpu.models.base import WrapperPredictor


def infer_floating_dtype(fs: FieldSet):
  """The single floating dtype of a FieldSet (reference: casting.py:120-144)."""
  dtypes = {f.data.dtype for f in fs.values()
            if jnp.issubdtype(f.data.dtype, jnp.floating)}
  if len(dtypes) != 1:
    raise ValueError(f"expected one floating dtype, found {dtypes}")
  return dtypes.pop()


class Bfloat16Cast(WrapperPredictor):
  """Wrapper casting to bf16 in, target-dtype out."""

  def __init__(self, predictor, enabled: bool = True):
    super().__init__(predictor)
    self._enabled = enabled

  def precompute_step_statics(self, params, inputs):
    # Hoisted step statics are consumed inside the bf16 region: compute
    # them at the activation dtype the inner model will see.
    inner = getattr(self._predictor, "precompute_step_statics", None)
    if inner is None:
      return {}
    if self._enabled:
      inputs = inputs.astype(jnp.bfloat16)
    return inner(params, inputs)

  def __call__(self, params, rng, inputs, targets_template, forcings,
               **kwargs):
    if not self._enabled:
      return self._predictor(params, rng, inputs, targets_template, forcings,
                             **kwargs)
    target_dtype = infer_floating_dtype(targets_template)
    predictions = self._predictor(
        params, rng,
        inputs.astype(jnp.bfloat16),
        targets_template.astype(jnp.bfloat16),
        forcings.astype(jnp.bfloat16), **kwargs)
    pred_dtype = infer_floating_dtype(predictions)
    if pred_dtype != jnp.bfloat16:
      raise ValueError(f"inner predictor must output bf16, got {pred_dtype}")
    return predictions.astype(target_dtype)

  def loss(self, params, rng, inputs, targets, forcings, **kwargs):
    if not self._enabled:
      return self._predictor.loss(params, rng, inputs, targets, forcings,
                                  **kwargs)
    loss, diagnostics = self._predictor.loss(
        params, rng,
        inputs.astype(jnp.bfloat16),
        targets.astype(jnp.bfloat16),
        forcings.astype(jnp.bfloat16), **kwargs)
    # Loss is reduced in f32 regardless (losses.py casts diagnostics to f32).
    return loss, diagnostics

  def loss_and_predictions(self, params, rng, inputs, targets, forcings,
                           **kwargs):
    if not self._enabled:
      return self._predictor.loss_and_predictions(
          params, rng, inputs, targets, forcings, **kwargs)
    target_dtype = infer_floating_dtype(targets)
    (loss, diagnostics), predictions = self._predictor.loss_and_predictions(
        params, rng,
        inputs.astype(jnp.bfloat16),
        targets.astype(jnp.bfloat16),
        forcings.astype(jnp.bfloat16), **kwargs)
    return (loss, diagnostics), predictions.astype(target_dtype)
