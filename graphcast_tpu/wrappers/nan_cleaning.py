"""NaN cleaning wrapper (reference: nan_cleaning.py:27-125).

Fills one variable's NaNs (sea_surface_temperature in practice) with a fill
value before prediction/loss, and optionally re-applies the input NaN mask
(e.g. the land mask) to predictions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from graphcast_tpu.fields import Field, FieldSet
from graphcast_tpu.models.base import WrapperPredictor


class NaNCleaner(WrapperPredictor):

  def __init__(self, predictor, var_to_clean: str, fill_value: float,
               reintroduce_nans: bool = True):
    super().__init__(predictor)
    self._var = var_to_clean
    self._fill_value = fill_value
    self._reintroduce_nans = reintroduce_nans

  def _clean(self, fs: FieldSet) -> FieldSet:
    if self._var not in fs:
      return fs
    f = fs[self._var]
    data = jnp.nan_to_num(f.data, nan=self._fill_value)
    return fs.replace(**{self._var: Field(data, f.dims)})

  def _maybe_reintroduce_nans(self, stale_inputs: FieldSet,
                              predictions: FieldSet) -> FieldSet:
    """Reapplies the NaN mask from the last input frame
    (reference: nan_cleaning.py:54-63)."""
    if not self._reintroduce_nans or self._var not in predictions:
      return predictions
    src = stale_inputs[self._var].isel("time", -1)
    pred = predictions[self._var]
    mask = jnp.isnan(src.data)
    from graphcast_tpu.fields import _align_for_broadcast
    mask = _align_for_broadcast(Field(mask, src.dims), pred)
    data = jnp.where(mask, jnp.nan, pred.data)
    return predictions.replace(**{self._var: Field(data, pred.dims)})

  def init(self, rng, inputs, targets_template, forcings, **kwargs):
    return self._predictor.init(
        rng, self._clean(inputs), targets_template, self._clean(forcings),
        **kwargs)

  def __call__(self, params, rng, inputs, targets_template, forcings,
               **kwargs):
    predictions = self._predictor(
        params, rng, self._clean(inputs), targets_template,
        self._clean(forcings), **kwargs)
    return self._maybe_reintroduce_nans(inputs, predictions)

  def loss(self, params, rng, inputs, targets, forcings, **kwargs):
    return self._predictor.loss(
        params, rng, self._clean(inputs), self._clean(targets),
        self._clean(forcings), **kwargs)

  def loss_and_predictions(self, params, rng, inputs, targets, forcings,
                           **kwargs):
    (loss, diag), predictions = self._predictor.loss_and_predictions(
        params, rng, self._clean(inputs), self._clean(targets),
        self._clean(forcings), **kwargs)
    return (loss, diag), self._maybe_reintroduce_nans(inputs, predictions)
