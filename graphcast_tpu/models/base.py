"""The Predictor interface (reference: graphcast/predictor_base.py:28-170).

Functional variant of the reference's central ABC: predictors are stateless
config objects; parameters are explicit pytrees threaded through
``init`` / ``__call__`` / ``loss``. All data flows as FieldSets with
(batch, time, [level,] lat, lon) dims:

- ``inputs``: the state at input times (time ≤ 0 lead), plus static vars;
- ``targets_template``: shapes/coords of what to predict (data unused);
- ``forcings``: externally-specified values at the target times.

``loss`` returns ``(loss[batch], per_variable_diagnostics)``; the loss is
expected to be averaged over devices by the caller when data-parallel
(reference contract: predictor_base.py:118-120).
"""

from __future__ import annotations

import abc
from typing import Any, Tuple

from graphcast_tpu.fields import FieldSet

Params = Any
LossAndDiagnostics = Tuple[Any, dict]  # (loss [batch], {var: [batch]})


class Predictor(abc.ABC):
  """A one-or-multi-step weather predictor over FieldSets."""

  @abc.abstractmethod
  def init(self, rng, inputs: FieldSet, targets_template: FieldSet,
           forcings: FieldSet, **kwargs) -> Params:
    """Initializes (or delegates initialization of) model parameters."""

  @abc.abstractmethod
  def __call__(self, params: Params, rng, inputs: FieldSet,
               targets_template: FieldSet, forcings: FieldSet,
               **kwargs) -> FieldSet:
    """Predicts targets matching targets_template.

    Probabilistic predictors return one sample and accept a ``sample``
    batch-like leading dim by convention (reference: predictor_base.py:82-84).
    """

  @abc.abstractmethod
  def loss(self, params: Params, rng, inputs: FieldSet, targets: FieldSet,
           forcings: FieldSet, **kwargs) -> LossAndDiagnostics:
    """Training loss; (loss[batch], diagnostics)."""

  def loss_and_predictions(
      self, params: Params, rng, inputs: FieldSet, targets: FieldSet,
      forcings: FieldSet, **kwargs
  ) -> tuple[LossAndDiagnostics, FieldSet]:
    """Optionally more efficient loss+forward; needed for AR training
    (reference: predictor_base.py:133-170)."""
    raise NotImplementedError(
        f"{type(self).__name__} does not implement loss_and_predictions")


class WrapperPredictor(Predictor):
  """Base for wrappers that delegate init to the inner predictor."""

  def __init__(self, predictor: Predictor):
    self._predictor = predictor

  def init(self, rng, inputs, targets_template, forcings, **kwargs):
    return self._predictor.init(rng, inputs, targets_template, forcings,
                                **kwargs)

  def precompute_step_statics(self, params, inputs):
    """Delegates to the innermost predictor: returns kwargs with values
    that are constant across autoregressive steps (e.g. embedded static
    edge features) so Autoregressive can compute them ONCE outside its
    scan. Returns {} when the inner model has nothing to hoist."""
    inner = getattr(self._predictor, "precompute_step_statics", None)
    if inner is None:
      return {}
    return inner(params, inputs)
