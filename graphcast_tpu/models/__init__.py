from graphcast_tpu.models.base import (  # noqa: F401
    LossAndDiagnostics,
    Predictor,
)
