from graphcast_tpu.models.base import (  # noqa: F401
    LossAndDiagnostics,
    Predictor,
)
from graphcast_tpu.models import configs  # noqa: F401
from graphcast_tpu.models import gencast  # noqa: F401
from graphcast_tpu.models.graphcast import GraphCast  # noqa: F401
from graphcast_tpu.models.gencast import GenCast  # noqa: F401
