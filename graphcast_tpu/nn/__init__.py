from graphcast_tpu.nn.core import (  # noqa: F401
    Linear,
    MLP,
    LayerNorm,
    NormConditioning,
    MLPWithNorm,
    get_activation,
)
from graphcast_tpu.nn.typed_graph import (  # noqa: F401
    Context,
    EdgeSet,
    EdgeSetKey,
    EdgesIndices,
    NodeSet,
    TypedGraph,
)
