from graphcast_tpu.wrappers.normalization import InputsAndResiduals  # noqa: F401
from graphcast_tpu.wrappers.casting import Bfloat16Cast  # noqa: F401
from graphcast_tpu.wrappers.nan_cleaning import NaNCleaner  # noqa: F401
from graphcast_tpu.wrappers.autoregressive import Autoregressive  # noqa: F401
