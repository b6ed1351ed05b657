"""TPU-native weather modeling framework (GraphCast / GenCast capabilities).

A brand-new JAX/XLA/Pallas framework with the capability surface of
google-deepmind/graphcast, re-architected TPU-first:

- ``fields``: named-dimension array container (``FieldSet``) that is a JAX
  pytree — the native replacement for the reference's xarray-through-jit
  layer (reference: graphcast/xarray_jax.py).
- ``geometry``: host-side graph compiler — icosahedral multi-mesh, grid↔mesh
  connectivity, structural features — cached as static HBM-resident artifacts
  (reference: icosahedral_mesh.py, grid_mesh_connectivity.py, model_utils.py).
- ``nn``: typed-graph message passing cores (reference: typed_graph*.py,
  deep_typed_graph_net.py) built on a minimal functional param-tree module
  system with f32 master params / bf16 activations.
- ``models``: GraphCast (deterministic GNN) and GenCast (diffusion) predictors.
- ``wrappers``: normalization / bf16 / NaN-cleaning / autoregressive
  composition (reference: normalization.py, casting.py, nan_cleaning.py,
  autoregressive.py).
- ``diffusion``: EDM preconditioning, spherical-harmonic noise, DPM-Solver++2S.
- ``rollout``: jittable lax.scan rollouts and chunked inference drivers.
- ``parallel``: jax.sharding Mesh-based ensemble/batch parallelism over ICI.
"""

__version__ = "0.1.0"

from graphcast_tpu.fields import Field, FieldSet  # noqa: F401
from graphcast_tpu.field_tree import map_structure  # noqa: F401


def __getattr__(name):
  # Lazy submodule access (keeps `import graphcast_tpu` light).
  import importlib
  if name in ("models", "wrappers", "diffusion", "geometry", "nn", "ops",
              "data", "parallel", "compat", "rollout", "train", "losses",
              "checkpoint", "evaluation", "xarray_bridge"):
    return importlib.import_module(f"graphcast_tpu.{name}")
  raise AttributeError(f"module 'graphcast_tpu' has no attribute {name!r}")
