"""MeshTransformer: adapts mesh-node latents to the sparse transformer.

Reference: graphcast/transformer.py:34-124. Builds the boolean mesh
adjacency (plus self edges) from static edge lists at construction, and
transposes between the GNN layout [nodes, batch, latent] and the
transformer's batch-first [batch, nodes, latent].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphcast_tpu.models.sparse_transformer import (
    SparseTransformerConfig, Transformer)
from graphcast_tpu.nn import core


def adjacency_from_edges(senders: np.ndarray, receivers: np.ndarray,
                         num_nodes: int) -> sp.csr_matrix:
  """Boolean adjacency with self edges
  (reference: transformer.py:34-57)."""
  ones = np.ones(senders.shape[0], dtype=bool)
  adj = sp.csr_matrix((ones, (senders, receivers)),
                      shape=(num_nodes, num_nodes))
  adj = (adj + sp.identity(num_nodes, dtype=bool, format="csr")).astype(bool)
  return adj.tocsr()


class MeshTransformer:
  """Functional wrapper (reference: transformer.py:60-124)."""

  def __init__(self, senders: np.ndarray, receivers: np.ndarray,
               num_nodes: int, cfg: SparseTransformerConfig,
               interpret: Optional[bool] = None):
    adjacency = adjacency_from_edges(senders, receivers, num_nodes)
    self._transformer = Transformer(adjacency, cfg, interpret=interpret)
    self.cfg = cfg

  def init(self, key, cond_size: int) -> core.Params:
    return self._transformer.init(key, cond_size)

  def host_kernel_statics(self):
    return self._transformer.host_kernel_statics()

  def enable_sequence_parallel(self, mesh, axis: str):
    """Shards attention over the mesh-node axis (splash backend only)."""
    self._transformer.enable_sequence_parallel(mesh, axis)

  def apply(self, params: core.Params, node_features,
            global_norm_conditioning, kernel_statics=None) -> jnp.ndarray:
    """node_features: [num_nodes, batch, d_model];
    conditioning: [batch, cond]. Returns same layout as input."""
    if node_features.ndim != 3:
      raise ValueError(f"expected [nodes, batch, d], got {node_features.shape}")
    x = jnp.transpose(node_features, (1, 0, 2))
    y = self._transformer.apply(params, x, global_norm_conditioning,
                                kernel_statics=kernel_statics)
    return jnp.transpose(y, (1, 0, 2))
