"""Direct tests of the mesh transformer's three attention backends."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphcast_tpu.geometry import artifact as artifact_lib
from graphcast_tpu.geometry import icosahedron as ico
from graphcast_tpu.models.sparse_transformer import (
    SparseTransformerConfig, Transformer, k_hop_adjacency_from_matrix)
from graphcast_tpu.models.transformer import adjacency_from_edges


def banded_mesh_adjacency():
  """RCM-banded mesh-2 adjacency (the real GenCast setting, tiny)."""
  mesh = artifact_lib.permute_mesh_to_banded(ico.get_mesh_hierarchy(2)[-1])
  senders, receivers = ico.faces_to_edges(mesh.faces)
  return adjacency_from_edges(senders, receivers, mesh.vertices.shape[0])


def make_cfg(attention_type, d_model=32, heads=2):
  return SparseTransformerConfig(
      attention_k_hop=2, d_model=d_model, num_layers=2, num_heads=heads,
      attention_type=attention_type, ffw_hidden=64,
      block_q=64, block_kv=64,
      # Non-zero final inits so outputs actually differ per layer.
      attn_winit_final_mult=2.0, ffw_winit_final_mult=2.0)


def test_attention_backends_agree():
  adj = banded_mesh_adjacency()
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(jax.random.PRNGKey(1), (2, adj.shape[0], 32))
  cond = jax.random.normal(jax.random.PRNGKey(2), (2, 5))

  outs = {}
  params = None
  for backend in ("mha", "triblockdiag_mha", "splash_mha"):
    tr = Transformer(adj, make_cfg(backend), interpret=True)
    if params is None:
      params = tr.init(rng, cond_size=5)
    outs[backend] = np.asarray(tr.apply(params, x, cond))

  np.testing.assert_allclose(outs["triblockdiag_mha"], outs["mha"],
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(outs["splash_mha"], outs["mha"],
                             rtol=2e-4, atol=2e-4)


def test_k_hop_mask_grows():
  adj = banded_mesh_adjacency()
  m1 = k_hop_adjacency_from_matrix(adj, 1)
  m3 = k_hop_adjacency_from_matrix(adj, 3)
  assert m3.nnz > m1.nnz
  # k-hop mask contains the 1-hop mask.
  assert (m1.multiply(m3) != m1).nnz == 0
  # Self edges present.
  assert m1.diagonal().all()


def test_transformer_grads_flow():
  adj = banded_mesh_adjacency()
  tr = Transformer(adj, make_cfg("triblockdiag_mha"), interpret=True)
  params = tr.init(jax.random.PRNGKey(0), cond_size=4)
  x = jax.random.normal(jax.random.PRNGKey(1), (1, adj.shape[0], 32))
  cond = jax.random.normal(jax.random.PRNGKey(2), (1, 4))

  def loss(p):
    return jnp.sum(tr.apply(p, x, cond) ** 2)

  grads = jax.grad(loss)(params)
  g = grads["block_01"]["mha_proj_k"]["w"]
  assert np.isfinite(np.asarray(g)).all()
  assert float(jnp.abs(g).sum()) > 0
  g_nc = grads["final_norm_conditioning"]["w"]
  assert float(jnp.abs(g_nc).sum()) > 0


def test_build_triblock_masks_sparse_matches_dense():
  """The O(nnz) sparse-native build must equal the dense-derived slicing,
  including padded tail blocks, and reject out-of-band entries."""
  from graphcast_tpu.models.sparse_transformer import build_triblock_masks

  rng = np.random.RandomState(0)
  n, bs = 150, 32  # padded = 160 → 5 blocks, 10 padding rows/cols
  ij = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
  dense = (ij < 20) & (rng.rand(n, n) < 0.7)
  np.fill_diagonal(dense, True)
  got, num_padding = build_triblock_masks(sp.csr_matrix(dense), bs)

  padded = 160
  assert num_padding == padded - n
  big = np.zeros((padded, padded), dtype=bool)
  big[:n, :n] = dense
  nb = padded // bs
  want = np.zeros((3, nb, bs, bs), dtype=bool)
  for i in range(nb):
    q0 = i * bs
    want[0, i] = big[q0:q0 + bs, q0:q0 + bs]
    if i + 1 < nb:
      want[1, i] = big[q0:q0 + bs, q0 + bs:q0 + 2 * bs]
    if i > 0:
      want[2, i] = big[q0:q0 + bs, q0 - bs:q0]
  np.testing.assert_array_equal(got, want)

  # An entry two blocks off the diagonal must be rejected, not dropped.
  bad = dense.copy()
  bad[0, 2 * bs + 1] = True
  with np.testing.assert_raises(ValueError):
    build_triblock_masks(sp.csr_matrix(bad), bs)
