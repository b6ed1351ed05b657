"""Tests for the NN core, message passing, and deep GNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.nn import core
from graphcast_tpu.nn import deep_gnn
from graphcast_tpu.nn import message_passing as mp
from graphcast_tpu.nn.typed_graph import (
    Context, EdgeSet, EdgeSetKey, EdgesIndices, NodeSet, TypedGraph,
    sort_edges_by_receiver)
from graphcast_tpu.ops import segment


def test_linear_shapes_and_dtype_policy():
  lin = core.Linear(8, 16)
  p = lin.init(jax.random.PRNGKey(0))
  assert p["w"].dtype == jnp.float32
  x = jnp.ones((4, 8), jnp.bfloat16)
  y = lin.apply(p, x)
  assert y.shape == (4, 16)
  assert y.dtype == jnp.bfloat16  # params cast to activation dtype


def test_mlp_apply():
  mlp = core.MLP(4, 32, 2, 7, activation="swish")
  p = mlp.init(jax.random.PRNGKey(1))
  assert set(p) == {"linear_0", "linear_1", "linear_2"}
  y = mlp.apply(p, jnp.ones((3, 4)))
  assert y.shape == (3, 7)


def test_layernorm_normalizes():
  ln = core.LayerNorm(16)
  p = ln.init(None)
  x = jax.random.normal(jax.random.PRNGKey(2), (5, 16)) * 10 + 3
  y = ln.apply(p, x)
  np.testing.assert_allclose(np.asarray(jnp.mean(y, -1)), 0.0, atol=1e-5)
  np.testing.assert_allclose(np.asarray(jnp.std(y, -1)), 1.0, atol=1e-2)


def test_norm_conditioning_identity_at_init():
  spec = core.MLPWithNorm(4, 8, 1, 8, use_layer_norm=True,
                          use_norm_conditioning=True,
                          norm_conditioning_size=3)
  p = spec.init(jax.random.PRNGKey(3))
  x = jax.random.normal(jax.random.PRNGKey(4), (10, 2, 4))
  cond = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 3))
  y = spec.apply(p, x, global_norm_conditioning=cond)
  # Init stddev 1e-8: conditioning ~identity; output is LayerNormed MLP out.
  np.testing.assert_allclose(np.asarray(jnp.mean(y, -1)), 0.0, atol=1e-5)


def make_chain_graph(n=5, feat=3, batch=2):
  """Path graph 0→1→2→...→n-1."""
  senders = np.arange(n - 1, dtype=np.int32)
  receivers = np.arange(1, n, dtype=np.int32)
  senders, receivers = sort_edges_by_receiver(senders, receivers)[:2]
  rng = np.random.RandomState(0)
  nodes = {"nodes": NodeSet(
      n_node=n, features=jnp.asarray(rng.randn(n, batch, feat), jnp.float32))}
  edges = {EdgeSetKey("edges", ("nodes", "nodes")): EdgeSet(
      indices=EdgesIndices(jnp.asarray(senders), jnp.asarray(receivers)),
      features=jnp.asarray(rng.randn(n - 1, batch, feat), jnp.float32))}
  return TypedGraph(context=Context(features=()), nodes=nodes, edges=edges)


def test_segment_aggregation_matches_dense():
  rng = np.random.RandomState(1)
  data = jnp.asarray(rng.randn(6, 2, 3), jnp.float32)
  receivers = jnp.asarray([0, 0, 1, 2, 2, 2])
  out = segment.aggregate_edges_for_nodes(data, receivers, 4)
  expected = np.zeros((4, 2, 3), np.float32)
  for e, r in enumerate([0, 0, 1, 2, 2, 2]):
    expected[r] += np.asarray(data)[e]
  np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_f32_aggregation_dtype():
  data = jnp.ones((4, 2), jnp.bfloat16)
  out = segment.aggregate_edges_for_nodes(
      data, jnp.asarray([0, 0, 1, 1]), 2, f32_aggregation=True)
  assert out.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(out, np.float32), 2.0)


def test_message_passing_manual_check():
  """One MP step with identity-ish update fns, checked by hand."""
  g = make_chain_graph(n=3, feat=2, batch=1)

  def edge_fn(e, s, r):
    return e + s + r  # elementwise

  def node_fn(n, received):
    return n + received

  out = mp.apply_graph_network(
      g,
      update_edge_fn={"edges": lambda e, s, r: edge_fn(e, s, r)},
      update_node_fn={"nodes": lambda n, recv: node_fn(n, recv)})
  nf = np.asarray(g.nodes["nodes"].features)
  ef = np.asarray(g.edges[g.edge_key_by_name("edges")].features)
  senders = np.asarray(g.edges[g.edge_key_by_name("edges")].indices.senders)
  receivers = np.asarray(
      g.edges[g.edge_key_by_name("edges")].indices.receivers)
  new_e = ef + nf[senders] + nf[receivers]
  agg = np.zeros_like(nf)
  for e, r in enumerate(receivers):
    agg[r] += new_e[e]
  np.testing.assert_allclose(
      np.asarray(out.nodes["nodes"].features), nf + agg, rtol=1e-5)
  np.testing.assert_allclose(
      np.asarray(out.edges[out.edge_key_by_name("edges")].features),
      new_e, rtol=1e-5)


def make_bipartite_graph(n_a=6, n_b=4, feat_a=3, feat_b=5, feat_e=4, batch=2):
  rng = np.random.RandomState(2)
  senders = rng.randint(0, n_a, 10).astype(np.int32)
  receivers = rng.randint(0, n_b, 10).astype(np.int32)
  senders, receivers = sort_edges_by_receiver(senders, receivers)[:2]
  nodes = {
      "a": NodeSet(n_a, jnp.asarray(rng.randn(n_a, batch, feat_a),
                                    jnp.float32)),
      "b": NodeSet(n_b, jnp.asarray(rng.randn(n_b, batch, feat_b),
                                    jnp.float32)),
  }
  edges = {EdgeSetKey("a2b", ("a", "b")): EdgeSet(
      indices=EdgesIndices(jnp.asarray(senders), jnp.asarray(receivers)),
      features=jnp.asarray(rng.randn(10, batch, feat_e), jnp.float32))}
  return TypedGraph(context=Context(features=()), nodes=nodes, edges=edges)


@pytest.mark.parametrize("norm_cond", [False, True])
def test_deep_gnn_shapes(norm_cond):
  g = make_bipartite_graph()
  net = deep_gnn.DeepGraphNet(
      node_latent_size={"a": 16, "b": 16},
      edge_latent_size={"a2b": 16},
      mlp_hidden_size=16,
      mlp_num_hidden_layers=1,
      num_message_passing_steps=2,
      node_output_size={"b": 7},
      activation="swish",
      f32_aggregation=True,
      use_norm_conditioning=norm_cond,
      norm_conditioning_size=6 if norm_cond else None)
  params = net.init(jax.random.PRNGKey(0), g)
  cond = jnp.ones((2, 6)) if norm_cond else None
  out = net.apply(params, g, global_norm_conditioning=cond)
  assert out.nodes["b"].features.shape == (4, 2, 7)
  assert out.nodes["a"].features.shape == (6, 2, 16)

  # jit + grad flow
  def loss(p):
    o = net.apply(p, g, global_norm_conditioning=cond)
    return jnp.sum(o.nodes["b"].features ** 2)

  grads = jax.jit(jax.grad(loss))(params)
  leaf = grads["processor_0_edges_a2b"]["mlp"]["linear_0"]["w"]
  assert np.isfinite(np.asarray(leaf)).all()
  assert float(jnp.abs(leaf).sum()) > 0


def test_deep_gnn_unshared_vs_shared_steps():
  g = make_chain_graph(n=4, feat=3, batch=1)
  kwargs = dict(
      node_latent_size={"nodes": 8},
      edge_latent_size={"edges": 8},
      mlp_hidden_size=8,
      mlp_num_hidden_layers=1,
      activation="swish")
  unshared = deep_gnn.DeepGraphNet(num_message_passing_steps=2,
                                   num_processor_repetitions=1, **kwargs)
  shared = deep_gnn.DeepGraphNet(num_message_passing_steps=1,
                                 num_processor_repetitions=2, **kwargs)
  p_u = unshared.init(jax.random.PRNGKey(0), g)
  p_s = shared.init(jax.random.PRNGKey(0), g)
  assert "processor_1_edges_edges" in p_u
  assert "processor_1_edges_edges" not in p_s
  # Both run.
  unshared.apply(p_u, g)
  shared.apply(p_s, g)


def test_node_set_with_no_incoming_edges_updates():
  """In the grid2mesh GNN the grid nodes receive no edges but still get a
  node update from their own latent (reference: typed_graph_net semantics)."""
  g = make_bipartite_graph()
  net = deep_gnn.DeepGraphNet(
      node_latent_size={"a": 8, "b": 8},
      edge_latent_size={"a2b": 8},
      mlp_hidden_size=8, mlp_num_hidden_layers=1,
      num_message_passing_steps=1, activation="swish")
  p = net.init(jax.random.PRNGKey(1), g)
  out = net.apply(p, g)
  assert out.nodes["a"].features.shape == (6, 2, 8)


def test_factored_edge_update_matches_gathered():
  """The factored first-layer edge update is algebraically identical."""
  g = make_bipartite_graph()
  kwargs = dict(
      node_latent_size={"a": 16, "b": 16},
      edge_latent_size={"a2b": 16},
      mlp_hidden_size=16, mlp_num_hidden_layers=2,
      num_message_passing_steps=2, activation="swish")
  net_f = deep_gnn.DeepGraphNet(factored_edge_updates=True, **kwargs)
  net_g = deep_gnn.DeepGraphNet(factored_edge_updates=False, **kwargs)
  params = net_f.init(jax.random.PRNGKey(0), g)
  out_f = net_f.apply(params, g)
  out_g = net_g.apply(params, g)
  np.testing.assert_allclose(
      np.asarray(out_f.nodes["b"].features),
      np.asarray(out_g.nodes["b"].features), rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(
      np.asarray(out_f.edges[out_f.edge_key_by_name("a2b")].features),
      np.asarray(out_g.edges[out_g.edge_key_by_name("a2b")].features),
      rtol=2e-5, atol=2e-5)
