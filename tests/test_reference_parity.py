"""Ground-truth parity against the reference's own modules + real dm-haiku.

These tests load the reference implementation from /root/reference (with a
two-function jraph shim), initialize its actual Haiku modules, and assert:

1. NAMING: the flat Haiku param key sets (and leaf shapes) produced by the
   reference's DeepTypedGraphNet / Transformer / MeshTransformer /
   FourierFeaturesMLP equal what compat/haiku_checkpoint.py emits for our
   native param trees — so a checkpoint written by either side loads in the
   other.
2. NUMERICS: with weights copied across, our layers/GNN/transformer forward
   passes match the reference's to float32 tolerance.
3. INIT DISTRIBUTIONS: our initializers reproduce haiku's actual sampling
   (hk.Linear's uncorrected TruncatedNormal; VarianceScaling's corrected).
4. SERIALIZATION: .npz checkpoints cross-load between our checkpoint module
   and the reference's (graphcast/checkpoint.py), both directions.

Reference files: deep_typed_graph_net.py:198-321, sparse_transformer.py,
transformer.py:60-124, mlp.py:24-45, denoiser.py:41-97, checkpoint.py.
"""

import dataclasses
import functools
import io
import sys
import types
import typing

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from graphcast_tpu import checkpoint as checkpoint_lib
from graphcast_tpu.compat import haiku_checkpoint
from graphcast_tpu.models import sparse_transformer as our_st
from graphcast_tpu.models.denoiser import FourierFeaturesMLP as OurFourierMLP
from graphcast_tpu.models.denoiser import NoiseEncoderConfig
from graphcast_tpu.nn import core
from graphcast_tpu.nn.deep_gnn import DeepGraphNet
from graphcast_tpu.nn.typed_graph import (Context, EdgeSet, EdgeSetKey,
                                          EdgesIndices, NodeSet, TypedGraph,
                                          sort_edges_by_receiver)

REFERENCE_PATH = "/root/reference"


def _install_jraph_shim():
  """The reference only uses jraph.segment_sum / jraph.concatenated_args
  (plus type aliases); shim them so deep_typed_graph_net imports."""
  if "jraph" in sys.modules:
    return
  jraph = types.ModuleType("jraph")
  jraph.segment_sum = jax.ops.segment_sum

  def concatenated_args(update=None, *, axis=-1):
    def decorate(f):
      def wrapper(*args, **kwargs):
        leaves = jax.tree_util.tree_leaves([args, kwargs])
        return f(jnp.concatenate(leaves, axis=axis))
      return wrapper
    return decorate(update) if update is not None else decorate

  jraph.concatenated_args = concatenated_args
  jraph.__getattr__ = lambda name: typing.Any  # type aliases
  sys.modules["jraph"] = jraph


@functools.lru_cache()
def ref():
  _install_jraph_shim()
  if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
  import haiku as hk  # noqa: F401
  from graphcast import checkpoint as ref_checkpoint
  from graphcast import deep_typed_graph_net as ref_dtgn
  from graphcast import mlp as ref_mlp
  from graphcast import sparse_transformer as ref_st
  from graphcast import transformer as ref_transformer
  from graphcast import typed_graph as ref_tg
  from graphcast import typed_graph_net as ref_tgn
  ns = types.SimpleNamespace(
      hk=hk, checkpoint=ref_checkpoint, dtgn=ref_dtgn, mlp=ref_mlp,
      st=ref_st, transformer=ref_transformer, tg=ref_tg, tgn=ref_tgn)
  return ns


def _flat_shapes(haiku_params):
  return {f"{mod}//{name}": tuple(np.shape(v))
          for mod, sub in haiku_params.items() for name, v in sub.items()}


def _to_native_values(haiku_params):
  return {mod: {name: np.asarray(v) for name, v in sub.items()}
          for mod, sub in haiku_params.items()}


# ---------------------------------------------------------------------------
# Shared tiny graph fixtures (both container types, same data).
# ---------------------------------------------------------------------------

LATENT = 8
BATCH = 2
COND = 3


def _bipartite_edges(num_send, num_recv, seed=0):
  rng = np.random.RandomState(seed)
  senders = rng.randint(0, num_send, size=3 * num_recv)
  receivers = np.repeat(np.arange(num_recv), 3)
  senders, receivers = sort_edges_by_receiver(senders, receivers)[:2]
  return senders.astype(np.int32), receivers.astype(np.int32)


def _ring_edges(n):
  senders = np.concatenate([np.arange(n), np.arange(n)])
  receivers = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
  return sort_edges_by_receiver(senders, receivers)[:2]


def _ref_graph(r, node_feats, edge_specs):
  """node_feats: {name: array}; edge_specs: {name: (snd_set, rcv_set, s, r,
  feats)}."""
  nodes = {name: r.tg.NodeSet(n_node=np.array([f.shape[0]]), features=f)
           for name, f in node_feats.items()}
  edges = {}
  for name, (ss, rs, s, rcv, f) in edge_specs.items():
    edges[r.tg.EdgeSetKey(name, (ss, rs))] = r.tg.EdgeSet(
        n_edge=np.array([len(s)]),
        indices=r.tg.EdgesIndices(senders=jnp.asarray(s),
                                  receivers=jnp.asarray(rcv)),
        features=f)
  return r.tg.TypedGraph(
      context=r.tg.Context(n_graph=np.array([1]), features=()),
      nodes=nodes, edges=edges)


def _our_graph(node_feats, edge_specs):
  nodes = {name: NodeSet(f.shape[0], f) for name, f in node_feats.items()}
  edges = {}
  for name, (ss, rs, s, rcv, f) in edge_specs.items():
    edges[EdgeSetKey(name, (ss, rs))] = EdgeSet(
        indices=EdgesIndices(jnp.asarray(s), jnp.asarray(rcv)), features=f)
  return TypedGraph(context=Context(features=()), nodes=nodes, edges=edges)


# ---------------------------------------------------------------------------
# 1. Core layer numerics vs haiku.
# ---------------------------------------------------------------------------


def test_linear_matches_hk_linear():
  r = ref()
  hk = r.hk
  x = jnp.asarray(np.random.RandomState(0).randn(5, 7).astype(np.float32))

  def fwd(x):
    return hk.Linear(11)(x)

  t = hk.transform(fwd)
  hk_params = t.init(jax.random.PRNGKey(1), x)
  expected = t.apply(hk_params, None, x)

  ours = core.Linear(7, 11)
  out = ours.apply({"w": hk_params["linear"]["w"],
                    "b": hk_params["linear"]["b"]}, x)
  np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_layernorm_matches_hk_layernorm():
  r = ref()
  hk = r.hk
  x = jnp.asarray(np.random.RandomState(0).randn(4, 9).astype(np.float32) * 3)

  def fwd(x):
    return hk.LayerNorm(axis=-1, create_scale=True, create_offset=True)(x)

  t = hk.transform(fwd)
  p = t.init(jax.random.PRNGKey(0), x)
  # Non-trivial scale/offset.
  p = {"layer_norm": {"scale": jnp.linspace(0.5, 2.0, 9),
                      "offset": jnp.linspace(-1.0, 1.0, 9)}}
  expected = t.apply(p, None, x)
  ours = core.LayerNorm(9)
  out = ours.apply({"scale": p["layer_norm"]["scale"],
                    "offset": p["layer_norm"]["offset"]}, x)
  np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                             rtol=1e-6, atol=1e-6)


def test_mlp_matches_hk_nets_mlp_swish():
  r = ref()
  hk = r.hk
  x = jnp.asarray(np.random.RandomState(1).randn(6, 5).astype(np.float32))

  def fwd(x):
    return hk.nets.MLP(output_sizes=[8, 8, 3], activation=jax.nn.swish)(x)

  t = hk.transform(fwd)
  hk_params = t.init(jax.random.PRNGKey(2), x)
  expected = t.apply(hk_params, None, x)

  ours = core.MLP(in_size=5, hidden_size=8, num_hidden_layers=2, out_size=3,
                  activation="swish")
  native = {f"linear_{i}": {"w": hk_params[f"mlp/~/linear_{i}"]["w"],
                            "b": hk_params[f"mlp/~/linear_{i}"]["b"]}
            for i in range(3)}
  out = ours.apply(native, x)
  np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_norm_conditioning_matches_reference_module():
  r = ref()
  hk = r.hk
  x = jnp.asarray(np.random.RandomState(2).randn(4, 6).astype(np.float32))
  cond = jnp.asarray(np.random.RandomState(3).randn(4, 3).astype(np.float32))

  def fwd(x, cond):
    return r.mlp.LinearNormConditioning()(x, cond)

  t = hk.transform(fwd)
  p = t.init(jax.random.PRNGKey(0), x, cond)
  # Overwrite near-zero init with something non-trivial.
  w = jnp.asarray(np.random.RandomState(4).randn(3, 12).astype(np.float32))
  b = jnp.asarray(np.random.RandomState(5).randn(12).astype(np.float32))
  p = {"norm_conditioning/linear": {"w": w, "b": b}}
  expected = t.apply(p, None, x, cond)

  ours = core.NormConditioning(cond_size=3, feature_size=6)
  out = ours.apply({"w": w, "b": b}, x, cond)
  np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_init_distributions_match_haiku():
  """Our initializers must reproduce haiku's actual sampling behavior:
  hk.Linear default = TruncatedNormal(1/sqrt(fan_in)) with NO stddev
  correction; VarianceScaling DOES correct (sample std = sqrt(scale/fan))."""
  r = ref()
  hk = r.hk
  fan_in = 2048

  def fwd(x):
    return hk.Linear(1024)(x)

  p = hk.transform(fwd).init(jax.random.PRNGKey(0), jnp.ones((1, fan_in)))
  hk_std = float(np.std(p["linear"]["w"]))

  ours = core.Linear(fan_in, 1024)
  our_std = float(np.std(ours.init(jax.random.PRNGKey(1))["w"]))
  assert abs(our_std - hk_std) / hk_std < 0.02, (our_std, hk_std)
  # And both are the UNcorrected truncnorm std (≈0.8796/sqrt(fan_in)):
  assert abs(our_std * np.sqrt(fan_in) - 0.8796) < 0.02

  # VarianceScaling(2.0 / L) (transformer ffw/attn init).
  def fwd2(x):
    return hk.Linear(
        1024, w_init=hk.initializers.VarianceScaling(2.0 / 16))(x)

  p2 = hk.transform(fwd2).init(jax.random.PRNGKey(0), jnp.ones((1, fan_in)))
  hk_std2 = float(np.std(p2["linear"]["w"]))
  std = our_st._variance_scaling_stddev(2.0 / 16, fan_in)
  our2 = core.Linear(fan_in, 1024, init_stddev=std)
  our_std2 = float(np.std(our2.init(jax.random.PRNGKey(3))["w"]))
  assert abs(our_std2 - hk_std2) / hk_std2 < 0.02, (our_std2, hk_std2)


# ---------------------------------------------------------------------------
# 2. DeepTypedGraphNet: key-set + shapes + forward parity.
# ---------------------------------------------------------------------------

GNN_CASES = {
    # GraphCast grid2mesh (reference graphcast.py:261-277): bipartite,
    # norm-conditioning OFF, f32 aggregation, embeds both.
    "grid2mesh_plain": dict(
        name="grid2mesh_gnn", norm_cond=False, f32_aggregation=True,
        steps=1, bipartite=True, embed_nodes=True, node_output=None),
    # GenCast grid2mesh (reference denoiser.py:302-327): norm-conditioned.
    "grid2mesh_conditioned": dict(
        name="grid2mesh_gnn", norm_cond=True, f32_aggregation=True,
        steps=1, bipartite=True, embed_nodes=True, node_output=None),
    # GraphCast mesh processor (graphcast.py:280-293): unipartite multi-step.
    "mesh_processor": dict(
        name="mesh_gnn", norm_cond=False, f32_aggregation=False,
        steps=3, bipartite=False, embed_nodes=False, node_output=None),
    # mesh2grid decoder (graphcast.py:304-321 / denoiser.py:339-362).
    "mesh2grid_decoder": dict(
        name="mesh2grid_gnn", norm_cond=True, f32_aggregation=False,
        steps=1, bipartite=True, embed_nodes=False, node_output=4),
}


def _build_gnn_case(case):
  """Returns (ref_init_fn, our_model, our_graph, gnn_kwargs)."""
  r = ref()
  if case["bipartite"]:
    n_a, n_b = 12, 6
    senders, receivers = _bipartite_edges(n_a, n_b)
    edge_name = ("mesh2grid" if case["name"] == "mesh2grid_gnn"
                 else "grid2mesh")
    snd_set, rcv_set = (("mesh_nodes", "grid_nodes")
                        if case["name"] == "mesh2grid_gnn"
                        else ("grid_nodes", "mesh_nodes"))
    feat_a = LATENT if case["name"] == "mesh2grid_gnn" else 5
    feat_b = LATENT if case["name"] == "mesh2grid_gnn" else 4
    node_feats = {
        snd_set: jnp.asarray(
            np.random.RandomState(0).randn(n_a, BATCH, feat_a)
            .astype(np.float32)),
        rcv_set: jnp.asarray(
            np.random.RandomState(1).randn(n_b, BATCH, feat_b)
            .astype(np.float32)),
    }
    edge_feats = jnp.asarray(
        np.random.RandomState(2).randn(len(senders), BATCH, 4)
        .astype(np.float32))
    edge_specs = {edge_name: (snd_set, rcv_set, senders, receivers,
                              edge_feats)}
    node_latent = {snd_set: LATENT, rcv_set: LATENT}
    edge_latent = {edge_name: LATENT}
    node_output = ({"grid_nodes": case["node_output"]}
                   if case["node_output"] else None)
  else:
    n = 10
    senders, receivers = _ring_edges(n)
    node_feats = {"mesh_nodes": jnp.asarray(
        np.random.RandomState(0).randn(n, BATCH, LATENT).astype(np.float32))}
    edge_feats = jnp.asarray(
        np.random.RandomState(2).randn(len(senders), BATCH, 4)
        .astype(np.float32))
    edge_specs = {"mesh": ("mesh_nodes", "mesh_nodes", senders, receivers,
                           edge_feats)}
    node_latent = {"mesh_nodes": LATENT}
    edge_latent = {"mesh": LATENT}
    node_output = None

  gnn_kwargs = dict(
      activation="swish",
      aggregate_normalization=None,
      edge_latent_size=dict(edge_latent),
      embed_edges=True,
      embed_nodes=case["embed_nodes"],
      f32_aggregation=case["f32_aggregation"],
      include_sent_messages_in_node_update=False,
      mlp_hidden_size=LATENT,
      mlp_num_hidden_layers=1,
      node_latent_size=dict(node_latent),
      node_output_size=node_output,
      num_message_passing_steps=case["steps"],
      use_layer_norm=True,
      use_norm_conditioning=case["norm_cond"],
  )

  def ref_fwd(cond):
    net = r.dtgn.DeepTypedGraphNet(name=case["name"], **gnn_kwargs)
    graph = _ref_graph(r, node_feats, edge_specs)
    if case["norm_cond"]:
      return net(graph, cond)
    return net(graph)

  our_model = DeepGraphNet(
      node_latent_size=node_latent,
      edge_latent_size=edge_latent,
      mlp_hidden_size=LATENT,
      mlp_num_hidden_layers=1,
      num_message_passing_steps=case["steps"],
      embed_nodes=case["embed_nodes"],
      node_output_size=node_output,
      use_layer_norm=True,
      use_norm_conditioning=case["norm_cond"],
      norm_conditioning_size=COND if case["norm_cond"] else None,
      activation="swish",
      f32_aggregation=case["f32_aggregation"],
      factored_edge_updates=False)
  our_graph = _our_graph(node_feats, edge_specs)
  return ref_fwd, our_model, our_graph


@pytest.mark.parametrize("case_name", sorted(GNN_CASES))
def test_deep_gnn_keyset_and_shapes(case_name):
  case = GNN_CASES[case_name]
  r = ref()
  ref_fwd, our_model, our_graph = _build_gnn_case(case)
  cond = jnp.ones((BATCH, COND), jnp.float32)
  ref_params = r.hk.transform(ref_fwd).init(jax.random.PRNGKey(0), cond)

  our_params = our_model.init(jax.random.PRNGKey(0), our_graph)
  converted = haiku_checkpoint.native_params_to_haiku(
      {case["name"]: our_params})

  assert _flat_shapes(converted) == _flat_shapes(ref_params)


@pytest.mark.parametrize("case_name", sorted(GNN_CASES))
@pytest.mark.parametrize("factored", [False, True])
def test_deep_gnn_forward_parity(case_name, factored):
  case = GNN_CASES[case_name]
  r = ref()
  ref_fwd, our_model, our_graph = _build_gnn_case(case)
  our_model = dataclasses.replace(our_model, factored_edge_updates=factored)
  cond = jnp.asarray(
      np.random.RandomState(7).randn(BATCH, COND).astype(np.float32))

  t = r.hk.transform(ref_fwd)
  ref_params = t.init(jax.random.PRNGKey(0), cond)
  ref_out = t.apply(ref_params, None, cond)

  native = haiku_checkpoint.haiku_params_to_native(
      _to_native_values(ref_params))[case["name"]]
  gnc = cond if case["norm_cond"] else None
  our_out = our_model.apply(native, our_graph, global_norm_conditioning=gnc)

  tol = dict(rtol=2e-4, atol=2e-5) if factored else dict(rtol=1e-5, atol=1e-6)
  for name, node_set in ref_out.nodes.items():
    np.testing.assert_allclose(
        np.asarray(our_out.nodes[name].features),
        np.asarray(node_set.features), err_msg=f"nodes:{name}", **tol)
  for key, edge_set in ref_out.edges.items():
    ours = our_out.edges[our_out.edge_key_by_name(key.name)]
    np.testing.assert_allclose(
        np.asarray(ours.features), np.asarray(edge_set.features),
        err_msg=f"edges:{key.name}", **tol)


# ---------------------------------------------------------------------------
# 2b. GraphNetwork globals / configurable aggregators vs the reference.
# ---------------------------------------------------------------------------


def test_graph_network_globals_and_aggregators_parity():
  """Full GraphNetwork semantics (typed_graph_net.py:41-225): global-to-edge
  and global-to-node broadcast, sent+received aggregation, configurable
  aggregate fns, and the context update — against the reference's own
  GraphNetwork run on the same data and weights."""
  from graphcast_tpu.nn import message_passing as mp
  from graphcast_tpu.ops import segment

  r = ref()
  n, b = 6, 2
  rng = np.random.RandomState(0)
  s1, r1 = _ring_edges(n)
  s2, r2 = sort_edges_by_receiver(
      rng.randint(0, n, 2 * n), rng.randint(0, n, 2 * n))[:2]
  node = jnp.asarray(rng.randn(n, b, 5).astype(np.float32))
  e1 = jnp.asarray(rng.randn(len(s1), b, 3).astype(np.float32))
  e2 = jnp.asarray(rng.randn(len(s2), b, 2).astype(np.float32))
  ctx = jnp.asarray(rng.randn(b, 4).astype(np.float32))

  def w(shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)

  w_e1 = w((3 + 5 + 5 + 4, 3))
  w_e2 = w((2 + 5 + 5 + 4, 2))
  # node inputs: node(5) + sent e1(3) + sent e2(2) + recv e1(3) + recv e2(2)
  # + ctx(4)
  w_n = w((5 + 3 + 2 + 3 + 2 + 4, 5))
  w_g = w((5 + 3 + 2 + 4, 4))

  def mlp(wmat):
    return lambda *xs: jnp.tanh(jnp.concatenate(xs, axis=-1) @ wmat)

  def ref_mean(data, ids, num):
    return segment.segment_mean(data, ids, num)

  # --- reference side (positional-arg protocol with dicts) ---
  def ref_edge_fn(wmat):
    return lambda e, snd, rcv, g: mlp(wmat)(e, snd, rcv, g)

  def ref_node_fn(nfeat, sent, recv, g):
    parts = ([nfeat] + [sent[k] for k in sorted(sent)]
             + [recv[k] for k in sorted(recv)] + [g])
    return mlp(w_n)(*parts)

  def ref_global_fn(nodes, edges, g):
    parts = ([nodes[k] for k in sorted(nodes)]
             + [edges[k] for k in sorted(edges)] + [g])
    return mlp(w_g)(*parts)

  gn = r.tgn.GraphNetwork(
      update_edge_fn={"e1": ref_edge_fn(w_e1), "e2": ref_edge_fn(w_e2)},
      update_node_fn={"a": ref_node_fn},
      update_global_fn=ref_global_fn,
      aggregate_edges_for_nodes_fn=ref_mean,
      aggregate_nodes_for_globals_fn=ref_mean,
      aggregate_edges_for_globals_fn=ref_mean)
  ref_graph = r.tg.TypedGraph(
      context=r.tg.Context(n_graph=np.array([1]), features=ctx[None]),
      nodes={"a": r.tg.NodeSet(n_node=np.array([n]), features=node)},
      edges={
          r.tg.EdgeSetKey("e1", ("a", "a")): r.tg.EdgeSet(
              n_edge=np.array([len(s1)]),
              indices=r.tg.EdgesIndices(jnp.asarray(s1), jnp.asarray(r1)),
              features=e1),
          r.tg.EdgeSetKey("e2", ("a", "a")): r.tg.EdgeSet(
              n_edge=np.array([len(s2)]),
              indices=r.tg.EdgesIndices(jnp.asarray(s2), jnp.asarray(r2)),
              features=e2),
      })
  ref_out = gn(ref_graph)

  # --- our side ---
  def our_mean(data, ids, num, edge_set_name=None, indices_are_sorted=True):
    del edge_set_name
    return segment.segment_mean(data, ids, num,
                                indices_are_sorted=indices_are_sorted)

  our_graph = _our_graph(
      {"a": node},
      {"e1": ("a", "a", s1, r1, e1), "e2": ("a", "a", s2, r2, e2)})
  our_graph = our_graph._replace(context=Context(features=ctx))
  our_out = mp.apply_graph_network(
      our_graph,
      update_edge_fn={"e1": mlp(w_e1), "e2": mlp(w_e2)},
      update_node_fn={"a": mlp(w_n)},
      aggregate_edges_for_nodes_fn={"e1": our_mean, "e2": our_mean},
      include_sent_messages_in_node_update=True,
      update_global_fn=mlp(w_g),
      aggregate_nodes_for_globals_fn=our_mean,
      aggregate_edges_for_globals_fn=our_mean)

  np.testing.assert_allclose(
      np.asarray(our_out.nodes["a"].features),
      np.asarray(ref_out.nodes["a"].features), rtol=1e-5, atol=1e-6)
  for key in ref_out.edges:
    np.testing.assert_allclose(
        np.asarray(our_out.edges[our_out.edge_key_by_name(key.name)].features),
        np.asarray(ref_out.edges[key].features), rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(our_out.context.features),
      np.asarray(ref_out.context.features)[0], rtol=1e-5, atol=1e-6)


def test_per_edge_set_aggregators_mixed_reducers():
  """Ours-only extension: different reducers per edge set (analytic check)."""
  from graphcast_tpu.nn import message_passing as mp
  from graphcast_tpu.ops import segment

  n = 3
  s1 = np.array([0, 1, 2, 0], np.int32)
  r1 = np.array([0, 0, 1, 2], np.int32)
  feats = jnp.asarray(np.array([[1.], [3.], [5.], [7.]], np.float32))
  node = jnp.zeros((n, 1), jnp.float32)

  def agg(method):
    def fn(data, ids, num, edge_set_name=None, indices_are_sorted=True):
      return segment.REDUCERS[method](data, ids, num,
                                      indices_are_sorted=indices_are_sorted)
    return fn

  graph = _our_graph({"a": node}, {"e1": ("a", "a", s1, r1, feats)})
  out_max = mp.apply_graph_network(
      graph,
      update_edge_fn={"e1": lambda e, s, r: e},
      update_node_fn={"a": lambda nf, recv: recv},
      aggregate_edges_for_nodes_fn={"e1": agg("segment_max")})
  np.testing.assert_allclose(np.asarray(out_max.nodes["a"].features),
                             [[3.], [5.], [7.]])
  out_mean = mp.apply_graph_network(
      graph,
      update_edge_fn={"e1": lambda e, s, r: e},
      update_node_fn={"a": lambda nf, recv: recv},
      aggregate_edges_for_nodes_fn={"e1": agg("segment_mean")})
  np.testing.assert_allclose(np.asarray(out_mean.nodes["a"].features),
                             [[2.], [5.], [7.]])


# ---------------------------------------------------------------------------
# 3. Sparse transformer: key-set + forward parity (mha backend on CPU).
# ---------------------------------------------------------------------------

TCFG = dict(attention_k_hop=2, num_heads=2, num_layers=2, d_model=8,
            ffw_hidden=16, ffw_winit_mult=2.0, ffw_winit_final_mult=0.01,
            attn_winit_mult=2.0, attn_winit_final_mult=0.01,
            activation="gelu")


def _ring_adjacency(n):
  eye = np.eye(n, dtype=bool)
  adj = eye | np.roll(eye, 1, axis=1) | np.roll(eye, -1, axis=1)
  return sp.csr_matrix(adj)


def _ref_transformer_kwargs():
  return dict(attention_type="mha", mask_type="full",
              key_size=TCFG["d_model"] // TCFG["num_heads"],
              value_size=TCFG["d_model"] // TCFG["num_heads"],
              block_q=None, block_kv=None, block_kv_compute=None,
              block_q_dkv=None, block_kv_dkv=None, block_kv_dkv_compute=None,
              **TCFG)


def _our_transformer(adj):
  cfg = our_st.SparseTransformerConfig(
      attention_type="mha", mask_type="full",
      block_q=64, block_kv=64, **TCFG)
  return our_st.Transformer(adj, cfg)


def test_mesh_transformer_keyset_and_shapes():
  """Init the reference's MeshTransformer (the exact denoiser wiring,
  name='mesh_transformer') and require our converter to produce the
  identical flat key set — including the '~' scope from
  @hk.name_like('__init__') and the two unshared per-block
  norm-conditioning modules."""
  r = ref()
  n = 8
  adj = _ring_adjacency(n)
  senders, receivers = _ring_edges(n)

  def ref_fwd(feat, cond):
    mt = r.transformer.MeshTransformer(
        name="mesh_transformer",
        transformer_ctor=r.st.Transformer,
        transformer_kwargs=_ref_transformer_kwargs())
    graph = _ref_graph(
        r, {"mesh_nodes": feat},
        {"mesh": ("mesh_nodes", "mesh_nodes", senders, receivers,
                  jnp.zeros((len(senders), 1, 1)))})
    return mt(graph, cond)

  ref_params = r.hk.transform(ref_fwd).init(
      jax.random.PRNGKey(0), jnp.ones((n, 1, TCFG["d_model"])),
      jnp.ones((1, COND)))

  ours = _our_transformer(adj)
  our_params = ours.init(jax.random.PRNGKey(0), cond_size=COND)
  converted = haiku_checkpoint.native_gencast_params_to_haiku(
      {"noise_encoder": {}, "architecture": {"mesh_transformer": our_params}})

  assert _flat_shapes(converted) == _flat_shapes(ref_params)


def test_transformer_forward_parity():
  r = ref()
  n = 8
  adj = _ring_adjacency(n)
  x = jnp.asarray(
      np.random.RandomState(0).randn(BATCH, n, TCFG["d_model"])
      .astype(np.float32))
  cond = jnp.asarray(
      np.random.RandomState(1).randn(BATCH, COND).astype(np.float32))

  def ref_fwd(x, cond):
    t = r.st.Transformer(adj_mat=adj, **_ref_transformer_kwargs())
    return t(x, cond)

  t = r.hk.transform(ref_fwd)
  ref_params = t.init(jax.random.PRNGKey(3), x, cond)
  ref_out = t.apply(ref_params, None, x, cond)

  # Standalone Transformer keys have prefix 'transformer/'; re-prefix to the
  # denoiser context so the GenCast converter applies.
  prefixed = {"mesh_transformer/~/" + k: v for k, v in
              _to_native_values(ref_params).items()}
  native = haiku_checkpoint.gencast_haiku_params_to_native(prefixed)
  our_params = native["architecture"]["mesh_transformer"]

  ours = _our_transformer(adj)
  our_out = ours.apply(our_params, x, cond)
  np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out),
                             rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# 4. FourierFeaturesMLP (noise-level encoder): keys + forward.
# ---------------------------------------------------------------------------


def _make_ref_fourier_cls():
  """Structural replica of the reference's FourierFeaturesMLP
  (denoiser.py:41-97); the class NAME matters — haiku derives the module
  scope 'fourier_features_mlp' from it."""
  r = ref()
  hk = r.hk
  from graphcast_tpu.models.denoiser import fourier_features

  class FourierFeaturesMLP(hk.Module):

    def __init__(self, base_period, num_frequencies, output_sizes,
                 apply_log_first):
      super().__init__()
      self._base_period = base_period
      self._num_frequencies = num_frequencies
      self._apply_log_first = apply_log_first
      self._mlp = hk.nets.MLP(
          output_sizes=output_sizes,
          w_init=hk.initializers.VarianceScaling(2.0, "fan_in", "uniform"),
          activation=jax.nn.gelu)

    def __call__(self, values):
      if self._apply_log_first:
        values = jnp.log(values)
      return self._mlp(
          fourier_features(values, self._base_period, self._num_frequencies))

  return FourierFeaturesMLP


def test_fourier_mlp_keyset_and_forward():
  r = ref()
  cfg = NoiseEncoderConfig(num_frequencies=8, output_sizes=(16, 8))
  cls = _make_ref_fourier_cls()

  def ref_fwd(values):
    return cls(cfg.base_period, cfg.num_frequencies, list(cfg.output_sizes),
               cfg.apply_log_first)(values)

  values = jnp.asarray([0.5, 1.5])
  t = r.hk.transform(ref_fwd)
  ref_params = t.init(jax.random.PRNGKey(0), values)
  ref_out = t.apply(ref_params, None, values)

  ours = OurFourierMLP(cfg)
  our_params = ours.init(jax.random.PRNGKey(0))
  converted = haiku_checkpoint.native_gencast_params_to_haiku(
      {"noise_encoder": our_params, "architecture": {}})
  assert _flat_shapes(converted) == _flat_shapes(ref_params)

  native = haiku_checkpoint.gencast_haiku_params_to_native(
      _to_native_values(ref_params))
  our_out = ours.apply(native["noise_encoder"], values)
  np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out),
                             rtol=1e-6)


# ---------------------------------------------------------------------------
# 5. Full tiny-GenCast key-set parity (all four submodules together).
# ---------------------------------------------------------------------------


def test_gencast_full_keyset_parity():
  """Our tiny GenCast's converted params == reference-side init of the same
  four modules (noise encoder + grid2mesh GNN + mesh transformer + mesh2grid
  GNN) with matching configs — KEY SETS (shapes are covered per-module)."""
  r = ref()
  from graphcast_tpu import train
  from tests.test_gencast import make_batch, tiny_gencast

  predictor = tiny_gencast()
  inputs, targets, forcings = make_batch(batch=1)
  params = predictor.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  trainable, _ = train.partition_params(params)
  converted = haiku_checkpoint.native_gencast_params_to_haiku(trainable)

  # Reference side, mirroring tiny_gencast(): latent 16, hidden 1, d_model 16,
  # 2 layers, 2 heads, ffw 32, noise encoder (16, 8) with 8 frequencies.
  latent = 16
  n_mesh, n_grid = 8, 20
  g2m_s, g2m_r = _bipartite_edges(n_grid, n_mesh, seed=3)
  m2g_s, m2g_r = _bipartite_edges(n_mesh, n_grid, seed=4)
  mesh_s, mesh_r = _ring_edges(n_mesh)
  adj_kwargs = dict(attention_type="mha", mask_type="full",
                    attention_k_hop=2, num_heads=2, num_layers=2,
                    d_model=latent, ffw_hidden=32,
                    key_size=8, value_size=8,
                    ffw_winit_mult=2.0, ffw_winit_final_mult=0.0,
                    attn_winit_mult=2.0, attn_winit_final_mult=0.0,
                    activation="gelu",
                    block_q=None, block_kv=None, block_kv_compute=None,
                    block_q_dkv=None, block_kv_dkv=None,
                    block_kv_dkv_compute=None)
  fourier_cls = _make_ref_fourier_cls()

  def gnn_kwargs(**over):
    base = dict(
        activation="swish", aggregate_normalization=None,
        embed_edges=True, embed_nodes=True,
        include_sent_messages_in_node_update=False,
        mlp_hidden_size=latent, mlp_num_hidden_layers=1,
        num_message_passing_steps=1, use_layer_norm=True,
        use_norm_conditioning=True)
    base.update(over)
    return base

  def ref_fwd(noise, cond):
    enc = fourier_cls(16.0, 8, [16, 8], True)(noise)
    g2m = r.dtgn.DeepTypedGraphNet(
        name="grid2mesh_gnn",
        edge_latent_size=dict(grid2mesh=latent),
        node_latent_size=dict(grid_nodes=latent, mesh_nodes=latent),
        node_output_size=None,
        **gnn_kwargs(f32_aggregation=True))
    g = _ref_graph(
        r,
        {"grid_nodes": jnp.ones((n_grid, 1, 7)),
         "mesh_nodes": jnp.ones((n_mesh, 1, 5))},
        {"grid2mesh": ("grid_nodes", "mesh_nodes", g2m_s, g2m_r,
                       jnp.ones((len(g2m_s), 1, 4)))})
    g = g2m(g, cond)
    mt = r.transformer.MeshTransformer(
        name="mesh_transformer", transformer_ctor=r.st.Transformer,
        transformer_kwargs=adj_kwargs)
    mg = _ref_graph(
        r, {"mesh_nodes": g.nodes["mesh_nodes"].features},
        {"mesh": ("mesh_nodes", "mesh_nodes", mesh_s, mesh_r,
                  jnp.zeros((len(mesh_s), 1, 1)))})
    mg = mt(mg, cond)
    m2g = r.dtgn.DeepTypedGraphNet(
        name="mesh2grid_gnn",
        edge_latent_size=dict(mesh2grid=latent),
        node_latent_size=dict(grid_nodes=latent, mesh_nodes=latent),
        node_output_size=dict(grid_nodes=3),
        **gnn_kwargs(embed_nodes=False, f32_aggregation=False))
    g2 = _ref_graph(
        r,
        {"grid_nodes": g.nodes["grid_nodes"].features,
         "mesh_nodes": mg.nodes["mesh_nodes"].features},
        {"mesh2grid": ("mesh_nodes", "grid_nodes", m2g_s, m2g_r,
                       jnp.ones((len(m2g_s), 1, 4)))})
    return m2g(g2, cond), enc

  ref_params = r.hk.transform(ref_fwd).init(
      jax.random.PRNGKey(0), jnp.asarray([1.0]), jnp.ones((1, 8)))

  assert set(converted) == set(ref_params), (
      sorted(set(converted) ^ set(ref_params)))
  for mod in converted:
    assert set(converted[mod]) == set(ref_params[mod]), mod


# ---------------------------------------------------------------------------
# 6. Cross-serializer round-trips with the reference's checkpoint.py.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _Inner:
  label: str
  weights: dict


@dataclasses.dataclass
class _Bundle:
  params: dict
  inner: _Inner
  description: str
  count: int


def _tiny_bundle():
  return _Bundle(
      params={
          "grid2mesh_gnn/~_networks_builder/encoder_edges_grid2mesh_mlp/~/"
          "linear_0": {
              "w": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": np.zeros(3, np.float32)},
      },
      inner=_Inner(label="x", weights={"k": np.float32(2.5)}),
      description="cross-serializer test",
      count=7)


def _assert_bundle_equal(a, b):
  assert a.description == b.description
  assert a.count == b.count
  assert a.inner.label == b.inner.label
  np.testing.assert_array_equal(a.inner.weights["k"], b.inner.weights["k"])
  assert set(a.params) == set(b.params)
  for k in a.params:
    for leaf in a.params[k]:
      np.testing.assert_array_equal(a.params[k][leaf], b.params[k][leaf])


def test_our_dump_loads_with_reference_checkpoint():
  r = ref()
  bundle = _tiny_bundle()
  buf = io.BytesIO()
  checkpoint_lib.dump(buf, bundle)
  buf.seek(0)
  loaded = r.checkpoint.load(buf, _Bundle)
  _assert_bundle_equal(bundle, loaded)


def test_reference_dump_loads_with_our_checkpoint():
  r = ref()
  bundle = _tiny_bundle()
  buf = io.BytesIO()
  r.checkpoint.dump(buf, bundle)
  buf.seek(0)
  loaded = checkpoint_lib.load(buf, _Bundle)
  _assert_bundle_equal(bundle, loaded)


# ---------------------------------------------------------------------------
# Geometry: icosahedral multi-mesh vs the reference's own icosahedral_mesh.py
# (importable here: numpy/scipy only). Our construction derives face
# orientation from the convex hull instead of the reference's hand-checked
# face table (icosahedral_mesh.py:122-142), which makes the *labeling* of
# vertices differ from refinement level 1 on (midpoint vertices are created
# in face-iteration order). Exact array-order equality is therefore neither
# expected nor required: grid nodes keep their lat/lon order, the GNN is
# mesh-node-permutation-equivariant (tests/test_geometry.py asserts model
# invariance to mesh reordering), and no learned parameter is indexed by
# mesh-node id. What IS required — and asserted exactly here — is that a
# position-derived bijection exists under which vertices (to float32
# rounding), triangular faces (up to cyclic rotation), and directed edge
# sets correspond exactly, at every refinement level and for the merged
# multi-mesh. Reference: icosahedral_mesh.py:59-281.
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _ref_ico():
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "ref_icosahedral_mesh",
      f"{REFERENCE_PATH}/graphcast/icosahedral_mesh.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def _vertex_bijection(ours_v, ref_v):
  """perm[i] = reference index of our vertex i; asserts it is a bijection
  and that matched positions agree to float32 resolution."""
  from scipy.spatial import cKDTree
  dist, perm = cKDTree(ref_v.astype(np.float64)).query(
      ours_v.astype(np.float64))
  assert len(set(perm.tolist())) == len(perm), "not a bijection"
  # ~1e-7 = few-ulp float32 rounding from the different intermediate dtypes
  # (the reference rounds to float32 before rotating; we rotate in float64).
  assert dist.max() < 1e-6, f"vertex positions diverge: {dist.max()}"
  return perm


def _cyclic_face_set(faces):
  out = set()
  for a, b, c in np.asarray(faces).tolist():
    out.add(min([(a, b, c), (b, c, a), (c, a, b)]))
  return out


@pytest.mark.parametrize("splits", [0, 1, 2, 3, 4])
def test_icosahedron_hierarchy_isomorphic_to_reference(splits):
  from graphcast_tpu.geometry import icosahedron as ours
  r = _ref_ico()
  ref_meshes = r.get_hierarchy_of_triangular_meshes_for_sphere(splits)
  our_meshes = ours.get_mesh_hierarchy(splits)
  assert len(ref_meshes) == len(our_meshes) == splits + 1
  for rm, om in zip(ref_meshes, our_meshes):
    assert rm.vertices.shape == om.vertices.shape
    assert rm.faces.shape == om.faces.shape
    perm = _vertex_bijection(om.vertices, rm.vertices)
    # Faces: identical triangle set with identical orientation.
    assert _cyclic_face_set(perm[om.faces]) == _cyclic_face_set(rm.faces)
    # Directed edges (faces_to_edges): identical set under the bijection.
    rs, rr = r.faces_to_edges(rm.faces)
    os_, or_ = ours.faces_to_edges(om.faces)
    assert (set(zip(perm[os_].tolist(), perm[or_].tolist()))
            == set(zip(rs.tolist(), rr.tolist())))


def test_merged_multimesh_isomorphic_to_reference():
  from graphcast_tpu.geometry import icosahedron as ours
  r = _ref_ico()
  splits = 3
  ref_merged = r.merge_meshes(
      r.get_hierarchy_of_triangular_meshes_for_sphere(splits))
  our_merged = ours.merge_meshes(ours.get_mesh_hierarchy(splits))
  assert ref_merged.vertices.shape == our_merged.vertices.shape
  assert ref_merged.faces.shape == our_merged.faces.shape
  perm = _vertex_bijection(our_merged.vertices, ref_merged.vertices)
  assert (_cyclic_face_set(perm[our_merged.faces])
          == _cyclic_face_set(ref_merged.faces))
  # The multi-mesh edge multiset (levels contribute duplicate edges at
  # shared coarse vertices) must match as a multiset, not just a set.
  import collections
  rs, rr = r.faces_to_edges(ref_merged.faces)
  os_, or_ = ours.faces_to_edges(our_merged.faces)
  ref_edges = collections.Counter(zip(rs.tolist(), rr.tolist()))
  our_edges = collections.Counter(
      zip(perm[os_].tolist(), perm[or_].tolist()))
  assert ref_edges == our_edges


@pytest.mark.parametrize("splits", [5, 6])
def test_fine_mesh_vertex_sets_match_reference(splits):
  """Spot-check the production mesh sizes: bijection + position agreement."""
  from graphcast_tpu.geometry import icosahedron as ours
  r = _ref_ico()
  ref_mesh = r.get_last_triangular_mesh_for_sphere(splits)
  our_mesh = ours.get_mesh_hierarchy(splits)[-1]
  assert ref_mesh.vertices.shape == our_mesh.vertices.shape
  _vertex_bijection(our_mesh.vertices, ref_mesh.vertices)


# ---------------------------------------------------------------------------
# Channel stacking: fields.to_stacked / from_stacked vs the reference's own
# model_utils.dataset_to_stacked / stacked_to_dataset (model_utils.py:626-720)
# executed against tests/fake_xarray (the same technique the solar-radiation
# golden test uses). The sorted-variable channel order is load-bearing for
# checkpoint compatibility; this pins it to the reference function itself.
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _ref_model_utils():
  from tests import fake_xarray
  fake_xarray.install_if_missing()
  if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
  from graphcast import model_utils as ref_mu
  return ref_mu


def _mixed_stack_case():
  """Mixed surface/level/static/1-D variables, insertion order unsorted."""
  rs = np.random.RandomState(7)
  b, t, lev, lat, lon = 2, 3, 4, 5, 6
  arrays = {
      "zz_surface": rs.randn(b, t, lat, lon).astype(np.float32),
      "aa_levels": rs.randn(b, t, lev, lat, lon).astype(np.float32),
      "mm_static": rs.randn(lat, lon).astype(np.float32),
      "bb_lat_only": rs.randn(lat).astype(np.float32),
  }
  dims = {
      "zz_surface": ("batch", "time", "lat", "lon"),
      "aa_levels": ("batch", "time", "level", "lat", "lon"),
      "mm_static": ("lat", "lon"),
      "bb_lat_only": ("lat",),
  }
  return arrays, dims, dict(batch=b, time=t, level=lev, lat=lat, lon=lon)


def _as_ref_dataset(arrays, dims):
  from tests import fake_xarray
  xr = fake_xarray.install_if_missing()
  return xr.Dataset(
      {k: xr.DataArray(v, dims=dims[k]) for k, v in arrays.items()},
      coords={})


def _as_fieldset(arrays, dims):
  from graphcast_tpu import fields as fields_lib
  return fields_lib.FieldSet(
      {k: fields_lib.Field(jnp.asarray(v), dims[k])
       for k, v in arrays.items()})


def test_to_stacked_matches_reference_dataset_to_stacked():
  from graphcast_tpu import fields as fields_lib
  ref_mu = _ref_model_utils()
  arrays, dims, sizes = _mixed_stack_case()

  ref_stacked = ref_mu.dataset_to_stacked(
      _as_ref_dataset(arrays, dims), sizes=sizes)
  assert ref_stacked.dims == ("batch", "lat", "lon", "channels")

  ours = fields_lib.to_stacked(_as_fieldset(arrays, dims), sizes=sizes)
  np.testing.assert_array_equal(np.asarray(ours), ref_stacked.data)

  # The order is a property of sorted names, not insertion order: a reversed
  # insertion order must produce the identical stacked array.
  rev = {k: arrays[k] for k in reversed(list(arrays))}
  ours_rev = fields_lib.to_stacked(_as_fieldset(rev, dims), sizes=sizes)
  np.testing.assert_array_equal(np.asarray(ours_rev), ref_stacked.data)

  # Mutation check: an *unsorted* channel order is actually different data
  # (guards against this test passing vacuously on symmetric inputs).
  parts = [fields_lib.field_to_stacked(
      fields_lib.Field(jnp.asarray(arrays[k]), dims[k]), sizes)
      for k in rev]  # reversed == unsorted
  mutated = jnp.concatenate(parts, axis=-1)
  assert not np.array_equal(np.asarray(mutated), ref_stacked.data)


def test_from_stacked_matches_reference_stacked_to_dataset():
  """Inverse round-trip: both unstackers recover the same variables from the
  same stacked array (template vars all carry the preserved dims, as the
  reference requires: model_utils.py:691-696)."""
  from graphcast_tpu import fields as fields_lib
  ref_mu = _ref_model_utils()
  from tests import fake_xarray
  xr = fake_xarray.install_if_missing()

  rs = np.random.RandomState(11)
  b, t, lev, lat, lon = 2, 2, 3, 4, 5
  arrays = {
      "tt_sfc": rs.randn(b, t, lat, lon).astype(np.float32),
      "cc_lvl": rs.randn(b, t, lev, lat, lon).astype(np.float32),
      "qq_flat": rs.randn(b, lat, lon).astype(np.float32),
  }
  dims = {
      "tt_sfc": ("batch", "time", "lat", "lon"),
      "cc_lvl": ("batch", "time", "level", "lat", "lon"),
      "qq_flat": ("batch", "lat", "lon"),
  }
  sizes = dict(batch=b, time=t, level=lev, lat=lat, lon=lon)
  fs = _as_fieldset(arrays, dims)
  ds = _as_ref_dataset(arrays, dims)

  stacked = fields_lib.to_stacked(fs, sizes=sizes)
  ref_stacked = ref_mu.dataset_to_stacked(ds, sizes=sizes)
  np.testing.assert_array_equal(np.asarray(stacked), ref_stacked.data)

  ours_back = fields_lib.from_stacked(stacked, fs)
  ref_back = ref_mu.stacked_to_dataset(
      xr.Variable(("batch", "lat", "lon", "channels"), np.asarray(stacked)),
      ds)
  for name in arrays:
    np.testing.assert_array_equal(
        np.asarray(ours_back.data(name)), arrays[name])
    assert ref_back[name].dims == dims[name]
    np.testing.assert_array_equal(ref_back[name].data, arrays[name])
    np.testing.assert_array_equal(
        np.asarray(ours_back.data(name)), ref_back[name].data)


def test_stacked_channel_count_matches_reference():
  from graphcast_tpu import fields as fields_lib
  ref_mu = _ref_model_utils()
  arrays, dims, sizes = _mixed_stack_case()
  ref_stacked = ref_mu.dataset_to_stacked(
      _as_ref_dataset(arrays, dims), sizes=sizes)
  assert fields_lib.stacked_channels(
      _as_fieldset(arrays, dims)) == ref_stacked.sizes["channels"]
