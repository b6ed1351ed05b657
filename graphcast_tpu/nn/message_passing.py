"""Typed-graph message passing (reference: graphcast/typed_graph_net.py).

Functional (params-in, graph-out) re-implementation of the Graph Nets
algorithm over TypedGraphs, specialized for the TPU layout
[entities, batch, channels] with static, receiver-sorted edge indices:

- edge update: gather sender/receiver node features, concat with edge
  features, apply the edge update function (reference:
  typed_graph_net.py:130-152);
- node update: aggregate incoming (and optionally outgoing) updated edge
  messages with a segment sum, concat with node features, apply the node
  update function (reference: typed_graph_net.py:155-184).

The hot ops are the gather ``nodes[senders]`` and the scatter-add
``segment_sum(messages, receivers)``; both are pure XLA here (a fused Pallas
path lives in graphcast_tpu/ops/pallas_mp.py).
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Union

import jax.numpy as jnp

from graphcast_tpu.nn.typed_graph import TypedGraph
from graphcast_tpu.ops import segment

# An update fn takes (*feature_arrays) concatenated on the last axis.
UpdateFn = Callable[..., jnp.ndarray]
AggregateFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


def default_aggregation(data, receivers, num_nodes, edge_set_name=None,
                        indices_are_sorted=True):
  del edge_set_name
  return segment.aggregate_edges_for_nodes(
      data, receivers, num_nodes, indices_are_sorted=indices_are_sorted)


def _has_context(graph: TypedGraph) -> bool:
  f = graph.context.features
  return hasattr(f, "shape") and getattr(f, "size", 0)


def _broadcast_context(graph: TypedGraph, like) -> jnp.ndarray:
  """Globals repeated per entity (reference: typed_graph_net.py:146-152,
  jnp.repeat over graph ids; single-graph convention ⇒ broadcast)."""
  ctx = graph.context.features
  return jnp.broadcast_to(
      ctx[None], like.shape[:-1] + ctx.shape[-1:]).astype(like.dtype)


def apply_graph_network(
    graph: TypedGraph,
    *,
    update_edge_fn: Mapping[str, UpdateFn],
    update_node_fn: Mapping[str, UpdateFn],
    aggregate_edges_for_nodes_fn: Union[
        AggregateFn, Mapping[str, AggregateFn]] = default_aggregation,
    include_sent_messages_in_node_update: bool = False,
    factored_edge_fns: bool = False,
    update_global_fn: Optional[UpdateFn] = None,
    aggregate_nodes_for_globals_fn: Optional[AggregateFn] = None,
    aggregate_edges_for_globals_fn: Optional[AggregateFn] = None,
) -> TypedGraph:
  """One step of typed-graph message passing (GraphNetwork semantics,
  reference: typed_graph_net.py:41-225).

  Edge sets named in ``update_edge_fn`` are updated first; node sets named in
  ``update_node_fn`` are then updated using the *updated* edges; finally the
  optional global update aggregates every node/edge set onto the context.

  If the graph has context (global) features, they are broadcast per-edge
  and per-node and appended to the edge/node update inputs, mirroring the
  reference's global-to-edge/node repeat (typed_graph_net.py:146-152,
  177-181; single graph per array here, so repeat == broadcast).

  ``aggregate_edges_for_nodes_fn`` may be a single aggregator or a mapping
  from edge-set name to aggregator (e.g. mean for one edge set, sum for
  another); aggregators take (data, indices, num_nodes, edge_set_name=).

  With ``factored_edge_fns`` the edge fns receive the *full* node feature
  arrays plus indices — fn(edge_feats, sender_full, receiver_full, senders,
  receivers) — enabling the factored first-layer optimization (project per
  node, then gather) instead of gather-then-project.
  """
  has_ctx = _has_context(graph)
  if isinstance(aggregate_edges_for_nodes_fn, Mapping):
    edge_aggregators = aggregate_edges_for_nodes_fn
    def aggregate(data, idx, num, edge_set_name=None,
                  indices_are_sorted=True):
      fn = edge_aggregators.get(edge_set_name, default_aggregation)
      return fn(data, idx, num, edge_set_name=edge_set_name,
                indices_are_sorted=indices_are_sorted)
  else:
    aggregate = aggregate_edges_for_nodes_fn

  # --- edge updates ---
  updated_edges = dict(graph.edges)
  for name, edge_fn in update_edge_fn.items():
    key = graph.edge_key_by_name(name)
    edge_set = graph.edges[key]
    senders = edge_set.indices.senders
    receivers = edge_set.indices.receivers
    sender_full = graph.nodes[key.node_sets[0]].features
    receiver_full = graph.nodes[key.node_sets[1]].features
    if factored_edge_fns:
      if has_ctx:
        raise ValueError(
            "factored edge updates don't support global-to-edge broadcast; "
            "concat context onto nodes first (as DeepGraphNet does) or use "
            "factored_edge_fns=False")
      new_feats = edge_fn(edge_set.features, sender_full, receiver_full,
                          senders, receivers)
    else:
      inputs = [edge_set.features, sender_full[senders],
                receiver_full[receivers]]
      if has_ctx:
        inputs.append(_broadcast_context(graph, edge_set.features))
      new_feats = edge_fn(*inputs)
    updated_edges[key] = edge_set._replace(features=new_feats)
  graph = graph._replace(edges=updated_edges)

  # --- node updates ---
  updated_nodes = dict(graph.nodes)
  for node_set_name, node_fn in update_node_fn.items():
    node_set = graph.nodes[node_set_name]
    num_nodes = node_set.features.shape[0]
    inputs = [node_set.features]
    if include_sent_messages_in_node_update:
      for key, edge_set in graph.edges.items():
        if key.node_sets[0] == node_set_name:
          # Edge lists are receiver-sorted, so sender ids are UNSORTED here;
          # aggregators must take the unsorted path (and fused
          # receiver-layout kernels must not engage).
          inputs.append(aggregate(
              edge_set.features, edge_set.indices.senders, num_nodes,
              edge_set_name=key.name, indices_are_sorted=False))
    for key, edge_set in graph.edges.items():
      if key.node_sets[1] == node_set_name:
        inputs.append(aggregate(
            edge_set.features, edge_set.indices.receivers, num_nodes,
            edge_set_name=key.name))
    if has_ctx:
      inputs.append(_broadcast_context(graph, node_set.features))
    updated_nodes[node_set_name] = node_set._replace(
        features=node_fn(*inputs))
  graph = graph._replace(nodes=updated_nodes)

  # --- optional global update (reference: typed_graph_net.py:187-225).
  # Single graph per array ⇒ the per-graph segment aggregation reduces to a
  # reduction over the entity axis. Input order matches the reference's
  # global_fn(node_features, edge_features, globals) flattened with
  # name-sorted dicts (jraph.concatenated_args tree order).
  if update_global_fn is not None:
    def _reduce(agg_fn, feats):
      if agg_fn is None:
        return jnp.sum(feats, axis=0)  # reference default: segment_sum
      zeros = jnp.zeros((feats.shape[0],), dtype=jnp.int32)
      return agg_fn(feats, zeros, 1)[0]
    inputs = []
    for name in sorted(graph.nodes):
      inputs.append(_reduce(aggregate_nodes_for_globals_fn,
                            graph.nodes[name].features))
    for key in sorted(graph.edges, key=lambda k: k.name):
      inputs.append(_reduce(aggregate_edges_for_globals_fn,
                            graph.edges[key].features))
    if has_ctx:
      inputs.append(graph.context.features)
    graph = graph._replace(
        context=graph.context._replace(features=update_global_fn(*inputs)))
  return graph


def apply_graph_map_features(
    graph: TypedGraph,
    *,
    embed_edge_fn: Optional[Mapping[str, UpdateFn]] = None,
    embed_node_fn: Optional[Mapping[str, UpdateFn]] = None,
) -> TypedGraph:
  """Independently maps node/edge features (reference:
  typed_graph_net.py:278-317 GraphMapFeatures)."""
  updated_edges = dict(graph.edges)
  if embed_edge_fn:
    for name, fn in embed_edge_fn.items():
      key = graph.edge_key_by_name(name)
      updated_edges[key] = graph.edges[key]._replace(
          features=fn(graph.edges[key].features))
  updated_nodes = dict(graph.nodes)
  if embed_node_fn:
    for name, fn in embed_node_fn.items():
      updated_nodes[name] = graph.nodes[name]._replace(
          features=fn(graph.nodes[name].features))
  return graph._replace(edges=updated_edges, nodes=updated_nodes)


def receiving_edge_sets(graph: TypedGraph, node_set_name: str):
  """Edge set keys whose receiver is ``node_set_name``, in graph order."""
  return [k for k in graph.edges if k.node_sets[1] == node_set_name]


def sending_edge_sets(graph: TypedGraph, node_set_name: str):
  return [k for k in graph.edges if k.node_sets[0] == node_set_name]
