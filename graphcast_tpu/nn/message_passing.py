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

from typing import Callable, Mapping, Optional

import jax.numpy as jnp

from graphcast_tpu.nn.typed_graph import TypedGraph
from graphcast_tpu.ops import segment

# An update fn takes (*feature_arrays) concatenated on the last axis.
UpdateFn = Callable[..., jnp.ndarray]
AggregateFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


def default_aggregation(data, receivers, num_nodes, edge_set_name=None):
  del edge_set_name
  return segment.aggregate_edges_for_nodes(data, receivers, num_nodes)


def apply_graph_network(
    graph: TypedGraph,
    *,
    update_edge_fn: Mapping[str, UpdateFn],
    update_node_fn: Mapping[str, UpdateFn],
    aggregate_edges_for_nodes_fn: AggregateFn = default_aggregation,
    include_sent_messages_in_node_update: bool = False,
    factored_edge_fns: bool = False,
    update_global_fn: Optional[UpdateFn] = None,
) -> TypedGraph:
  """One step of typed-graph message passing (InteractionNetwork semantics).

  Edge sets named in ``update_edge_fn`` are updated first; node sets named in
  ``update_node_fn`` are then updated using the *updated* edges.

  With ``factored_edge_fns`` the edge fns receive the *full* node feature
  arrays plus indices — fn(edge_feats, sender_full, receiver_full, senders,
  receivers) — enabling the factored first-layer optimization (project per
  node, then gather) instead of gather-then-project.
  """
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
      new_feats = edge_fn(edge_set.features, sender_full, receiver_full,
                          senders, receivers)
    else:
      new_feats = edge_fn(edge_set.features, sender_full[senders],
                          receiver_full[receivers])
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
          # Sender aggregation is unsorted; never use fused receiver kernels.
          inputs.append(aggregate_edges_for_nodes_fn(
              edge_set.features, edge_set.indices.senders, num_nodes,
              edge_set_name=None))
    for key, edge_set in graph.edges.items():
      if key.node_sets[1] == node_set_name:
        inputs.append(aggregate_edges_for_nodes_fn(
            edge_set.features, edge_set.indices.receivers, num_nodes,
            edge_set_name=key.name))
    updated_nodes[node_set_name] = node_set._replace(
        features=node_fn(*inputs))
  graph = graph._replace(nodes=updated_nodes)

  # --- optional global update (reference: typed_graph_net.py:187-225) ---
  if update_global_fn is not None:
    inputs = []
    if hasattr(graph.context.features, "shape"):
      inputs.append(graph.context.features)
    for key, edge_set in graph.edges.items():
      # Single-graph convention: aggregate all edges to one vector.
      inputs.append(jnp.sum(edge_set.features, axis=0))
    for name, node_set in graph.nodes.items():
      inputs.append(jnp.sum(node_set.features, axis=0))
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
