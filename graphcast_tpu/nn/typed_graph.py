"""Typed graph containers (reference: graphcast/typed_graph.py:45-97).

A ``TypedGraph`` holds multiple named node sets and named edge sets; each
edge set is keyed by its name plus the (sender_set, receiver_set) pair.

TPU-first conventions baked in:
- There is a single graph per array (no jraph-style flat batching); the batch
  axis lives *inside* the feature arrays as axis 1: features are
  [num_nodes, batch, channels] / [num_edges, batch, channels].
- Edge indices are static host numpy arrays, **sorted by receiver** at
  construction time so scatter-adds can use ``indices_are_sorted=True``
  (better XLA lowering on TPU).
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import numpy as np


class EdgesIndices(NamedTuple):
  senders: Any    # [num_edges] int32
  receivers: Any  # [num_edges] int32


class EdgeSet(NamedTuple):
  indices: EdgesIndices
  features: Any  # [num_edges, ...]


class NodeSet(NamedTuple):
  n_node: int
  features: Any  # [num_nodes, ...]


class Context(NamedTuple):
  features: Any  # () or [batch, channels]


class EdgeSetKey(NamedTuple):
  name: str
  node_sets: tuple[str, str]  # (sender node set, receiver node set)


class TypedGraph(NamedTuple):
  context: Context
  nodes: Mapping[str, NodeSet]
  edges: Mapping[EdgeSetKey, EdgeSet]

  def edge_key_by_name(self, name: str) -> EdgeSetKey:
    for key in self.edges:
      if key.name == name:
        return key
    raise KeyError(f"no edge set named {name!r}")

  def edge_set_by_name(self, name: str) -> EdgeSet:
    return self.edges[self.edge_key_by_name(name)]


def sort_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray,
                           *extras: np.ndarray):
  """Stable-sorts an edge list by receiver (then sender) index.

  Sorted receivers let segment-sum aggregations declare
  ``indices_are_sorted=True``. Returns (senders, receivers, *extras) sorted.
  """
  order = np.lexsort((senders, receivers))
  out = [senders[order].astype(np.int32), receivers[order].astype(np.int32)]
  out.extend(e[order] for e in extras)
  return tuple(out)
