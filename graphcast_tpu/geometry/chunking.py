"""Host-side planning for chunked, memory-bounded GNN evaluation.

The chunked grid2mesh encoder (models/graphcast.py, models/denoiser.py)
splits the edge set into sequential chunks so peak memory scales with
E/num_chunks. Round-1 chunked by raw edge index and accumulated into a full
[num_nodes, B, C] f32 buffer with one segment_sum per chunk — at 0.25° those
repeated full-array updates were the single hottest op (57 ms standalone).

This module plans **balanced node-aligned chunks** instead: chunk boundaries
are placed on receiver-node boundaries (edges are receiver-sorted) such that
every chunk carries ≈ E/k edges, then each chunk's edges/nodes are padded to
the common maximum so a lax.map over chunks is shape-uniform. Each chunk
aggregates into its OWN small [max_nodes, B, C] output (receivers are
chunk-local), and the per-chunk outputs are reassembled with one gather — so
the full-size accumulator and its O(k) full-array traffic disappear.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class NodeChunkPlan:
  """Balanced node-aligned chunking of a receiver-sorted edge list."""
  num_chunks: int
  num_nodes: int
  num_edges: int
  max_nodes: int           # padded node count per chunk
  max_edges: int           # padded edge count per chunk
  node_bounds: np.ndarray  # [k+1] node-range boundaries
  # [k * max_edges] int64 into the original edge arrays; padding slots = E.
  edge_layout: np.ndarray
  # [k * max_edges] int32 receiver LOCAL to the chunk; padding = max_nodes
  # (out of range for a num_segments=max_nodes segment_sum ⇒ dropped; real
  # ids stay sorted because padding sits at the end of each chunk).
  local_receivers: np.ndarray
  # [num_nodes] int32 into the flattened [k * max_nodes] per-chunk outputs.
  node_gather: np.ndarray

  @property
  def expansion(self) -> float:
    return self.num_chunks * self.max_edges / max(self.num_edges, 1)

  def pad_edge_array(self, array: np.ndarray, fill=0) -> np.ndarray:
    """Reorders a per-edge host array into the [k * max_edges] padded
    chunk layout (padding slots = `fill`)."""
    array = np.asarray(array)
    out = np.full((self.edge_layout.shape[0],) + array.shape[1:], fill,
                  array.dtype)
    valid = self.edge_layout < self.num_edges
    out[valid] = array[self.edge_layout[valid]]
    return out


def plan_balanced_node_chunks(receivers: np.ndarray, num_nodes: int,
                              num_chunks: int) -> NodeChunkPlan:
  """Plans `num_chunks` node-aligned chunks with ≈ equal edge counts.

  Args:
    receivers: [E] non-decreasing receiver node ids.
    num_nodes: total receiver-node count.
    num_chunks: requested chunk count (clamped to [1, num_nodes]).
  """
  receivers = np.asarray(receivers, np.int32)
  if receivers.size and (np.diff(receivers) < 0).any():
    raise ValueError("receivers must be sorted")
  num_edges = int(receivers.shape[0])
  k = max(1, min(int(num_chunks), num_nodes))

  counts = np.bincount(receivers, minlength=num_nodes)
  offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

  # Node boundaries at ~equal cumulative edge counts.
  targets = (np.arange(1, k) * num_edges) / k
  inner = np.searchsorted(offsets[1:num_nodes], targets, side="left") + 1
  node_bounds = np.concatenate([[0], inner, [num_nodes]]).astype(np.int64)
  node_bounds = np.maximum.accumulate(node_bounds)  # monotone under ties

  node_counts = np.diff(node_bounds)
  edge_starts = offsets[node_bounds[:-1]]
  edge_ends = offsets[node_bounds[1:]]
  edge_counts = edge_ends - edge_starts
  max_nodes = int(node_counts.max()) if k else 1
  max_edges = max(int(edge_counts.max()), 1)

  edge_layout = np.full(k * max_edges, num_edges, np.int64)
  local_receivers = np.full(k * max_edges, max_nodes, np.int32)
  node_gather = np.zeros(num_nodes, np.int32)
  for i in range(k):
    dst = i * max_edges
    span = int(edge_counts[i])
    edge_layout[dst:dst + span] = np.arange(edge_starts[i], edge_ends[i])
    local_receivers[dst:dst + span] = (
        receivers[edge_starts[i]:edge_ends[i]] - node_bounds[i])
    lo, hi = int(node_bounds[i]), int(node_bounds[i + 1])
    node_gather[lo:hi] = i * max_nodes + np.arange(hi - lo, dtype=np.int32)

  return NodeChunkPlan(
      num_chunks=k, num_nodes=num_nodes, num_edges=num_edges,
      max_nodes=max_nodes, max_edges=max_edges, node_bounds=node_bounds,
      edge_layout=edge_layout, local_receivers=local_receivers,
      node_gather=node_gather)
