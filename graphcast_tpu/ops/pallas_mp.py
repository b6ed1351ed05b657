"""Pallas TPU kernel: segment aggregation as one-hot MXU matmuls.

The message-passing hot op is the scatter-add of per-edge messages into
nodes (reference: jraph.segment_sum in typed_graph_net.py:160-176). XLA
lowers segment-sum to a serial scatter on TPU; this kernel instead exploits
two static properties of our graphs:

- edges are sorted by receiver (geometry compiler), so each *node block*'s
  incoming messages form one contiguous edge span;
- membership "edge e → node n" is a one-hot matrix, so a block-local
  aggregate is `onehot[bn, ek] @ messages[ek, C]` — a matmul the MXU eats,
  rather than a scatter the VPU serializes.

Host-side we precompute a chunk-aligned edge re-layout (each node block's
span padded to a multiple of the chunk size); on device the messages are
gathered into that layout once, then the kernel walks aligned chunks and
accumulates one-hot matmuls in f32 VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_offsets_from_sorted_receivers(receivers: np.ndarray,
                                      num_nodes: int) -> np.ndarray:
  """CSR row offsets [num_nodes+1] from a non-decreasing receiver list."""
  counts = np.bincount(receivers, minlength=num_nodes)
  return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)


def _agg_kernel(chunk_base, num_chunks, mask_ref,
                messages_ref, out_ref, acc_scr, *, block_nodes, chunk_edges,
                max_chunks):
  i = pl.program_id(0)
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _init():
    acc_scr[:] = jnp.zeros_like(acc_scr)

  @pl.when(j < num_chunks[i])
  def _compute():
    # One-hot membership from the bitpacked per-chunk mask (Mosaic cannot
    # tile 1-D int32 receiver blocks at arbitrary chunk sizes; uint32
    # bitmaps use standard 2-D tiling and unpack in-register).
    onehot = _unpack_receiver_mask(
        mask_ref[0], block_nodes, chunk_edges).astype(messages_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(
        onehot, messages_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(j == max_chunks - 1)
  def _finalize():
    out_ref[0] = acc_scr[:].astype(out_ref.dtype)


def _unpack_receiver_mask(packed, rows, cols):
  """[rows//32, cols] uint32 → [rows, cols] bool (row-packed, strided over
  the whole block: ops.splash._pack_mask_bits_rows / _unpack_mask_rows)."""
  from graphcast_tpu.ops.splash import _unpack_mask_rows
  return _unpack_mask_rows(packed, rows, cols, rows)


class BlockedSegmentSum:
  """Callable fused aggregation for a fixed receiver-sorted edge list.

  Two input modes:
  - default: messages arrive in the ORIGINAL edge order; they are gathered
    into the chunk-aligned layout on device first (one [L, C] gather);
  - ``padded_input=True``: messages already live in the chunk-aligned padded
    layout (length ``layout_length``) — e.g. because the edge set itself was
    baked into that layout host-side with :meth:`pad_edges` — and the kernel
    consumes them directly with NO runtime re-layout. This is the fast path
    for repeated aggregations over a static edge set (the 16-step mesh GNN).
  """

  def __init__(self, receivers: np.ndarray, num_nodes: int,
               block_nodes: int = 256, chunk_edges: int = 512,
               interpret: Optional[bool] = None,
               padded_input: bool = False,
               node_order: Optional[np.ndarray] = None):
    """``node_order``: optional node permutation [num_nodes] (position p
    holds node id node_order[p]). The kernel layout is then built over
    PERMUTED node positions — edges re-sorted by position, node blocks =
    contiguous position ranges — while the public interface stays in
    original node ids: ``__call__`` un-permutes its output, ``pad_edges``
    still takes original-edge-order arrays, and ``padded_receivers``
    returns original ids. Used to make the grid2mesh layout spatially
    coherent (latitude-banded mesh positions) so consecutive layout slots
    gather from a narrow sender window (ops/window_gather.py) — the
    refinement-order mesh ids scatter each receiver block's senders across
    ~0.8× of the grid table (round-5 analyze_g2m_senders)."""
    receivers = np.asarray(receivers, np.int32)
    if node_order is not None:
      perm = np.asarray(node_order, np.int32)
      if perm.shape != (num_nodes,):
        raise ValueError(f"node_order must have shape ({num_nodes},)")
      pos = np.empty(num_nodes, np.int32)
      pos[perm] = np.arange(num_nodes, dtype=np.int32)
      work_recv = pos[receivers]
      edge_sort = np.argsort(work_recv, kind="stable").astype(np.int64)
      work_recv = work_recv[edge_sort]
      self.node_order = perm
      self.node_pos = pos
    else:
      if receivers.size and (np.diff(receivers) < 0).any():
        raise ValueError("receivers must be sorted")
      work_recv = receivers
      edge_sort = None
      self.node_order = None
      self.node_pos = None
    self.num_nodes = num_nodes
    self.num_edges = int(receivers.shape[0])
    self.original_receivers = receivers
    self.block_nodes = block_nodes
    self.chunk_edges = chunk_edges
    self.padded_input = padded_input
    self._interpret = interpret

    offsets = row_offsets_from_sorted_receivers(work_recv, num_nodes)
    nb = -(-num_nodes // block_nodes)
    self.num_node_blocks = nb
    bounds = np.minimum(np.arange(nb + 1) * block_nodes, num_nodes)
    starts = offsets[bounds[:-1]]
    ends = offsets[bounds[1:]]
    spans = ends - starts
    chunks_per_block = -(-spans // chunk_edges)
    chunks_per_block = np.maximum(chunks_per_block, 0)
    self.max_chunks = max(1, int(chunks_per_block.max()))
    self.num_chunks = chunks_per_block.astype(np.int32)
    self.node_base = (np.arange(nb) * block_nodes).astype(np.int32)

    # Chunk-aligned re-layout: block i owns chunks
    # [chunk_base[i], chunk_base[i] + num_chunks[i]).
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_block)])
    self.chunk_base = chunk_base[:-1].astype(np.int32)
    total_chunks = int(chunk_base[-1])
    L = max(total_chunks, 1) * chunk_edges
    layout = np.full(L, self.num_edges, np.int64)  # → appended zero row
    recv_layout = np.full(L, num_nodes + 1, np.int32)  # never matches
    for i in range(nb):
      dst0 = chunk_base[i] * chunk_edges
      span_ids = np.arange(starts[i], ends[i])
      if edge_sort is not None:
        span_ids = edge_sort[span_ids]
      layout[dst0:dst0 + spans[i]] = span_ids
      recv_layout[dst0:dst0 + spans[i]] = work_recv[starts[i]:ends[i]]
    self.total_chunks = max(total_chunks, 1)
    self.layout_index = layout
    self.receivers_layout = recv_layout.reshape(self.total_chunks,
                                                chunk_edges)

  @property
  def layout_length(self) -> int:
    """Edge count of the chunk-aligned padded layout."""
    return self.total_chunks * self.chunk_edges

  @property
  def expansion(self) -> float:
    """Padded-layout size relative to the raw edge count."""
    return self.layout_index.shape[0] / max(self.num_edges, 1)

  def pad_edges(self, array: np.ndarray, fill=0) -> np.ndarray:
    """Host-side: reorders a per-edge array (original order) into the
    chunk-aligned padded layout; padding slots get `fill`.

    Used to bake edge sets (senders/receivers/features) into kernel layout
    at artifact/model build time so no runtime re-layout gather is needed.
    """
    array = np.asarray(array)
    out = np.full((self.layout_length,) + array.shape[1:], fill, array.dtype)
    valid = self.layout_index < self.num_edges
    out[valid] = array[self.layout_index[valid]]
    return out

  @property
  def padded_receivers(self) -> np.ndarray:
    """[layout_length] ORIGINAL-id receivers in padded layout (padding =
    num_nodes+1, dropped by both the kernel and jax segment ops). With
    ``node_order`` the layout itself is position-ordered, but this array
    maps slots back to original node ids for graph consumers."""
    rl = self.receivers_layout.reshape(-1).copy()
    if self.node_order is not None:
      valid = rl < self.num_nodes
      rl[valid] = self.node_order[rl[valid]]
    return rl

  @property
  def padded_positions(self) -> np.ndarray:
    """[layout_length] layout-position receivers (== padded_receivers when
    no node_order); internal: the VJP's output-grad gather rows."""
    return self.receivers_layout.reshape(-1).copy()

  def block_of_chunk(self) -> np.ndarray:
    """[total_chunks] node-block id per chunk (layout is block-major)."""
    block_of = np.zeros(self.total_chunks, np.int32)
    for i in range(self.num_node_blocks):
      hi = (self.chunk_base[i + 1] if i + 1 < self.num_node_blocks
            else self.total_chunks)
      block_of[self.chunk_base[i]:hi] = i
    return block_of

  def onehot_masks(self):
    """Cached bitpacked per-chunk one-hot membership masks.

    Returns (mask [tc, bn//32, cs], mask_t [tc, cs//32, bn]) uint32, where
    the unpacked mask[c][v, e] says edge-slot e of chunk c points at local
    node v of the chunk's node block. Bits are packed along the ROW axis
    (splash._pack_mask_bits_rows) so the tiled device layout is compact —
    the old lane-packed [tc, cs, bn//32] layout cost a 16×-padded XLA
    layout copy (161 MB at 0.25°/mesh-6). mask rows pack strided over the
    whole bn block; mask_t rows pack per splash.mask_row_group(cs) group so
    the fused-edge backward may slice sub-chunks.
    """
    if getattr(self, "_onehot_masks", None) is not None:
      return self._onehot_masks
    from graphcast_tpu.ops.splash import _pack_mask_bits_rows, mask_row_group
    bn, cs, tc = self.block_nodes, self.chunk_edges, self.total_chunks
    if bn % 32 or cs % 32:
      raise ValueError("block_nodes/chunk_edges must be multiples of 32")
    block_of = self.block_of_chunk()
    rloc = self.receivers_layout.astype(np.int64)
    node_base = self.node_base[block_of].astype(np.int64)
    local = rloc - node_base[:, None]
    ids = np.arange(bn, dtype=np.int64)
    onehot = local[:, None, :] == ids[None, :, None]       # [tc, bn, cs]
    mask = _pack_mask_bits_rows(onehot, bn)                # [tc, bn//32, cs]
    onehot_t = np.ascontiguousarray(onehot.transpose(0, 2, 1))
    mask_t = _pack_mask_bits_rows(                         # [tc, cs//32, bn]
        onehot_t, mask_row_group(cs))
    self._onehot_masks = (mask, mask_t)
    return self._onehot_masks

  def __call__(self, messages, masks=None):
    """messages: [E(, B), C] → [num_nodes(, B), C] sums; E is the original
    edge count, or ``layout_length`` when ``padded_input=True``.
    Differentiable (the VJP of a segment sum is a gather).

    ``masks``: optional (mask, mask_t) DEVICE arrays (see
    :meth:`onehot_masks`) — pass them as jit arguments (e.g. from the
    model's graph_statics) so the bitpacked masks do not inline as HLO
    constants (tens of MB per edge set; the remote compile service rejects
    oversized modules). Default: inline constants.
    """
    if messages.ndim == 3:
      # [E, B, C] GNN layout: aggregation is per-edge linear, so flatten
      # batch into channels for the kernel.
      e, b, c = messages.shape
      out = self(messages.reshape(e, b * c), masks)
      return out.reshape(out.shape[0], b, c)
    out = _blocked_segment_sum_impl(messages, masks, _SummerHolder(self))
    if self.node_order is not None:
      # Kernel output rows are layout positions; map back to node ids
      # (outside the custom VJP, so autodiff threads the permutation).
      out = jnp.take(out, jnp.asarray(self.node_pos), axis=0)
    return out

  def _forward(self, messages, masks=None):
    interpret = self._interpret
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    e, c = messages.shape
    if self.padded_input:
      if e != self.layout_length:
        raise ValueError(
            f"padded_input: expected {self.layout_length} rows, got {e}")
      msgs = messages
    else:
      if e != self.num_edges:
        raise ValueError(f"expected {self.num_edges} edges, got {e}")
      zero_row = jnp.zeros((1, c), messages.dtype)
      msgs = jnp.concatenate([messages, zero_row], axis=0)[
          jnp.asarray(self.layout_index)]
    total_chunks = self.total_chunks

    mask = masks[0] if masks is not None else jnp.asarray(
        self.onehot_masks()[0])
    kernel = functools.partial(
        _agg_kernel, block_nodes=self.block_nodes,
        chunk_edges=self.chunk_edges, max_chunks=self.max_chunks)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(self.num_node_blocks, self.max_chunks),
            in_specs=[
                # Clamp so inactive trailing chunks (j ≥ num_chunks[i]) stay
                # in bounds; their compute is skipped by pl.when.
                pl.BlockSpec((1, self.block_nodes // 32, self.chunk_edges),
                             lambda i, j, cb, nc: (
                                 jnp.minimum(cb[i] + j, total_chunks - 1),
                                 0, 0)),
                pl.BlockSpec((self.chunk_edges, c),
                             lambda i, j, cb, nc: (
                                 jnp.minimum(cb[i] + j, total_chunks - 1),
                                 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, self.block_nodes, c),
                lambda i, j, cb, nc: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((self.block_nodes, c), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (self.num_node_blocks, self.block_nodes, c), messages.dtype),
        interpret=interpret,
    )(jnp.asarray(self.chunk_base), jnp.asarray(self.num_chunks),
      mask, msgs)
    return out.reshape(self.num_node_blocks * self.block_nodes,
                       c)[:self.num_nodes]


class _SummerHolder:
  """Hashable identity wrapper for custom_vjp static args."""

  def __init__(self, summer):
    self.summer = summer

  def __hash__(self):
    return id(self.summer)

  def __eq__(self, other):
    return isinstance(other, _SummerHolder) and other.summer is self.summer


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _blocked_segment_sum_impl(messages, masks, holder):
  return holder.summer._forward(messages, masks)


def _bss_fwd(messages, masks, holder):
  return holder.summer._forward(messages, masks), None


def _bss_bwd(holder, _, g):
  # d messages[e] = g[receivers[e]] — a plain gather. In padded mode the
  # gather runs over the padded receiver layout with an appended zero row
  # for padding slots (receiver id == num_nodes+1, clipped to num_nodes).
  summer = holder.summer
  if summer.padded_input:
    zero_row = jnp.zeros((1,) + g.shape[1:], g.dtype)
    g_ext = jnp.concatenate([g, zero_row], axis=0)
    # Position-space rows: g is the POSITION-space cotangent here (the
    # node_order un-permute lives outside the custom VJP).
    idx = jnp.minimum(jnp.asarray(summer.padded_positions), summer.num_nodes)
    return (g_ext[idx], None)
  recv = (summer.original_receivers if summer.node_order is None
          else summer.node_pos[summer.original_receivers])
  d_messages = g[jnp.asarray(recv)]
  return (d_messages, None)


_blocked_segment_sum_impl.defvjp(_bss_fwd, _bss_bwd)
