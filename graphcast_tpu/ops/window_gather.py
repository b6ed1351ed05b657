"""Windowed two-stage row gather for the grid2mesh sender tables.

The g2m encoder pulls one [latent] row per edge from the [num_grid, latent]
sender-projection table (reference semantics: the sender-feature gather of
typed_graph_net.py:130-150). At 0.25° that is 1.66M rows from a 1.06 GB
table; XLA's flat gather costs ~17.3 ns/row on TPU v5e and the cost scales
with TABLE size, not index locality (round-4/5 probes, tools/
profile_gather.py): 42 MB tables gather at ~4.5 ns/row, and a
dynamic-slice + small-table gather round trip measures ~8.6 ns/row
end-to-end at 32k-row windows.

This module exploits that scaling law: when consecutive edges in the padded
kernel layout have senders confined to a narrow window of table rows (true
once the layout's receiver blocks are spatially coherent — see
BlockedSegmentSum's ``node_order``), the gather runs as

    for each superchunk s:                       # lax.map, static window
      win  = dynamic_slice(table, base[s], W)    # sequential HBM read
      rows = win[local[s]]                       # small-table gather

Window widths are static per contiguous BUCKET of superchunks (polar
superchunks span more latitude per mesh node than equatorial ones, so a
single global width would pay the polar worst case everywhere); buckets are
chosen by a small exact DP over contiguous splits.

Both stages are linear in ``table``, so autodiff needs no saved windows:
the VJP is scatter-into-window + dynamic-update-slice accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


# Below this table size the flat gather is already near the small-table
# floor (~4.5 ns/row at 42 MB, round-4 amortized probes) and the two-stage
# slice+concat overhead loses: GenCast 1.0° (65k-row, 67 MB table) measured
# 1.763 s windowed vs 1.718 s flat on the 12h step. 0.25° grids (1.04M
# rows) are ~5× over the threshold and win ~8 ms/step.
MIN_TABLE_ROWS = 200_000


@dataclasses.dataclass(frozen=True)
class WindowedGatherPlan:
  """Host-side plan for a windowed two-stage gather over a fixed layout.

  Attributes:
    superchunk_edges: rows handled per superchunk (se).
    num_rows: table row count the plan was built for.
    buckets: contiguous superchunk ranges sharing one static window width,
      as (start_superchunk, end_superchunk, width) tuples.
    base: [ns] int32 window start row per superchunk.
    local: [ns, se] int32 window-local row index per layout slot (padding
      slots point at 0 — their gathered values are never consumed).
    layout_length: the original (unpadded-to-superchunk) layout length.
  """
  superchunk_edges: int
  num_rows: int
  buckets: Tuple[Tuple[int, int, int], ...]
  base: np.ndarray
  local: np.ndarray
  layout_length: int

  @property
  def num_superchunks(self) -> int:
    return self.base.shape[0]

  @property
  def window_rows_total(self) -> int:
    """Total window rows sliced per invocation (the copy-stage traffic)."""
    return sum((s1 - s0) * w for s0, s1, w in self.buckets)

  def statics(self) -> dict:
    """Arrays to thread as jit arguments (graph_statics style)."""
    return {"base": self.base, "local": self.local}

  def __call__(self, table, base, local):
    """Gather layout rows from ``table`` ([R, C], R == num_rows).

    ``base``/``local`` are the :meth:`statics` arrays as device/traced
    arrays. Returns [layout_length, C] in layout order.
    """
    if table.shape[0] != self.num_rows:
      raise ValueError(
          f"plan built for {self.num_rows} rows, table has {table.shape[0]}")
    se = self.superchunk_edges
    parts = []
    for s0, s1, w in self.buckets:
      def one(args, _w=w):
        b, loc = args
        win = jax.lax.dynamic_slice_in_dim(table, b, _w, axis=0)
        return jnp.take(win, loc, axis=0, indices_are_sorted=False,
                        unique_indices=False)
      res = jax.lax.map(one, (base[s0:s1], local[s0:s1].reshape(s1 - s0, se)))
      parts.append(res.reshape((s1 - s0) * se, table.shape[-1]))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out[:self.layout_length]


def _bucket_dp(counts: np.ndarray, widths: np.ndarray,
               num_buckets: int,
               extra_bucket_penalty: int = 0
               ) -> Tuple[Tuple[int, int, int], ...]:
  """Optimal contiguous split of superchunks into ≤ num_buckets ranges,
  minimizing Σ_range (superchunks in range) × max(width in range)
  + (ranges − 1) × extra_bucket_penalty.

  The penalty models the downstream cost of multiple buckets: each bucket
  is a separate lax.map whose outputs must be concatenated — one full
  read+write of the gathered array (≈ layout_length row-equivalents) —
  so splitting only pays off when the window-width spread is large
  (e.g. truly polar-dominated layouts)."""
  ns = len(widths)
  num_buckets = max(1, min(num_buckets, ns))
  # cost[i][j] = cost of one bucket covering superchunks [i, j)
  width_max = np.zeros((ns + 1, ns + 1), np.int64)
  for i in range(ns):
    running = 0
    for j in range(i + 1, ns + 1):
      running = max(running, int(widths[j - 1]))
      width_max[i][j] = running
  INF = float("inf")
  best = [[INF] * (ns + 1) for _ in range(num_buckets + 1)]
  prev = [[-1] * (ns + 1) for _ in range(num_buckets + 1)]
  best[0][0] = 0.0
  for b in range(1, num_buckets + 1):
    for j in range(1, ns + 1):
      for i in range(j):
        if best[b - 1][i] == INF:
          continue
        c = best[b - 1][i] + float(counts[i:j].sum() * width_max[i][j])
        if c < best[b][j]:
          best[b][j] = c
          prev[b][j] = i
  b = min(range(1, num_buckets + 1),
          key=lambda bb: best[bb][ns] + (bb - 1) * extra_bucket_penalty)
  cuts = []
  j = ns
  while b > 0:
    i = prev[b][j]
    cuts.append((i, j))
    j, b = i, b - 1
  cuts.reverse()
  return tuple((i, j, int(width_max[i][j])) for i, j in cuts)


def plan_windowed_gather(
    senders_layout: np.ndarray,
    valid: np.ndarray,
    num_rows: int,
    superchunk_edges: int = 65536,
    num_buckets: int = 4,
    width_align: int = 512,
    max_expansion: Optional[float] = 2.5,
) -> Optional[WindowedGatherPlan]:
  """Build a WindowedGatherPlan for a padded edge layout.

  Args:
    senders_layout: [L] table-row index per layout slot (original order of
      the table, e.g. lat-major grid ids).
    valid: [L] bool, False on padding slots.
    num_rows: table row count.
    superchunk_edges: slots per superchunk (static gather batch).
    num_buckets: max contiguous window-width buckets (exact DP).
    width_align: window widths round up to this multiple.
    max_expansion: give up (return None) if total window rows exceed this
      multiple of ``num_rows`` — the layout is not window-local enough for
      the two-stage gather to beat the flat one (e.g. refinement-ordered
      receivers; see the round-5 analyze_g2m_senders measurements).

  Returns the plan, or None when the layout is too scattered.
  """
  senders_layout = np.asarray(senders_layout, np.int64).reshape(-1)
  valid = np.asarray(valid, bool).reshape(-1)
  if senders_layout.shape != valid.shape:
    raise ValueError("senders_layout and valid must have the same length")
  L = senders_layout.shape[0]
  if L == 0 or num_rows <= 0:
    return None
  if valid.any():
    smin, smax = senders_layout[valid].min(), senders_layout[valid].max()
    if smin < 0 or smax >= num_rows:
      raise ValueError(f"sender ids [{smin}, {smax}] out of range "
                       f"[0, {num_rows})")
  se = int(superchunk_edges)
  ns = -(-L // se)
  pad = ns * se - L
  s_pad = np.concatenate([senders_layout, np.zeros(pad, np.int64)])
  v_pad = np.concatenate([valid, np.zeros(pad, bool)])
  s2 = s_pad.reshape(ns, se)
  v2 = v_pad.reshape(ns, se)

  lo = np.zeros(ns, np.int64)
  hi = np.zeros(ns, np.int64)
  for s in range(ns):
    rows = s2[s][v2[s]]
    if rows.size:
      lo[s], hi[s] = rows.min(), rows.max()
  spans = hi - lo + 1
  # +8 covers the base's sublane round-down before the width alignment.
  widths = np.minimum([_round_up(int(sp) + 8, width_align) for sp in spans],
                      num_rows).astype(np.int64)

  # No extra-bucket penalty: the concat-per-bucket overhead the penalty
  # modeled measures SMALLER than the width savings on TPU — at 0.25° the
  # 4-bucket plan runs 11.37 ms vs the single-bucket 15.04 (8-bucket 14.41:
  # past ~4 the lax.map/concat overhead does win; num_buckets=4 default).
  # tools/probe_window_variants.py, round-5 idle-host run.
  buckets = _bucket_dp(np.ones(ns, np.int64), widths, num_buckets)
  total = sum((s1 - s0) * w for s0, s1, w in buckets)
  if max_expansion is not None and total > max_expansion * num_rows:
    return None

  base = np.zeros(ns, np.int32)
  local = np.zeros((ns, se), np.int32)
  for s0, s1, w in buckets:
    for s in range(s0, s1):
      b = min(int(lo[s]) // 8 * 8, num_rows - w)
      b = max(b, 0)
      assert b + w > hi[s], (s, b, w, lo[s], hi[s])
      base[s] = b
      local[s] = np.where(v2[s], s2[s] - b, 0).astype(np.int32)
  return WindowedGatherPlan(
      superchunk_edges=se, num_rows=int(num_rows), buckets=buckets,
      base=base, local=local, layout_length=L)
