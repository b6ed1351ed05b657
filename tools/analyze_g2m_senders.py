"""Host-side analysis of the grid2mesh sender-gather row reduction levers.

The 0.25° north-star profile shows the g2m sender gather at ~29 ms/step:
1.66M rows pulled from the [1.04M, 512] bf16 grid_proj table at ~17.5
ns/row (per-row cost scales with TABLE size — tools/profile_gather.py).
Two candidate levers, both needing host-side geometry facts first:

1. Unique-sender dedup per chunk: gather only the U_c unique senders of
   each chunk from the big table, expand to edge slots from the small
   per-chunk table (~4.5 ns/row small-table gather, or in-kernel one-hot).
   Wins iff sum(U_c) << E.
2. Window slicing: senders of a chunk live in a contiguous grid-index
   window [lo_c, hi_c) → dynamic-slice the window (sequential HBM read)
   and gather chunk rows from the ≤42 MB window at ~4.5 ns/row.
   Wins iff spans are small. Grid order is lat-major; mesh (receiver)
   order is icosahedral-refinement order, so this measures whether
   receiver-sorted chunks are spatially local.

Usage: python tools/analyze_g2m_senders.py [resolution] [mesh_size] [chunks]
           [spatial 0/1]

With spatial=1 the artifact is built with spatial_permutation=True (RCM on
the finest mesh): receiver-sorted superchunks then follow lat-ish bands, so
the per-superchunk sender WINDOWS in the lat-major grid should collapse
from ~13x grid (round-4 finding under refinement order) to ~1x — the
precondition for the windowed two-stage gather (slice a small window out of
the big table, gather window-locally at small-operand pricing).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  resolution = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
  mesh_size = int(sys.argv[2]) if len(sys.argv) > 2 else 6
  chunks_list = ([int(c) for c in sys.argv[3].split(",")]
                 if len(sys.argv) > 3 else [25, 50, 100])
  spatial = len(sys.argv) > 4 and sys.argv[4] == "1"

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.geometry import chunking

  lat = np.arange(-90.0, 90.0 + resolution / 2, resolution, dtype=np.float32)
  lon = np.arange(0.0, 360.0, resolution, dtype=np.float32)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=mesh_size,
      spatial_permutation=spatial)
  g2m = art.grid2mesh
  E = len(g2m.senders)
  G = art.num_grid_nodes
  print(f"g2m edges={E} grid={G} mesh={art.num_mesh_nodes} "
        f"repeat={E / G:.3f}x spatial_permutation={spatial}")

  # Per-superchunk sender windows on the FUSED padded layout (the layout the
  # kernel path actually gathers in): span stats decide the windowed
  # two-stage gather's static window size.
  from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum
  summer = BlockedSegmentSum(g2m.receivers, art.num_mesh_nodes,
                             block_nodes=256, chunk_edges=512,
                             padded_input=True)
  layout = summer.pad_edges(g2m.senders.astype(np.int64))
  valid = summer.pad_edges(np.ones(E, np.int64)) > 0
  L = layout.shape[0]
  for es in (32768, 65536):
    S = -(-L // es)
    spans = []
    for s in range(S):
      sl = layout[s * es:(s + 1) * es]
      va = valid[s * es:(s + 1) * es]
      rows = sl[va]
      if rows.size:
        spans.append(int(rows.max() - rows.min() + 1))
    spans = np.array(spans)
    print(f"  superchunk Es={es}: S={S} window span med={int(np.median(spans))}"
          f" p90={int(np.percentile(spans, 90))} max={int(spans.max())} "
          f"sum={int(spans.sum())} ({spans.sum() / G:.2f}x grid)")

  ns_big = 17.5      # measured ns/row, 1.06 GB table
  ns_small = 4.5     # measured ns/row, <=42 MB table
  row_bytes = 512 * 2
  hbm_gbps = 700.0   # effective v5e HBM (copy reads+writes => 2x traffic)

  for k in chunks_list:
    plan = chunking.plan_balanced_node_chunks(
        g2m.receivers, art.num_mesh_nodes, k)
    senders_pad = plan.pad_edge_array(g2m.senders.astype(np.int64), fill=G)
    senders_pad = senders_pad.reshape(plan.num_chunks, plan.max_edges)
    sum_u, max_u, spans, win_rows = 0, 0, [], 0
    for c in range(plan.num_chunks):
      s = senders_pad[c]
      s = s[s < G]  # padding slots point past the real edge range
      if not len(s):
        continue
      u = np.unique(s)
      sum_u += len(u)
      max_u = max(max_u, len(u))
      spans.append(int(u[-1] - u[0] + 1))
      win_rows += spans[-1]
    spans = np.array(spans)
    cur_ms = E * ns_big * 1e-6
    dedup_ms = (sum_u * ns_big + E * ns_small) * 1e-6
    dedup_kernel_ms = sum_u * ns_big * 1e-6   # one-hot expansion in-kernel
    win_copy_ms = 2 * win_rows * row_bytes / (hbm_gbps * 1e9) * 1e3
    win_ms = win_copy_ms + E * ns_small * 1e-6
    print(f"k={plan.num_chunks:4d} max_e={plan.max_edges:7d} "
          f"overhead={plan.expansion:.3f}")
    print(f"  unique: sum_U={sum_u} ({sum_u / E:.2%} of E) max_U={max_u}")
    print(f"  span: med={int(np.median(spans))} max={int(spans.max())} "
          f"sum={win_rows} ({win_rows / G:.2f}x grid)")
    print(f"  est ms/step: current={cur_ms:.1f} dedup2gather={dedup_ms:.1f} "
          f"dedup+kernel={dedup_kernel_ms:.1f} window={win_ms:.1f} "
          f"(win copy {win_copy_ms:.1f})")


if __name__ == "__main__":
  main()
