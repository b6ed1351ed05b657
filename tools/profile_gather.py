"""Gather micro-experiments: what drives the g2m sender-gather cost?

The 0.25° grid2mesh gather (1.66M rows from the [1.04M, 512] bf16 table)
costs ~29 ms/step amortized — the encoder's largest piece — at ~17.5
ns/row, vs ~4.5 ns/row for the mesh gather from its 42 MB table. This
tool isolates WHAT makes it slow:

  raw        the real senders in edge-layout (receiver-sorted) order
  sorted     the same multiset of indices, ascending (pure-locality bound)
  firsttouch the real senders through a first-touch relabeling (the order
             a grid-reordered artifact would actually produce)
  half       the real gather from a half-width [G, 256] table (size test)

If `sorted`/`firsttouch` approach the mesh gather's ns/row, a grid-node
reordering (artifact-level permutation, like the denoiser's banded mesh
permutation) buys ~15-20 ms/step in the encoder. Run on an otherwise-idle
host (rig rules: amortized 8x in-jit loops, readback-forced, varied input).
"""

import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

ITERS = 8


def main():
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum

  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6,
      radius_query_fraction_edge_length=0.6, multimesh=True, cache_dir=None)
  G, M, C = art.num_grid_nodes, art.num_mesh_nodes, 512
  summer = BlockedSegmentSum(art.grid2mesh.receivers, M, block_nodes=256,
                             chunk_edges=512, padded_input=True)
  senders = summer.pad_edges(art.grid2mesh.senders)  # [L]
  L = senders.shape[0]
  print(f"# G={G} L={L} iters={ITERS}")

  # First-touch relabeling: grid node -> position of first appearance in
  # the edge-layout sweep (what a gather-friendly grid ordering gives).
  first = np.full(G, -1, np.int64)
  seen = 0
  for s in senders:
    if first[s] < 0:
      first[s] = seen
      seen += 1
  # Nodes never appearing as senders (padding target 0 handled above).
  rest = np.nonzero(first < 0)[0]
  first[rest] = seen + np.arange(rest.size)

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  table = jax.device_put(rs.randn(G, C).astype(np.float32)).astype(bf)
  table_h = jax.device_put(rs.randn(G, C // 2).astype(np.float32)).astype(bf)

  variants = {
      "raw": jax.device_put(np.asarray(senders, np.int32)),
      "sorted": jax.device_put(np.sort(senders).astype(np.int32)),
      "firsttouch": jax.device_put(first[senders].astype(np.int32)),
  }

  def make_loop(idx, tab):
    @jax.jit
    def loop(tab, i):
      def body(_, t):
        gs = t[idx]
        return t + bf(1e-7) * gs[:t.shape[0]]
      t = jax.lax.fori_loop(0, ITERS, body, tab + bf(1e-6) * bf(i))
      return jnp.mean(t.astype(jnp.float32))
    return loop

  def timeit(name, fn, tab):
    t0 = time.perf_counter()
    v = float(fn(tab, 0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), name
    times = []
    for i in range(1, 5):
      t0 = time.perf_counter()
      float(fn(tab, i))
      times.append(time.perf_counter() - t0)
    per = (min(times) - 0.028) / ITERS
    print(f"{name}: {per*1e3:.2f} ms/iter = {per/L*1e9:.1f} ns/row "
          f"(total {min(times)*1e3:.1f} ms, compile {compile_s:.1f}s)")

  for name, idx in variants.items():
    timeit(name, make_loop(idx, table), table)
  timeit("half_width", make_loop(variants["raw"], table_h), table_h)

  # Small-operand pricing floor: the same ROW COUNT gathered from a 32k-row
  # (33 MB) table. If this is ~4-5 ns/row while `raw` is ~17, the gather
  # cost is operand-size-driven (round-4 scaling law) and the windowed
  # two-stage design below is the fix.
  W = 32768
  table_s = table[:W]
  idx_small = jax.device_put(
      (np.asarray(senders, np.int64) % W).astype(np.int32))
  timeit(f"small_{W}", make_loop(idx_small, table_s), table_s)

  # Slice-then-gather: per 65536-edge superchunk, dynamic-slice a W-row
  # window out of the BIG table (contiguous copy) and gather window-locally.
  # Tests whether the small-operand pricing survives when the small table is
  # a fresh slice of the big one inside a lax.map — the shape of the
  # mesh-spatially-ordered g2m encoder gather (each chunk's senders live in
  # a narrow lat-band window once mesh nodes are sorted spatially).
  Es = 65536
  S = L // Es
  stride = max(1, (G - W) // max(S - 1, 1))
  offs = jnp.asarray(np.clip(np.arange(S) * stride, 0, G - W), jnp.int32)
  rs2 = np.random.RandomState(1)
  lidx = jnp.asarray(rs2.randint(0, W, size=(S, Es)).astype(np.int32))

  def make_sliced(tab_unused):
    @jax.jit
    def loop(tab, i):
      def body(_, t):
        def one(args):
          off, li = args
          win = jax.lax.dynamic_slice_in_dim(t, off, W)
          return win[li]
        gs = jax.lax.map(one, (offs, lidx))          # [S, Es, C]
        return t + bf(1e-7) * gs.reshape(-1, C)[:t.shape[0]]
      t = jax.lax.fori_loop(0, ITERS, body, tab + bf(1e-6) * bf(i))
      return jnp.mean(t.astype(jnp.float32))
    return loop

  timeit(f"sliced_w{W}", make_sliced(table), table)


if __name__ == "__main__":
  main()
