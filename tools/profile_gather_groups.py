"""Grouped-row gather probe for the g2m sender gather.

tools/analyze_g2m_senders.py (host-side, 0.25°/mesh-6): g2m senders come in
consecutive runs (mean length ~7, lat-major grid order), so the 1.62M-row
gather from the [1.04M, 512] bf16 table collapses to 233,632 unique 8-row
GROUPS (14.4% of E) — if wide-row (8×512) gathers cost anything close to
the measured ~17.5 ns/row of 1-KB-row gathers, the encoder's biggest piece
(29 ms/step) drops to ~5 ms + a small-table expansion.

Variants (all chunked like the model's lax.map encoder, 25 chunks):
  flat     current: per chunk gather max_e rows from the [G, 512] table
  grouped  per chunk gather the chunk's unique 8-row groups from the
           [G/8, 8*512] view, then expand to edge slots from the compact
           per-chunk table (two-stage; the realistic replacement)
  groups_only  stage 1 alone (the big-table traffic floor)

Usage: python tools/profile_gather_groups.py [group=8]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8


def main():
  group = int(sys.argv[1]) if len(sys.argv) > 1 else 8
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.geometry import chunking

  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6, cache_dir=None)
  g2m = art.grid2mesh
  G, C = art.num_grid_nodes, 512
  E = len(g2m.senders)
  plan = chunking.plan_balanced_node_chunks(g2m.receivers,
                                            art.num_mesh_nodes, 25)
  k, max_e = plan.num_chunks, plan.max_edges
  senders = plan.pad_edge_array(g2m.senders.astype(np.int64), fill=0)
  senders = senders.reshape(k, max_e)

  # Host-side group compilation: per chunk, unique sender groups (padded
  # with group 0) + per-edge local index into the expanded compact table.
  Gp = -(-G // group) * group
  g_lists, local = [], np.zeros((k, max_e), np.int32)
  for c in range(k):
    gids = senders[c] // group
    uniq, inv = np.unique(gids, return_inverse=True)
    g_lists.append(uniq)
    local[c] = inv * group + senders[c] % group
  max_g = max(len(u) for u in g_lists)
  gidx = np.zeros((k, max_g), np.int32)
  for c, u in enumerate(g_lists):
    gidx[c, :len(u)] = u
  sum_g = sum(len(u) for u in g_lists)
  print(f"# G={G} E={E} k={k} max_e={max_e} group={group} "
        f"max_g={max_g} sum_g={sum_g} ({sum_g/E:.2%} of E)")

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  table = jax.device_put(
      rs.randn(Gp, C).astype(np.float32)).astype(bf)       # [Gp, 512]
  tableg = table.reshape(Gp // group, group * C)           # [Gp/g, g*512]
  s_idx = jax.device_put(senders.astype(np.int32))
  g_idx = jax.device_put(gidx)
  l_idx = jax.device_put(local)

  def flat_loop(table, i):
    def chunk(xs):
      s = xs
      return jnp.sum(table[s].astype(jnp.float32), axis=0)  # [C]
    return jnp.mean(jax.lax.map(chunk, s_idx)) + 0 * i

  def grouped_loop(tableg, i):
    def chunk(xs):
      g, l = xs
      grp = tableg[g]                                  # [max_g, group*C]
      rows = grp.reshape(max_g * group, C)[l]          # [max_e, C]
      return jnp.sum(rows.astype(jnp.float32), axis=0)
    return jnp.mean(jax.lax.map(chunk, (g_idx, l_idx))) + 0 * i

  def groups_only_loop(tableg, i):
    def chunk(g):
      return jnp.sum(tableg[g].astype(jnp.float32), axis=0)  # [group*C]
    return jnp.mean(jax.lax.map(chunk, g_idx)) + 0 * i

  def timeit(name, body, tab, rows):
    @jax.jit
    def f(tab, i):
      def it(j, acc):
        return acc + body(tab, i + j)
      return jax.lax.fori_loop(0, ITERS, it, 0.0)

    t0 = time.perf_counter()
    v = float(f(tab, 0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), name
    times = []
    for i in range(1, 5):
      t0 = time.perf_counter()
      float(f(tab, jnp.float32(i)))
      times.append(time.perf_counter() - t0)
    per = (min(times) - 0.028) / ITERS
    print(f"{name:12s}: {per*1e3:6.2f} ms/iter = {per/rows*1e9:5.1f} ns/row "
          f"over {rows} rows (compile {compile_s:.1f}s)")

  timeit("flat", flat_loop, table, k * max_e)
  timeit("groups_only", groups_only_loop, tableg, k * max_g)
  timeit("grouped", grouped_loop, tableg, k * max_e)


if __name__ == "__main__":
  main()
