"""Micro-benchmark: grid2mesh encoder pieces at 0.25°/mesh-6.

The encode stage is ~72 ms per rollout step. Splits it into
(a) the sender-projection gather gs = grid_proj[senders] (1.66M rows),
(b) the agg-only fused edge kernel on pre-gathered inputs,
(c) the grid-side MLPs (embed + update over 1.04M grid nodes),
each looped 8× INSIDE one jit (lax.fori_loop, sequential dependence) so
the ~28 ms per-dispatch tunnel overhead amortizes — single-call timings
through the axon tunnel are dispatch-dominated (rig rule 7).

Usage: python tools/profile_encoder_parts.py [chunk_edges] [block_nodes]
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
  from graphcast_tpu.ops.pallas_edge import FusedEdgeStep
  from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum

  cs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
  bn = int(sys.argv[2]) if len(sys.argv) > 2 else 256
  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6,
      radius_query_fraction_edge_length=0.6, multimesh=True, cache_dir=None)
  G, M, C = art.num_grid_nodes, art.num_mesh_nodes, 512
  summer = BlockedSegmentSum(art.grid2mesh.receivers, M, block_nodes=bn,
                             chunk_edges=cs, padded_input=True)
  step = FusedEdgeStep(summer, include_edge_matmul=False, write_edges=False)
  L = summer.layout_length
  print(f"# G={G} M={M} L={L} chunks={summer.total_chunks} "
        f"expansion={summer.expansion:.3f} iters={ITERS}")

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  grid_proj = jax.device_put(rs.randn(G, C).astype(np.float32)).astype(bf)
  const = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gs0 = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gr_pad = jax.device_put(
      rs.randn(summer.num_node_blocks * summer.block_nodes, C)
      .astype(np.float32)).astype(bf)
  mk = summer.onehot_masks()
  masks = jax.device_put((jnp.asarray(mk[0]), jnp.asarray(mk[1])))
  w1 = jax.device_put((rs.randn(C, C) / np.sqrt(C)).astype(np.float32))
  b1 = jnp.zeros(C)
  scale = jnp.ones(C)
  offset = jnp.zeros(C)
  senders_pad = jax.device_put(summer.pad_edges(art.grid2mesh.senders))
  grid_in = jax.device_put(rs.randn(G, 186).astype(np.float32)).astype(bf)
  emb_w0 = jax.device_put((rs.randn(186, C) / 14).astype(np.float32))
  emb_w1 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  upd_w0 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  upd_w1 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  nbn = summer.num_node_blocks * summer.block_nodes

  def seeded(i, v):
    return v + bf(1e-6) * bf(i)

  @jax.jit
  def gather_loop(gp, i):
    def body(_, gp):
      gs = gp[senders_pad]
      return gp + bf(1e-7) * gs[:gp.shape[0]]
    gp = jax.lax.fori_loop(0, ITERS, body, seeded(i, gp))
    return jnp.mean(gp.astype(jnp.float32))

  @jax.jit
  def kernel_loop(c, gs0, gr, w1, mk, i):
    def body(_, carry):
      c, gr = carry
      agg = step(c, gs0, gr, None, None, w1, b1, scale, offset, masks=mk)
      gr = gr + bf(1e-7) * jnp.pad(
          agg.astype(bf), ((0, nbn - agg.shape[0]), (0, 0)))
      return c, gr
    _, gr = jax.lax.fori_loop(0, ITERS, body, (seeded(i, c), gr))
    return jnp.mean(gr.astype(jnp.float32))

  @jax.jit
  def gridside_loop(x, i):
    def body(_, x):
      e = x @ emb_w0.astype(bf)
      e = jax.nn.swish(e.astype(jnp.float32)).astype(bf) @ emb_w1.astype(bf)
      u = e @ upd_w0.astype(bf)
      u = jax.nn.swish(u.astype(jnp.float32)).astype(bf) @ upd_w1.astype(bf)
      return x + bf(1e-7) * (e + u)[:, :x.shape[1]]
    x = jax.lax.fori_loop(0, ITERS, body, seeded(i, x))
    return jnp.mean(x.astype(jnp.float32))

  def timeit(name, fn, *args):
    t0 = time.perf_counter()
    v = float(fn(*args, 0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), name
    times = []
    for i in range(1, 5):
      t0 = time.perf_counter()
      float(fn(*args, i))
      times.append(time.perf_counter() - t0)
    per = (min(times) - 0.028) / ITERS
    print(f"{name}: {per*1e3:.2f} ms/iter (total {min(times)*1e3:.1f} ms "
          f"- ~28 ms dispatch, compile {compile_s:.1f}s, "
          f"all {[round(t*1e3,1) for t in times]})")

  timeit("g2m_gather", gather_loop, grid_proj)

  # Windowed two-stage gather (round 5): lat-banded node order + window
  # plan, built exactly as the models build it (models/graphcast.py).
  from graphcast_tpu.ops.window_gather import plan_windowed_gather
  order = np.lexsort(
      (art.mesh_nodes_lon, -art.mesh_nodes_lat)).astype(np.int32)
  wsummer = BlockedSegmentSum(art.grid2mesh.receivers, M, block_nodes=bn,
                              chunk_edges=cs, padded_input=True,
                              node_order=order)
  se = max(512, -(-wsummer.layout_length // 32 // 512) * 512)
  plan = plan_windowed_gather(
      wsummer.pad_edges(art.grid2mesh.senders),
      wsummer.layout_index < wsummer.num_edges, G, superchunk_edges=se)
  if plan is not None:
    print(f"# windowed: ns={plan.num_superchunks} se={plan.superchunk_edges} "
          f"buckets={plan.buckets} traffic={plan.window_rows_total/G:.2f}xG")
    wbase = jax.device_put(jnp.asarray(plan.base))
    wlocal = jax.device_put(jnp.asarray(plan.local))

    @jax.jit
    def wgather_loop(gp, base, local, i):
      def body(_, gp):
        gs = plan(gp, base, local)
        return gp + bf(1e-7) * gs[:gp.shape[0]]
      gp = jax.lax.fori_loop(0, ITERS, body, seeded(i, gp))
      return jnp.mean(gp.astype(jnp.float32))

    timeit("g2m_gather_windowed", wgather_loop, grid_proj, wbase, wlocal)

  timeit("g2m_kernel", kernel_loop, const, gs0, gr_pad, w1, masks)
  timeit("gridside_mlps", gridside_loop, grid_in)


if __name__ == "__main__":
  main()
