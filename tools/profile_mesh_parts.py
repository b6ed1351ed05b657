"""Micro-benchmark: mesh-processor step pieces at 0.25°/mesh-6.

The process stage is ~91 ms per rollout step (16 MP steps ⇒ ~5.7 ms each).
Splits one step into
(a) the sender-projection gather gs = (x @ ws)[senders],
(b) the fused edge-step kernel on pre-gathered inputs,
(c) the node-side MLP,
and runs each piece 16× INSIDE one jit via lax.fori_loop with sequential
data dependence (like the real processor) so the ~28 ms per-dispatch
tunnel overhead amortizes to <2 ms/iter — single-call timings through the
axon tunnel are dispatch-dominated and useless for ranking (rig rule 7).

Rig rules: readback-forced timing, varied inputs, masks as jit args,
nothing else running on the host.
"""

import os
import time

import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

ITERS = 16


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

  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6,
      radius_query_fraction_edge_length=0.6, multimesh=True, cache_dir=None)
  M, C = art.num_mesh_nodes, 512
  summer = BlockedSegmentSum(art.mesh.receivers, M, block_nodes=256,
                             chunk_edges=512, padded_input=True)
  step = FusedEdgeStep(summer)
  L = summer.layout_length
  print(f"# M={M} L={L} chunks={summer.total_chunks} "
        f"expansion={summer.expansion:.3f} iters={ITERS}")

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  x = jax.device_put(rs.randn(M, C).astype(np.float32)).astype(bf)
  e_pad = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gs0 = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gr_pad = jax.device_put(
      rs.randn(summer.num_node_blocks * summer.block_nodes, C)
      .astype(np.float32)).astype(bf)
  mk = summer.onehot_masks()
  masks = jax.device_put((jnp.asarray(mk[0]), jnp.asarray(mk[1])))
  ws = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  we = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  w1 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  wn0 = jax.device_put((rs.randn(2 * C, C) / 32).astype(np.float32))
  wn1 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  b = jnp.zeros(C)
  one = jnp.ones(C)
  senders_pad = jax.device_put(summer.pad_edges(art.mesh.senders))
  nbn = summer.num_node_blocks * summer.block_nodes

  def seeded(i, v):
    return v + bf(1e-6) * bf(i)

  @jax.jit
  def gather_loop(x, ws, i):
    def body(_, x):
      gs = (x @ ws.astype(bf))[senders_pad]
      # Sequential dependence: the next step's table depends on this gather.
      return x + bf(1e-7) * gs[:x.shape[0]]
    x = jax.lax.fori_loop(0, ITERS, body, seeded(i, x))
    return jnp.mean(x.astype(jnp.float32))

  @jax.jit
  def kernel_loop(e, gs0, gr, we, w1, mk, i):
    def body(_, carry):
      e, gr = carry
      eout, agg = step(e, gs0, gr, we, b, w1, b, one, b, masks=mk)
      return eout, (gr + bf(1e-7) * jnp.pad(
          agg.astype(bf), ((0, nbn - agg.shape[0]), (0, 0))))
    e, gr = jax.lax.fori_loop(0, ITERS, body, (seeded(i, e), gr))
    return jnp.mean(gr.astype(jnp.float32))

  @jax.jit
  def node_loop(x, wn0, wn1, i):
    def body(_, x):
      inp = jnp.concatenate([x, x], axis=-1)
      h = inp @ wn0.astype(bf)
      h = jax.nn.swish(h.astype(jnp.float32)).astype(bf) @ wn1.astype(bf)
      return x + bf(1e-7) * h
    x = jax.lax.fori_loop(0, ITERS, body, seeded(i, x))
    return jnp.mean(x.astype(jnp.float32))

  def timeit(name, fn, *args):
    t0 = time.perf_counter()
    v = float(fn(*args, 0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), name
    times = []
    for i in range(1, 6):
      t0 = time.perf_counter()
      float(fn(*args, i))
      times.append(time.perf_counter() - t0)
    per = (min(times) - 0.028) / ITERS
    print(f"{name}: {per*1e3:.2f} ms/iter (total {min(times)*1e3:.1f} ms "
          f"- ~28 ms dispatch, compile {compile_s:.1f}s, "
          f"all {[round(t*1e3,1) for t in times]})")

  timeit("mesh_gather", gather_loop, x, ws)
  timeit("mesh_kernel", kernel_loop, e_pad, gs0, gr_pad, we, w1, masks)
  timeit("mesh_nodeside", node_loop, x, wn0, wn1)


if __name__ == "__main__":
  main()
