"""Micro-benchmark: mesh2grid fused-decoder kernel vs its sender gather.

Separates the [3.1M-row] mesh_proj gather from the Pallas kernel proper to
find which dominates the decode stage (~55 ms/rollout-step at 0.25°).
Round-5: pieces loop 8x INSIDE one jit (lax.fori_loop, sequential
dependence) so the ~28 ms tunnel dispatch amortizes — same methodology as
profile_{mesh,encoder}_parts (rig rule 7). Rig rules: readback-forced
timing, varied inputs, everything as jit args.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.ops.pallas_decoder import FusedMesh2GridDecoder

  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6,
      radius_query_fraction_edge_length=0.6, multimesh=True, cache_dir=None)
  G, M, C = art.num_grid_nodes, art.num_mesh_nodes, 512
  bn = int(sys.argv[1]) if len(sys.argv) > 1 else 256
  dec = FusedMesh2GridDecoder(art.mesh2grid.senders, G, 227, block_nodes=bn)
  print(f"# G={G} M={M} blocks={dec.num_blocks} bn={bn} "
        f"out_pad={dec.out_pad}")

  rs = np.random.RandomState(0)
  mesh_proj = jax.device_put(rs.randn(M, C).astype(np.float32)).astype(
      jnp.bfloat16)
  grid = jax.device_put(
      rs.randn(dec.padded_grid, C).astype(np.float32)).astype(jnp.bfloat16)
  const = jax.device_put(
      rs.randn(3, dec.padded_grid, C).astype(np.float32)).astype(jnp.bfloat16)
  sq = {k: jax.device_put((rs.randn(C, C) / np.sqrt(C)).astype(np.float32))
        for k in ["wr", "w1", "wng", "wna", "wn1", "wd0"]}
  weights = {
      **sq,
      "b1": jnp.zeros(C), "escale": jnp.ones(C), "eoffset": jnp.zeros(C),
      "bn0": jnp.zeros(C), "bn1": jnp.zeros(C),
      "nscale": jnp.ones(C), "noffset": jnp.zeros(C),
      "bd0": jnp.zeros(C),
      "wd1": jax.device_put(
          (rs.randn(C, dec.out_pad) / np.sqrt(C)).astype(np.float32)),
      "bd1": jnp.zeros(dec.out_pad),
  }
  weights = jax.device_put(weights)
  senders_flat = jax.device_put(dec.senders_slot.reshape(-1))

  ITERS = 8
  bf = jnp.bfloat16

  @jax.jit
  def gather_only(mp, i):
    def body(_, mp):
      gs = mp[senders_flat]
      return mp + bf(1e-7) * gs[:mp.shape[0]]
    mp = jax.lax.fori_loop(0, ITERS, body, mp + bf(1e-6) * bf(i))
    return jnp.mean(mp.astype(jnp.float32))

  @jax.jit
  def full_call(g, mp, c, w, i):
    def body(_, carry):
      g, mp = carry
      out = dec(g[:dec.num_grid], mp, c, w)
      mp = mp + bf(1e-7) * jnp.pad(
          out[:mp.shape[0], :mp.shape[1]].astype(bf),
          ((0, max(0, mp.shape[0] - out.shape[0])),
           (0, max(0, mp.shape[1] - out.shape[1]))))
      return g, mp
    _, mp = jax.lax.fori_loop(0, ITERS, body, (g + bf(1e-6) * bf(i), mp))
    return jnp.mean(mp.astype(jnp.float32))

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

  timeit("gather_only", gather_only, mesh_proj)
  timeit("full_call", full_call, grid, mesh_proj, const, weights)


if __name__ == "__main__":
  main()
