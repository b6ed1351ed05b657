"""A/B: LayerNorm-statistics strategy inside the fused edge kernel.

Times the mesh-processor fused edge step at 0.25°/mesh-6 for
ln_stats in {vpu, mxu, off}:
  vpu — jnp.mean lane reductions (the round-2 baseline),
  mxu — ones-matmul row stats on the MXU (+ pltpu.repeat lane tiling),
  off — statistics skipped entirely (wrong numerics; the ceiling any
        LN-stat optimization can reach).
Rig rules: readback-forced timing, varied inputs, nothing else on the host.
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
  L = summer.layout_length
  print(f"# M={M} L={L} chunks={summer.total_chunks}")

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  e_pad = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gs0 = jax.device_put(rs.randn(L, C).astype(np.float32)).astype(bf)
  gr_pad = jax.device_put(
      rs.randn(summer.num_node_blocks * summer.block_nodes, C)
      .astype(np.float32)).astype(bf)
  mk = summer.onehot_masks()
  masks = jax.device_put((jnp.asarray(mk[0]), jnp.asarray(mk[1])))
  we = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  w1 = jax.device_put((rs.randn(C, C) / 23).astype(np.float32))
  b = jnp.zeros(C)
  one = jnp.ones(C)

  for mode in ("vpu", "mxu", "off"):
    step = FusedEdgeStep(summer, ln_stats=mode)

    @jax.jit
    def kernel_only(e, gs, gr, we, w1, mk, i, step=step):
      e = e + bf(1e-6) * bf(i)
      eout, agg = step(e, gs, gr, we, b, w1, b, one, b, masks=mk)
      return (jnp.mean(agg) + jnp.mean(eout.astype(jnp.float32)))

    # warm
    float(kernel_only(e_pad, gs0, gr_pad, we, w1, masks, 0))
    ts = []
    for i in range(1, 6):
      t0 = time.perf_counter()
      float(kernel_only(e_pad, gs0, gr_pad, we, w1, masks, i))
      ts.append(time.perf_counter() - t0)
    print(f"ln_stats={mode}: best {min(ts)*1e3:.2f} ms  "
          f"median {sorted(ts)[len(ts)//2]*1e3:.2f} ms")


if __name__ == "__main__":
  main()
