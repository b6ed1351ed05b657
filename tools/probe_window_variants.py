"""A/B the windowed g2m gather plan knobs on TPU (amortized in-jit loops).

Times the two-stage windowed sender gather (ops/window_gather.py) at
0.25°/mesh-6 for several (superchunk_edges, num_buckets, bucket penalty,
width_align) combinations, 8 iterations inside one jit per variant so the
~28 ms tunnel dispatch amortizes (rig rule 7). The shipping default is the
models' formula (se = layout/32 rounded to 512, penalty = ns*se); this
probe answers whether more buckets / narrower windows / finer alignment
buy anything beyond the measured 14.94 ms (round-5 clean baseline; flat
gather = 28.42 ms).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8


def main():
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.ops import window_gather
  from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum

  lat = np.arange(-90.0, 90.25, 0.25)
  lon = np.arange(0.0, 360.0, 0.25)
  art = artifact_lib.build_artifact(
      grid_lat=lat, grid_lon=lon, mesh_size=6,
      radius_query_fraction_edge_length=0.6, multimesh=True, cache_dir=None)
  G, C = art.num_grid_nodes, 512
  order = np.lexsort(
      (art.mesh_nodes_lon, -art.mesh_nodes_lat)).astype(np.int32)
  summer = BlockedSegmentSum(
      art.grid2mesh.receivers, art.num_mesh_nodes, block_nodes=256,
      chunk_edges=512, padded_input=True, node_order=order)
  L = summer.layout_length
  senders = summer.pad_edges(art.grid2mesh.senders)
  valid = summer.layout_index < summer.num_edges
  se_default = max(512, -(-L // 32 // 512) * 512)

  rs = np.random.RandomState(0)
  bf = jnp.bfloat16
  gp = jax.device_put(rs.randn(G, C).astype(np.float32)).astype(bf)

  def seeded(i, v):
    return v + bf(1e-6) * bf(i)

  variants = [
      # (name, se, num_buckets, penalty_rows, width_align)
      ("default(se/32,p=ns*se,b4)", se_default, 4, None, 512),
      ("nopenalty_b4", se_default, 4, 0, 512),
      ("nopenalty_b8", se_default, 8, 0, 512),
      ("se/64_b8_nopen", max(512, -(-L // 64 // 512) * 512), 8, 0, 512),
      ("se/16_b4_nopen", max(512, -(-L // 16 // 512) * 512), 4, 0, 512),
      ("se/64_b8_nopen_al1024", max(512, -(-L // 64 // 512) * 512), 8, 0,
       1024),
      ("se/128_b8_nopen", max(512, -(-L // 128 // 512) * 512), 8, 0, 512),
  ]

  orig_dp = window_gather._bucket_dp
  for name, se, nb, pen, wa in variants:
    if pen is not None:
      def patched(counts, widths, num_buckets, extra_bucket_penalty=0,
                  _pen=pen):
        return orig_dp(counts, widths, num_buckets, _pen)
      window_gather._bucket_dp = patched
    else:
      window_gather._bucket_dp = orig_dp
    plan = window_gather.plan_windowed_gather(
        senders, valid, G, superchunk_edges=se, num_buckets=nb,
        width_align=wa, max_expansion=None)
    window_gather._bucket_dp = orig_dp
    if plan is None:
      print(f"{name}: plan=None")
      continue
    base = jax.device_put(jnp.asarray(plan.base))
    local = jax.device_put(jnp.asarray(plan.local))

    @jax.jit
    def loop(gp, base, local, i, _plan=plan):
      def body(_, gp):
        gs = _plan(gp, base, local)
        return gp + bf(1e-7) * gs[:gp.shape[0]]
      gp = jax.lax.fori_loop(0, ITERS, body, seeded(i, gp))
      return jnp.mean(gp.astype(jnp.float32))

    t0 = time.perf_counter()
    v = float(loop(gp, base, local, 0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v)
    times = []
    for i in range(1, 5):
      t0 = time.perf_counter()
      float(loop(gp, base, local, i))
      times.append(time.perf_counter() - t0)
    per = (min(times) - 0.028) / ITERS
    print(f"{name}: {per*1e3:.2f} ms/iter ns={plan.num_superchunks} "
          f"buckets={len(plan.buckets)} traffic={plan.window_rows_total/G:.2f}xG "
          f"(widths {[b[2] for b in plan.buckets]}, compile {compile_s:.1f}s, "
          f"all {[round(t*1e3,1) for t in times]})", flush=True)


if __name__ == "__main__":
  main()
