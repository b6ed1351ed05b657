"""Splash kernel in-kernel cost attribution at the GenCast config.

Round-4 finding: the k-hop-16 mask under BFS-patch ordering has ZERO fully
unmasked blocks at any practical tile size (0.7% even at 64x64), so the
full-block fast path never triggers in the real models. This tool uses that
fast path as an experiment knob instead: forcing mask_rows=0 on every slot
runs the whole sweep through the no-masking branch — an incorrect result
but a valid TIMING ceiling that isolates the bitmap unpack + select cost
from the rest of the streaming softmax.

Variants:
  current — production statics (all partial blocks, masked path)
  nomask  — all mask_rows forced 0 (no unpack/select; upper bound)

Usage: python tools/profile_splash_kernel.py [mesh_size] [layers]
Env: SPLASH_BQ / SPLASH_BKV override the forward tile sizes (defaults
512/512 — the production config) for block-size sweeps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  mesh_size = int(sys.argv[1]) if len(sys.argv) > 1 else 6
  layers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.geometry import icosahedron as ico
  from graphcast_tpu.models.sparse_transformer import k_hop_adjacency
  from graphcast_tpu.ops import splash

  bq = int(os.environ.get("SPLASH_BQ", "512"))
  bkv = int(os.environ.get("SPLASH_BKV", "512"))
  meshes = ico.get_mesh_hierarchy(mesh_size)
  # Patch ordering aligned to the q-block size (what the model does).
  m = artifact_lib.permute_mesh_to_banded(meshes[-1], patch_size=bq)
  s, r = ico.faces_to_edges(m.faces)
  n = m.vertices.shape[0]
  mask = k_hop_adjacency(s, r, n, 16)
  attn = splash.BlockSparseAttention.from_mask(
      mask, block_q=bq, block_kv=bkv, interpret=False)
  statics_np = attn.host_statics()
  print(f"# tiles: block_q={bq} block_kv={bkv}")
  act = int(statics_np["kv_count"].sum())
  print(f"# mesh-{mesh_size} n={n} active_blocks={act} "
        f"partial_table_rows={statics_np['mask_blocks'].shape[0]}")

  rng = np.random.RandomState(0)
  bh = 4  # batch*heads at the GenCast config
  q = jnp.asarray(rng.randn(1, n, bh, 128), jnp.bfloat16)
  k = jnp.asarray(rng.randn(1, n, bh, 128), jnp.bfloat16)
  v = jnp.asarray(rng.randn(1, n, bh, 128), jnp.bfloat16)

  def run_variant(name, statics):
    statics = {kk: jax.device_put(jnp.asarray(vv))
               for kk, vv in statics.items()}

    @jax.jit
    def f(q, k, v, statics):
      x = q
      for _ in range(layers):
        x = attn(x, k, v, statics=statics)
      return jnp.mean(x.astype(jnp.float32))

    t0 = time.perf_counter()
    float(f(q, k, v, statics))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(5):
      qi = q + jnp.bfloat16(i * 1e-3)
      t0 = time.perf_counter()
      float(f(qi, k, v, statics))
      times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:8s}: {best*1e3:7.1f} ms / {layers} layers "
          f"({best/layers*1e3:.2f} ms/layer; compile {compile_s:.0f}s; "
          f"all {[round(t*1e3) for t in times]})")
    return best

  t_cur = run_variant("current", statics_np)
  nomask = dict(statics_np)
  nomask["mask_rows"] = np.zeros_like(statics_np["mask_rows"])
  # The all-partial map statically compiles the masked path only; flip the
  # specialization knob so the forced row-0 slots actually take the
  # no-masking branch.
  attn._map["has_full"] = True
  t_no = run_variant("nomask", nomask)
  print(f"# masking (unpack+select) share of forward kernel: "
        f"{(t_cur - t_no) / t_cur:.1%}")


if __name__ == "__main__":
  main()
