"""TPU smoke + A/B of the portable triblockdiag attention backend.

CI exercises triblockdiag_mha only on CPU; this runs it on TPU hardware
at the GenCast mesh-4 (or SMOKE_MESH_SIZE) k-hop-16 config through the
full Transformer (same weights) under all three attention backends and
checks splash / triblockdiag / dense agree, then times each. The
triblockdiag path is the fallback for non-Pallas targets and for meshes
whose RCM bandwidth makes banded-dense cheaper than block-sparse
(reference analogue: sparse_transformer.py:144-207).
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
  from graphcast_tpu.geometry import icosahedron as ico
  from graphcast_tpu.models.sparse_transformer import (
      SparseTransformerConfig, Transformer, k_hop_adjacency)

  on_tpu = jax.default_backend() == "tpu"
  if not on_tpu and not os.environ.get("SMOKE_ALLOW_CPU"):
    raise SystemExit(f"expected TPU backend, got {jax.devices()} "
                     "(SMOKE_ALLOW_CPU=1 runs interpret-mode for CI)")

  mesh_size = int(os.environ.get("SMOKE_MESH_SIZE", "4"))
  meshes = ico.get_mesh_hierarchy(mesh_size)
  tri_mesh = artifact_lib.permute_mesh_to_banded(meshes[-1])
  senders, receivers = ico.faces_to_edges(tri_mesh.faces)
  n = tri_mesh.vertices.shape[0]
  adjacency = k_hop_adjacency(senders, receivers, n, 16)

  rng = jax.random.PRNGKey(0)
  kx, kc = jax.random.split(rng)
  d_model, cond = 512, 16
  x = jax.random.normal(kx, (1, n, d_model), jnp.bfloat16)
  gnc = jax.random.normal(kc, (1, cond), jnp.bfloat16)

  results, timings = {}, {}
  params = None
  for backend in ("splash_mha", "triblockdiag_mha", "mha"):
    cfg = SparseTransformerConfig(
        attention_k_hop=16, d_model=d_model, num_layers=2, num_heads=4,
        attention_type=backend)
    tr = Transformer(adjacency, cfg, interpret=None if on_tpu else True)
    if params is None:
      params = tr.init(jax.random.PRNGKey(1), cond)
    statics = {k: jax.device_put(jnp.asarray(v))
               for k, v in tr.host_kernel_statics().items()}

    @jax.jit
    def fwd(p, x, g, s, tr=tr):
      out = tr.apply(p, x, g, kernel_statics=s)
      return out, jnp.mean(out.astype(jnp.float32))

    t0 = time.perf_counter()
    out, m = fwd(params, x, gnc, statics)
    float(m)
    compile_s = time.perf_counter() - t0
    results[backend] = np.asarray(out, np.float32)
    times = []
    for i in range(3):
      xi = x + jnp.bfloat16(i * 1e-3)
      t0 = time.perf_counter()
      _, mi = fwd(params, xi, gnc, statics)
      float(mi)
      times.append(time.perf_counter() - t0)
    timings[backend] = min(times)
    print(f"{backend}: {min(times)*1e3:.1f} ms fwd (compile {compile_s:.1f}s)")

  ref = results["mha"]
  for backend in ("splash_mha", "triblockdiag_mha"):
    err = np.max(np.abs(results[backend] - ref))
    scale = np.max(np.abs(ref))
    print(f"{backend} vs dense: max_abs_err={err:.4f} (scale {scale:.2f})")
    assert err <= 0.1 * scale + 0.05, f"{backend} diverges from dense"
  print(f"triblockdiag_tpu_smoke OK: mesh-{mesh_size} n={n}, all three "
        f"backends agree on {jax.default_backend()}")


if __name__ == "__main__":
  main()
