"""TPU smoke of sequence-parallel splash attention (non-interpret).

CI exercises SequenceParallelAttention only in interpret mode on the CPU
mesh; this runs the REAL kernel path — shard_map + pallas_call with
scalar-prefetch block maps as array operands — on TPU hardware with a
1-device Mesh(("sp",)), at the GenCast 1.0°/mesh-5 splash config
(k-hop-16 mask, bq=bkv from the transformer defaults), forward + grads,
checked against the non-SP kernel on the same chip.

De-risks the shard_map+Pallas interaction for real multi-chip sp>1 runs
(reference knob: sparse_transformer.py:271-273, which the reference never
uses > 1).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  import jax
  import jax.numpy as jnp
  from jax.sharding import Mesh

  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.geometry import icosahedron as ico
  from graphcast_tpu.models.sparse_transformer import (
      k_hop_adjacency)
  from graphcast_tpu.ops import splash

  assert jax.default_backend() == "tpu", jax.devices()

  # Real GenCast 1.0° mesh-5 splash geometry (BFS-patch ordering like the
  # model's own mask build).
  mesh_size = int(os.environ.get("SP_MESH_SIZE", "5"))
  meshes = ico.get_mesh_hierarchy(mesh_size)
  tri_mesh = artifact_lib.permute_mesh_to_banded(meshes[-1])
  senders, receivers = ico.faces_to_edges(tri_mesh.faces)
  n = tri_mesh.vertices.shape[0]
  mask = k_hop_adjacency(senders, receivers, n, 16)
  attn = splash.BlockSparseAttention.from_mask(
      mask, block_q=256, block_kv=256, interpret=False)
  device_mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
  sp_attn = attn.sequence_parallel(device_mesh, "sp")

  rng = jax.random.PRNGKey(0)
  kq, kk, kv_, kt = jax.random.split(rng, 4)
  shape = (1, n, 4, 128)
  q = jax.random.normal(kq, shape, jnp.bfloat16)
  k = jax.random.normal(kk, shape, jnp.bfloat16)
  v = jax.random.normal(kv_, shape, jnp.bfloat16)
  target = jax.random.normal(kt, shape, jnp.bfloat16)
  statics = {key: jax.device_put(jnp.asarray(val))
             for key, val in sp_attn.host_statics().items()}
  base_statics = {key: jax.device_put(jnp.asarray(val))
                  for key, val in attn.host_statics().items()}

  def loss_sp(q, k, v):
    out = sp_attn(q, k, v, statics=statics)
    return jnp.sum((out - target).astype(jnp.float32) ** 2)

  def loss_1(q, k, v):
    out = attn(q, k, v, statics=base_statics)
    return jnp.sum((out - target).astype(jnp.float32) ** 2)

  fwd_sp = jax.jit(loss_sp)
  fwd_1 = jax.jit(loss_1)
  g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))
  g_1 = jax.jit(jax.grad(loss_1, argnums=(0, 1, 2)))

  t0 = time.perf_counter()
  v_sp = float(fwd_sp(q, k, v))
  compile_fwd = time.perf_counter() - t0
  v_1 = float(fwd_1(q, k, v))
  np.testing.assert_allclose(v_sp, v_1, rtol=1e-2)

  t0 = time.perf_counter()
  gs = g_sp(q, k, v)
  gs = [np.asarray(x, np.float32) for x in gs]
  compile_bwd = time.perf_counter() - t0
  g1 = [np.asarray(x, np.float32) for x in g_1(q, k, v)]
  for a, b, name in zip(gs, g1, "qkv"):
    np.testing.assert_allclose(a, b, rtol=0.1, atol=0.5,
                               err_msg=f"d{name} mismatch")

  # Steady-state timing, readback-forced, varied input.
  times = []
  for i in range(3):
    qi = q + jnp.bfloat16(i * 1e-3)
    t0 = time.perf_counter()
    float(fwd_sp(qi, k, v))
    times.append(time.perf_counter() - t0)
  print(f"sp_splash_tpu_smoke OK: mesh-{mesh_size} n={n} "
        f"fwd+loss {min(times)*1e3:.1f} ms (compile fwd {compile_fwd:.1f}s "
        f"bwd {compile_bwd:.1f}s); forward and grads match non-SP kernel")


if __name__ == "__main__":
  main()
