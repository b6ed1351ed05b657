"""Stage-level timing of one 0.25° GraphCast step on the real TPU.

Times encode (grid2mesh chunked), process (16 fused MP steps), decode
(mesh2grid chunked) and the full step separately, each as its own jitted
function with a forced scalar readback (see CLAUDE.md rig rules: timing must
force readback and vary an input per run; everything large rides as jit
arguments, never closure constants).

Usage: python tools/profile_step.py [--resolution 0.25] [--mesh-size 6]
"""

import argparse
import os
import time

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--resolution", type=float, default=0.25)
  ap.add_argument("--mesh-size", type=int, default=6)
  ap.add_argument("--latent", type=int, default=512)
  ap.add_argument("--msg-steps", type=int, default=16)
  ap.add_argument("--decode-chunks", type=int, default=32)
  ap.add_argument("--encode-chunks", type=int, default=25)
  ap.add_argument("--fused", type=int, default=1)
  ap.add_argument("--stages", type=str,
                  default="encode,process,decode,full")
  ap.add_argument("--reps", type=int, default=4)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.models.graphcast import GraphCast

  task = configs.TASK
  model = configs.ModelConfig(
      resolution=args.resolution, mesh_size=args.mesh_size,
      latent_size=args.latent, gnn_msg_steps=args.msg_steps, hidden_layers=1,
      radius_query_fraction_edge_length=0.6)
  gc = GraphCast(model, task, decode_chunks=args.decode_chunks,
                 encode_chunks=args.encode_chunks,
                 fused_aggregation=bool(args.fused))
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=args.resolution, batch=1, num_target_times=1)
  rng = jax.random.PRNGKey(0)
  params = gc.init(rng, inputs, targets, forcings)
  inputs = inputs.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  params, inputs, forcings = jax.device_put((params, inputs, forcings))

  gnf = jax.jit(gc._inputs_to_grid_node_features)(inputs, forcings)
  sel = jax.jit(gc.precompute_step_statics)(params, inputs)
  sel = jax.device_put(sel).get("static_edge_latents", {})
  n_mesh = gc._artifact.num_mesh_nodes
  n_grid = gc._artifact.num_grid_nodes
  latent = args.latent
  print(f"# grid={n_grid} mesh={n_mesh} "
        f"g2m_edges={gc._artifact.grid2mesh.senders.shape[0]} "
        f"mesh_edges={gc._artifact.mesh.senders.shape[0]} "
        f"m2g_edges={gc._artifact.mesh2grid.senders.shape[0]}")

  def seeded(i, x):
    # Vary input per run (tunnel rule) without a host transfer.
    return x + jnp.bfloat16(1e-6) * jnp.bfloat16(i)

  @jax.jit
  def run_encode(p, c, g, i):
    st = gc._statics(p)
    if gc._g2m_fused is not None and "g2m_const" in c:
      m, gr = gc._run_grid2mesh_fused(p, st, seeded(i, g), c["g2m_const"])
    else:
      m, gr = gc._run_grid2mesh_chunked(
          p, st, seeded(i, g), const=c.get("g2m_const"))
    return (jnp.mean(m.astype(jnp.float32))
            + jnp.mean(gr.astype(jnp.float32)))

  @jax.jit
  def run_process(p, m, i):
    st = gc._statics(p)
    out = gc._mesh_gnn.apply(
        p["mesh_gnn"], gc._mesh_graph(st, seeded(i, m)))
    return jnp.mean(out.nodes["mesh_nodes"].features.astype(jnp.float32))

  @jax.jit
  def run_decode(p, c, m, g, i):
    st = gc._statics(p)
    if gc._m2g_decoder is not None and "m2g_const_slot" in c:
      out = gc._run_mesh2grid_fused(p, st, seeded(i, m), g,
                                    c["m2g_const_slot"])
    else:
      out = gc._run_mesh2grid_chunked(
          p, st, seeded(i, m), g, const=c.get("m2g_const"))
    return jnp.mean(out.astype(jnp.float32))

  @jax.jit
  def run_full(p, c, inp, tgt, frc, i):
    inp = inp.map_data(
        lambda x: seeded(i, x)
        if jnp.issubdtype(x.dtype, jnp.floating) else x)
    pred = gc(p, None, inp, tgt, frc, static_edge_latents=c)
    return jnp.mean(pred.data("temperature").astype(jnp.float32))

  mesh_lat = jax.device_put(
      np.random.RandomState(0).randn(n_mesh, 1, latent).astype(np.float32)
  ).astype(jnp.bfloat16)
  grid_lat = jax.device_put(
      np.random.RandomState(1).randn(n_grid, 1, latent).astype(np.float32)
  ).astype(jnp.bfloat16)

  stages = {
      "encode": lambda i: run_encode(params, sel, gnf, i),
      "process": lambda i: run_process(params, mesh_lat, i),
      "decode": lambda i: run_decode(params, sel, mesh_lat, grid_lat, i),
      "full": lambda i: run_full(params, sel, inputs, targets, forcings, i),
  }
  want = [s for s in args.stages.split(",") if s]
  for name in want:
    fn = stages[name]
    t0 = time.perf_counter()
    v = float(fn(0))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), name
    times = []
    for i in range(1, args.reps + 1):
      t0 = time.perf_counter()
      float(fn(i))
      times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1e3:.1f} ms (compile+first {compile_s:.1f}s, "
          f"all {[round(t*1e3, 1) for t in times]})")


if __name__ == "__main__":
  main()
