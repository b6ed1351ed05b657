"""Stage-level timing of one GenCast denoiser evaluation on the real TPU.

Times encode (fused grid2mesh), transformer (N-layer splash), decode
(fused mesh2grid) and one full denoiser apply, each as its own jitted
function with forced scalar readback and a varied input per run (rig
rules). The 12h GenCast step = 40 denoiser evals, so step-time ≈ 40 ×
(full − ~28 ms dispatch overhead).

Usage: python tools/profile_denoiser.py [--resolution 0.25] [--mesh-size 6]
    [--block-q 1024] [--block-kv 512] [--layers 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--resolution", type=float, default=0.25)
  ap.add_argument("--mesh-size", type=int, default=6)
  ap.add_argument("--latent", type=int, default=512)
  ap.add_argument("--layers", type=int, default=16)
  ap.add_argument("--k-hop", type=int, default=16)
  ap.add_argument("--block-q", type=int, default=1024)
  ap.add_argument("--block-kv", type=int, default=512)
  ap.add_argument("--node-ordering", type=str, default="rcm")
  ap.add_argument("--stages", type=str,
                  default="encode,transformer,decode,full")
  ap.add_argument("--reps", type=int, default=4)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      Denoiser, DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig

  task = gencast.TASK
  st_cfg = SparseTransformerConfig(
      attention_k_hop=args.k_hop, d_model=args.latent,
      num_layers=args.layers, num_heads=4, attention_type="splash_mha",
      block_q=args.block_q, block_kv=args.block_kv,
      node_ordering=args.node_ordering)
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=args.mesh_size,
      latent_size=args.latent, hidden_layers=1,
      node_output_size=gencast.configs.num_output_channels(task))
  den = Denoiser(NoiseEncoderConfig(), arch_cfg)
  arch = den._architecture

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=args.resolution, batch=1, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  noise_levels = jnp.asarray([1.0])
  params = den.init(rng, inputs, targets, noise_levels, forcings)
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  params, inputs, targets, forcings = jax.device_put(
      (params, inputs, targets, forcings))

  all_inputs, all_forcings = den._assemble(
      params, inputs, targets, noise_levels, forcings)
  gnf, cond = jax.jit(arch._split_features_and_conditioning)(
      all_inputs, all_forcings)
  n_mesh = arch._artifact.num_mesh_nodes
  n_grid = arch._artifact.num_grid_nodes
  if st_cfg.attention_type == "splash_mha":
    m = arch._mesh_transformer._transformer._splash._map
    dens = float(m["kv_count"].sum()) / (m["nq"] * m["nkv"])
    print(f"# mesh={n_mesh} grid={n_grid} splash block-density={dens:.4f} "
          f"nq={m['nq']} nkv={m['nkv']} ma={m['ma']} "
          f"bq={args.block_q} bkv={args.block_kv}", flush=True)

  def seeded(i, x):
    return x + jnp.bfloat16(1e-6) * jnp.bfloat16(i)

  ap_params = params["architecture"]

  @jax.jit
  def run_encode(p, g, c, i):
    st = arch._statics(p)
    m, gr = arch._run_grid2mesh_fused(p, st, seeded(i, g), c)
    return (jnp.mean(m.astype(jnp.float32))
            + jnp.mean(gr.astype(jnp.float32)))

  @jax.jit
  def run_transformer(p, m, c, i):
    st = arch._statics(p)
    splash_statics = {k[len("splash_"):]: v for k, v in st.items()
                      if k.startswith("splash_")}
    out = arch._mesh_transformer.apply(
        p["mesh_transformer"], seeded(i, m), c,
        kernel_statics=splash_statics or None)
    return jnp.mean(out.astype(jnp.float32))

  @jax.jit
  def run_decode(p, m, g, c, i):
    st = arch._statics(p)
    out = arch._run_mesh2grid_fused(p, st, seeded(i, m), g, c)
    return jnp.mean(out.astype(jnp.float32))

  @jax.jit
  def run_full(p, inp, tgt, frc, i):
    inp2 = inp.map_data(
        lambda x: seeded(i, x)
        if jnp.issubdtype(x.dtype, jnp.floating) else x)
    out = den.apply(p, inp2, tgt, noise_levels, frc)
    return jnp.mean(out.data("temperature").astype(jnp.float32))

  mesh_lat = jax.device_put(np.random.RandomState(0).randn(
      n_mesh, 1, args.latent).astype(np.float32)).astype(jnp.bfloat16)
  grid_lat = jax.device_put(np.random.RandomState(1).randn(
      n_grid, 1, args.latent).astype(np.float32)).astype(jnp.bfloat16)

  stages = {
      "encode": lambda i: run_encode(ap_params, gnf, cond, i),
      "transformer": lambda i: run_transformer(ap_params, mesh_lat, cond, i),
      "decode": lambda i: run_decode(ap_params, mesh_lat, grid_lat, cond, i),
      "full": lambda i: run_full(params, inputs, targets, forcings, i),
  }
  for name in [s for s in args.stages.split(",") if s]:
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
    print(f"{name}: {min(times)*1e3:.1f} ms (compile+first {compile_s:.1f}s,"
          f" all {[round(t*1e3, 1) for t in times]})", flush=True)


if __name__ == "__main__":
  main()
