"""Lists large closure constants in the GenCast 0.25° sample step.

Traces the bench's jitted function on CPU (no compile) and reports every
jaxpr const ≥ 1 MB — these inline into the HLO and are what overflows the
remote compile service's request limit (HTTP 413).
"""

import sys

import numpy as np


def main():
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  resolution = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
  mesh_size = int(sys.argv[2]) if len(sys.argv) > 2 else 6
  task = gencast.TASK
  st_cfg = SparseTransformerConfig(
      attention_k_hop=16, d_model=512, num_layers=16, num_heads=4,
      attention_type="splash_mha")
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=mesh_size, latent_size=512,
      hidden_layers=1)
  predictor = gencast.GenCast(
      task_config=task,
      denoiser_architecture_config=arch_cfg,
      sampler_config=gencast.SamplerConfig(),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig(),
      fused_aggregation=True)
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  def fn(p, r, inputs, targets, forcings):
    preds = predictor(p, r, inputs, targets, forcings)
    return jnp.mean(preds.data("temperature").astype(jnp.float32))

  print("# tracing ...", flush=True)
  jaxpr = jax.make_jaxpr(fn)(params, rng, inputs, targets, forcings)
  total = 0
  rows = []
  for c in jaxpr.consts:
    a = np.asarray(c)
    nb = a.size * a.dtype.itemsize
    total += nb
    if nb >= 1 << 20:
      rows.append((nb, a.shape, str(a.dtype)))
  rows.sort(reverse=True)
  for nb, shape, dt in rows[:40]:
    print(f"{nb/1e6:9.1f} MB  {dt:10s} {shape}")
  print(f"# total consts: {total/1e6:.1f} MB ({len(jaxpr.consts)} consts)")


if __name__ == "__main__":
  main()
