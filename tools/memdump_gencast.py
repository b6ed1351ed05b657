"""AOT-compile the GenCast sample step and dump XLA's memory analysis.

Usage: python tools/memdump_gencast.py [resolution] [mesh_size]
Defaults 0.25 6 — the config whose HBM headroom on the 16 GB chip is the
deployment risk (VERDICT r3: ~300 MB margin pre-row-packed-masks).

Compile-only (no execution): the remote service does static buffer
assignment, so `compiled.memory_analysis()` (or the OOM error text) gives
the per-buffer breakdown.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  resolution = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
  mesh_size = int(sys.argv[2]) if len(sys.argv) > 2 else 6
  import jax
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
  import jax.numpy as jnp

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast, zoo
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  task = gencast.TASK
  chunks = 32 if resolution <= 0.5 else 1
  # The released GenCast architecture, from the single source of truth.
  predictor = zoo.gencast_custom(resolution, mesh_size).build(
      decode_chunks=chunks, encode_chunks=chunks)
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
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)

  def sample_step(p, r, inputs, targets, forcings):
    preds = predictor(p, r, inputs, targets, forcings)
    return jnp.mean(preds.data("temperature").astype(jnp.float32))

  lowered = jax.jit(sample_step).lower(params, rng, inputs, targets,
                                       forcings)
  print("lowered; compiling...", flush=True)
  try:
    compiled = lowered.compile()
  except Exception as e:  # noqa: BLE001 — we want the OOM breakdown text
    print("COMPILE FAILED:")
    print(str(e)[:20000])
    return
  ma = compiled.memory_analysis()
  print("memory analysis:", ma)
  try:
    arg = ma.argument_size_in_bytes / 2**30
    tmp = ma.temp_size_in_bytes / 2**30
    print(f"  argument size:  {arg:.2f} GiB")
    print(f"  output size:    {ma.output_size_in_bytes/2**30:.2f} GiB")
    print(f"  temp size:      {tmp:.2f} GiB")
    print(f"  total (args+temp): {arg + tmp:.2f} GiB of 15.75 GiB "
          f"⇒ headroom {15.75 - arg - tmp:.2f} GiB")
  except AttributeError:
    pass


if __name__ == "__main__":
  main()
