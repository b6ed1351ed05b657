"""One GenCast diffusion training step (loss + grads + AdamW) on one chip.

Usage: python tools/bench_train_gencast.py [resolution] [mesh_size]
Defaults 1.0 5. The denoiser runs once per training step (sampled σ,
spherical noise, λ(σ)-weighted MSE — reference gencast.py:218-269).
fused_aggregation off: training uses the chunked GNN paths whose backward
is per-chunk rematerialized.
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

  from graphcast_tpu import train
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast, zoo
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  resolution = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
  mesh_size = int(sys.argv[2]) if len(sys.argv) > 2 else 5
  chunks = 32 if resolution <= 0.5 else 1
  task = gencast.TASK
  # The released GenCast architecture, from the single source of truth.
  predictor = zoo.gencast_custom(resolution, mesh_size).build(
      decode_chunks=chunks, encode_chunks=chunks,
      fused_aggregation=False)
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  optimizer = train.graphcast_optimizer(peak_lr=1e-3)
  state = train.init_train_state(predictor, optimizer, rng, inputs, targets,
                                 forcings)
  step_fn = train.make_train_step(predictor, optimizer)
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  state, inputs, targets, forcings = jax.device_put(
      (state, inputs, targets, forcings))

  t0 = time.perf_counter()
  state, loss, _ = step_fn(state, rng, inputs, targets, forcings)
  loss0 = float(loss)
  compile_s = time.perf_counter() - t0
  assert np.isfinite(loss0), "non-finite training loss"
  times = []
  for i in range(3):
    r = jax.random.PRNGKey(i + 1)
    t0 = time.perf_counter()
    state, loss, _ = step_fn(state, r, inputs, targets, forcings)
    float(loss)
    times.append(time.perf_counter() - t0)
  print(f"gencast_train_step_{resolution}deg_mesh{mesh_size}: "
        f"{min(times):.3f} s (compile+first {compile_s:.1f}s, "
        f"loss0={loss0:.4f}, all {[round(t, 3) for t in times]})")
  import json
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  artifact = os.path.join(
      repo, f"BENCH_TRAIN_GENCAST_{str(resolution).replace('.', 'p')}.json")
  with open(artifact, "w") as f:
    json.dump({
        "metric": f"gencast_train_step_{resolution}deg_mesh{mesh_size}",
        "value": round(min(times), 3), "unit": "s",
        "compile_s": round(compile_s, 1),
        "note": ("diffusion loss+grads+AdamW on ONE 16 GB v5e; reference "
                 "ships no training path (external JAXline); reproduce with "
                 f"python tools/bench_train_gencast.py {resolution} "
                 f"{mesh_size}")}, f)
  print(f"# wrote {artifact}")


if __name__ == "__main__":
  main()
