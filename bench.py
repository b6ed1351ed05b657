"""Benchmark: GraphCast 10-day (40-step) autoregressive rollout on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: GraphCast_small-equivalent (1.0°/13-level grid, mesh-5 multi-mesh,
latent 512, 16 message-passing steps), random weights, bf16 activations,
single fully-jitted lax.scan rollout of 40 six-hour steps.

vs_baseline compares against the driver north-star budget of 60 s for a
40-step rollout (BASELINE.json; the north star is stated for 0.25°/37-level —
this round benches the 1.0°/13-level flagship config; value > 1 means faster
than the 60 s budget).
"""

import json
import os
import sys
import time

import numpy as np


def main():
  import jax
  try:
    # Persistent compile cache: large-grid programs (0.25°) take minutes to
    # compile; cache across runs.
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                     "xla_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
  except Exception:
    pass

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.rollout import extend_targets_template
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (
      Autoregressive, Bfloat16Cast, InputsAndResiduals)

  num_steps = int(os.environ.get("BENCH_NUM_STEPS", "40"))
  resolution = float(os.environ.get("BENCH_RESOLUTION", "1.0"))
  mesh_size = int(os.environ.get("BENCH_MESH_SIZE", "5"))
  latent = int(os.environ.get("BENCH_LATENT", "512"))
  msg_steps = int(os.environ.get("BENCH_MSG_STEPS", "16"))

  task = configs.TASK_13
  model = configs.ModelConfig(
      resolution=resolution, mesh_size=mesh_size, latent_size=latent,
      gnn_msg_steps=msg_steps, hidden_layers=1,
      radius_query_fraction_edge_length=0.6)

  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(model, task)),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=False)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=2)
  targets = extend_targets_template(targets, num_steps)
  forcings_fs = extend_targets_template(forcings, num_steps)

  rng = jax.random.PRNGKey(0)
  t0 = time.perf_counter()
  params = predictor.init(rng, inputs, targets, forcings_fs)
  init_s = time.perf_counter() - t0

  # Keep all operands device-resident (as in a real serving loop) so we
  # measure compute, not host→device transfer of the initial state.
  inputs, targets, forcings_fs = jax.device_put((inputs, targets,
                                                 forcings_fs))

  import jax.numpy as jnp

  @jax.jit
  def rollout_fn(params, rng, inputs, targets_template, forcings, scale):
    # The returned scalar forces full execution on readback — on some
    # backends (axon tunnel) block_until_ready alone does not block.
    preds = predictor(params, rng, inputs * scale, targets_template, forcings)
    return preds, jnp.mean(preds.data("temperature").astype(jnp.float32))

  # Compile + first run.
  t0 = time.perf_counter()
  preds, mean = rollout_fn(params, rng, inputs, targets, forcings_fs, 1.0)
  float(mean)
  compile_s = time.perf_counter() - t0

  # Steady state (best of 3); vary an input scalar so no run can be cached.
  times = []
  for i in range(3):
    t0 = time.perf_counter()
    preds, mean = rollout_fn(params, rng, inputs, targets, forcings_fs,
                             1.0 + 1e-6 * i)
    float(mean)
    times.append(time.perf_counter() - t0)
  steady_s = min(times)

  assert np.isfinite(float(mean)), "NaN output"

  baseline_budget_s = 60.0
  result = {
      "metric": f"graphcast_{resolution}deg_13lev_mesh{mesh_size}_"
                f"{num_steps}step_rollout",
      "value": round(steady_s, 3),
      "unit": "s",
      "vs_baseline": round(baseline_budget_s / steady_s, 3),
  }
  print(json.dumps(result))
  print(f"# init={init_s:.1f}s compile+first={compile_s:.1f}s "
        f"steady={steady_s:.3f}s device={jax.devices()[0].device_kind}",
        file=sys.stderr)


if __name__ == "__main__":
  main()
