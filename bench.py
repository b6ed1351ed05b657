"""Benchmark: GraphCast 10-day (40-step) autoregressive rollout on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default config is the north-star setup (BASELINE.json): 0.25°/37-level grid,
mesh-6 multi-mesh, latent 512, 16 message-passing steps, random weights,
bf16 state, one fully-jitted lax.scan of 40 six-hour steps returning the
final state (at 0.25° the full trajectory is ~25 GB and must stream to host
— the reference has the same constraint, rollout.py:350-360; the compute
benchmarked here is the full 40 steps either way). Runs on a 16 GB v5e via
chunked encode/decode — the reference needs a 32 GB-class chip for this
config (docs/cloud_vm_setup.md:44).

vs_baseline = 60 s north-star budget / measured seconds (>1 ⇒ faster than
target). Falls back to a 1.0°/13-level full-trajectory rollout if the
0.25° config cannot run (e.g. no compiler service / low memory).

Env knobs: BENCH_RESOLUTION, BENCH_MESH_SIZE, BENCH_NUM_STEPS, BENCH_LATENT,
BENCH_MSG_STEPS, BENCH_FALLBACK_ONLY=1.
"""

import json
import os
import sys
import time

import numpy as np


def _env_flag(name: str) -> bool:
  """Boolean env knob: only "1"/"true"/"yes" (case-insensitive) are ON;
  unset/""/"0"/"false"/"no"/"off" are OFF; anything else raises (silently
  treating "false" as ON was a measured footgun — as was the earlier
  os.environ truthiness treating "0" as ON)."""
  val = os.environ.get(name, "0").strip().lower()
  if val in ("1", "true", "yes", "on"):
    return True
  if val in ("", "0", "false", "no", "off"):
    return False
  raise ValueError(f"unrecognized boolean value {name}={val!r}")


def _build(resolution, mesh_size, latent, msg_steps, task,
           decode_chunks, encode_chunks):
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (
      Autoregressive, Bfloat16Cast, InputsAndResiduals)

  model = configs.ModelConfig(
      resolution=resolution, mesh_size=mesh_size, latent_size=latent,
      gnn_msg_steps=msg_steps, hidden_layers=1,
      radius_query_fraction_edge_length=0.6)
  fused = os.environ.get("BENCH_FUSED")
  fused = None if fused is None else bool(int(fused))
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(model, task, decode_chunks=decode_chunks,
                                 encode_chunks=encode_chunks,
                                 fused_aggregation=fused)),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=False)
  return predictor


def _bench_north_star(num_steps):
  """0.25°/37-level final-state rollout, bf16 device state."""
  import jax
  import jax.numpy as jnp
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.rollout import extend_targets_template

  resolution = float(os.environ.get("BENCH_RESOLUTION", "0.25"))
  mesh_size = int(os.environ.get("BENCH_MESH_SIZE", "6"))
  latent = int(os.environ.get("BENCH_LATENT", "512"))
  msg_steps = int(os.environ.get("BENCH_MSG_STEPS", "16"))
  task = configs.TASK  # 37 levels

  predictor = _build(resolution, mesh_size, latent, msg_steps, task,
                     decode_chunks=32, encode_chunks=25)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)

  inputs = inputs.astype(jnp.bfloat16)
  targets1 = targets.astype(jnp.bfloat16)
  forcings_n = extend_targets_template(forcings, num_steps).astype(
      jnp.bfloat16)
  params, inputs, targets1, forcings_n = jax.device_put(
      (params, inputs, targets1, forcings_n))

  @jax.jit
  def rollout_final(p, r, inputs, template1, forcings):
    final = predictor.rollout_final(p, r, inputs, template1, forcings)
    return jnp.mean(final.data("temperature").astype(jnp.float32))

  t0 = time.perf_counter()
  v = float(rollout_final(params, rng, inputs, targets1, forcings_n))
  compile_s = time.perf_counter() - t0
  assert np.isfinite(v), "non-finite rollout output"

  times = []
  for i in range(3):
    r = jax.random.PRNGKey(i)
    t0 = time.perf_counter()
    float(rollout_final(params, r, inputs, targets1, forcings_n))
    times.append(time.perf_counter() - t0)
  steady = min(times)
  metric = (f"graphcast_{resolution}deg_37lev_mesh{mesh_size}_"
            f"{num_steps}step_rollout")
  return metric, steady, compile_s


def _bench_fallback(num_steps):
  """1.0°/13-level full-trajectory rollout."""
  import jax
  import jax.numpy as jnp
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.rollout import extend_targets_template

  task = configs.TASK_13
  predictor = _build(1.0, 5, 512, 16, task, 1, 1)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=1.0, batch=1, num_target_times=2)
  targets = extend_targets_template(targets, num_steps)
  forcings_n = extend_targets_template(forcings, num_steps)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings_n)
  params, inputs, targets, forcings_n = jax.device_put(
      (params, inputs, targets, forcings_n))

  @jax.jit
  def rollout_fn(p, r, inputs, targets_template, forcings):
    preds = predictor(p, r, inputs, targets_template, forcings)
    return jnp.mean(preds.data("temperature").astype(jnp.float32))

  t0 = time.perf_counter()
  v = float(rollout_fn(params, rng, inputs, targets, forcings_n))
  compile_s = time.perf_counter() - t0
  assert np.isfinite(v)
  times = []
  for i in range(3):
    r = jax.random.PRNGKey(i)
    t0 = time.perf_counter()
    float(rollout_fn(params, r, inputs, targets, forcings_n))
    times.append(time.perf_counter() - t0)
  return (f"graphcast_1.0deg_13lev_mesh5_{num_steps}step_rollout",
          min(times), compile_s)


def _bench_gencast():
  """One GenCast 12h forecast step (20 noise levels x 2 denoiser evals = 40
  full network evaluations) at 1.0°/mesh-5 with the splash-attention
  processor, one member, one chip. Also serves as the per-round on-real-TPU
  validation of the Pallas splash kernel (CI runs it interpret-mode only).

  Baseline: reference GenCast 1.0° takes ~3 min per 30-step member on a v5e
  chip post-compile (docs/cloud_vm_setup.md:30-31) ⇒ 6.0 s per 12h step.
  """
  import jax
  import jax.numpy as jnp
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast, zoo
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  resolution = float(os.environ.get("BENCH_GENCAST_RESOLUTION", "1.0"))
  mesh_size = int(os.environ.get("BENCH_GENCAST_MESH_SIZE", "5"))
  task = gencast.TASK
  # The released GenCast architecture, from the single source of truth.
  predictor = zoo.gencast_custom(resolution, mesh_size).build()
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
  # bf16 device state (like the GraphCast north star): activations follow
  # the input dtype, so this halves the denoiser working set and runs the
  # splash kernel in bf16. Params stay f32 masters.
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  params, inputs, targets, forcings = jax.device_put(
      (params, inputs, targets, forcings))

  @jax.jit
  def sample_step(p, r, inputs, targets, forcings):
    # Everything large rides as jit arguments (rig rule: closure constants
    # inline into the HLO; at 0.25° the input arrays alone are ~700 MB).
    preds = predictor(p, r, inputs, targets, forcings)
    return jnp.mean(preds.data("temperature").astype(jnp.float32))

  t0 = time.perf_counter()
  v = float(sample_step(params, rng, inputs, targets, forcings))
  compile_s = time.perf_counter() - t0
  assert np.isfinite(v), "non-finite gencast sample"
  times = []
  for i in range(3):
    t0 = time.perf_counter()
    float(sample_step(params, jax.random.PRNGKey(i + 1), inputs, targets,
                      forcings))
    times.append(time.perf_counter() - t0)
  steady = min(times)
  metric = (f"gencast_{resolution}deg_mesh{mesh_size}_splash_12h_step"
            "_40evals")
  return metric, steady, compile_s


def main():
  import jax
  try:
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                     "xla_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
  except Exception:
    pass

  num_steps = int(os.environ.get("BENCH_NUM_STEPS", "40"))
  baseline_budget_s = 60.0  # BASELINE.json north star for the 40-step rollout
  # Reference seconds per 12h step per member: 1.0° ≈ 6 s (3 min / 30 steps
  # on a v5e, docs/cloud_vm_setup.md:30-31); 0.25° ≈ 16 s (8 min / 30 steps
  # on 8x v5p 32 GB, docs/cloud_vm_setup.md:36).
  # Parse as float so equivalent spellings (0.25 / 0.250 / .25) pick the
  # same baseline and artifact as the model built from it.
  gc_resolution = float(os.environ.get("BENCH_GENCAST_RESOLUTION", "1.0"))
  gencast_baseline_s = 16.0 if gc_resolution == 0.25 else 6.0
  gc_artifact = ("BENCH_GENCAST_025.json" if gc_resolution == 0.25
                 else "BENCH_GENCAST.json")

  # GenCast metric (captured to BENCH_GENCAST.json every run; primary line
  # with BENCH_GENCAST=1).
  gc_result = None
  if not _env_flag("BENCH_SKIP_GENCAST"):
    try:
      gc_metric, gc_steady, gc_compile = _bench_gencast()
      gc_result = {
          "metric": gc_metric,
          "value": round(gc_steady, 3),
          "unit": "s",
          "vs_baseline": round(gencast_baseline_s / gc_steady, 3),
      }
      with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             gc_artifact), "w") as f:
        json.dump({**gc_result, "compile_s": round(gc_compile, 1)}, f)
        f.write("\n")
      print(f"# gencast: {json.dumps(gc_result)} compile={gc_compile:.1f}s",
            file=sys.stderr)
    except Exception as e:
      print(f"# gencast bench failed ({type(e).__name__}: {e})",
            file=sys.stderr)

  if _env_flag("BENCH_GENCAST"):
    if gc_result is None:
      raise SystemExit("BENCH_GENCAST=1 but the gencast bench failed")
    print(json.dumps(gc_result))
    return

  metric = steady = compile_s = None
  if not _env_flag("BENCH_FALLBACK_ONLY"):
    try:
      metric, steady, compile_s = _bench_north_star(num_steps)
    except Exception as e:  # OOM / no compile service → fall back
      print(f"# north-star config failed ({type(e).__name__}); "
            f"falling back to 1.0deg", file=sys.stderr)
  if metric is None:
    metric, steady, compile_s = _bench_fallback(num_steps)

  result = {
      "metric": metric,
      "value": round(steady, 3),
      "unit": "s",
      "vs_baseline": round(baseline_budget_s / steady, 3),
  }
  print(json.dumps(result))
  print(f"# compile+first={compile_s:.1f}s steady={steady:.3f}s "
        f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
  main()
