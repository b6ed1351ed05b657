"""GenCast ROLLOUT benchmark: 30-step (12h) × N-member chunked-ensemble
forecast at 1.0°/mesh-5 on one chip, via rollout.chunked_ensemble_prediction.

The recorded BENCH_GENCAST.json is a single 12h step; the reference's
headline is a full 30-step multi-member rollout (BASELINE.md: 4 samples ×
30 steps post-compile ≈ 3 min on FOUR v5e chips ⇒ 6 chip-seconds per
member-step, docs/cloud_vm_setup.md:30-31). This bench catches the
inter-step/solver/host-sync overheads a single jitted step hides: the
chunked generator feeds predictions back as inputs across jit boundaries.

Rig rules honoured: trajectory stays ON DEVICE (pull_to_host=False —
device→host is ~10 MB/s through the tunnel and would swamp compute);
timing forces a scalar readback; rng varies per run.

Env knobs: ROLLOUT_MEMBERS (default 2), ROLLOUT_STEPS (30),
ROLLOUT_CHUNK (1; GenCast predicts one 12h step per call).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  members = int(os.environ.get("ROLLOUT_MEMBERS", "2"))
  num_steps = int(os.environ.get("ROLLOUT_STEPS", "30"))
  chunk = int(os.environ.get("ROLLOUT_CHUNK", "1"))
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu import rollout
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  task = gencast.TASK
  st_cfg = SparseTransformerConfig(
      attention_k_hop=16, d_model=512, num_layers=16, num_heads=4,
      attention_type="splash_mha")
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=5, latent_size=512,
      hidden_layers=1)
  predictor = gencast.GenCast(
      task_config=task,
      denoiser_architecture_config=arch_cfg,
      sampler_config=gencast.SamplerConfig(),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig())
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=1.0, batch=1, num_target_times=num_steps,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(
      rng, inputs, targets.isel(time=slice(0, 1)),
      forcings.isel(time=slice(0, 1)))
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  params, inputs, targets, forcings = jax.device_put(
      (params, inputs, targets, forcings))

  @jax.jit
  def _step(p, rng, inputs, targets_template, forcings):
    # params ride as a jit ARGUMENT: closing over them would inline the
    # graph_statics (kernel masks/index maps) as HLO constants — the remote
    # compile service rejects the oversized module with HTTP 413.
    return predictor(p, rng, inputs, targets_template, forcings)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return _step(params, rng, inputs, targets_template, forcings)

  def run(seed):
    preds = rollout.chunked_ensemble_prediction(
        predictor_fn, jax.random.PRNGKey(seed), inputs, targets, forcings,
        num_samples=members, num_steps_per_chunk=chunk, pull_to_host=False)
    # Forced scalar readback: the only thing that actually blocks through
    # the axon tunnel.
    return float(jnp.mean(preds.data("temperature")[:, -1].astype(
        jnp.float32)))

  t0 = time.perf_counter()
  v = run(0)
  compile_s = time.perf_counter() - t0
  assert np.isfinite(v), "non-finite rollout output"
  times = []
  for i in range(2):
    t0 = time.perf_counter()
    v = run(i + 1)
    assert np.isfinite(v)
    times.append(time.perf_counter() - t0)
  steady = min(times)
  member_steps = members * num_steps
  per_ms = steady / member_steps
  # Reference: 6 chip-seconds per member-step (3 min × 4 chips / 120).
  vs_baseline = 6.0 / per_ms
  print(f"gencast_rollout_1.0deg: {steady:.1f} s for {members}x{num_steps} "
        f"steps ({per_ms:.2f} s/member-step; compile+first {compile_s:.1f}s)")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  artifact = os.path.join(repo, "BENCH_GENCAST_ROLLOUT.json")
  with open(artifact, "w") as f:
    json.dump({
        "metric": f"gencast_1.0deg_mesh5_splash_{num_steps}step_"
                  f"{members}member_rollout",
        "value": round(steady, 1), "unit": "s",
        "s_per_member_step": round(per_ms, 3),
        "vs_baseline": round(vs_baseline, 3),
        "compile_s": round(compile_s, 1),
        "note": ("full chunked-ensemble rollout on ONE 16 GB v5e, "
                 "trajectory device-resident; reference = 3 min for "
                 "4 members x 30 steps on FOUR v5e chips post-compile "
                 "(6 chip-s/member-step, docs/cloud_vm_setup.md:30-31); "
                 f"reproduce with python tools/bench_gencast_rollout.py")},
        f)
  print(f"# wrote {artifact}")


if __name__ == "__main__":
  main()
