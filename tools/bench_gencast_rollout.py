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
ROLLOUT_CHUNK (1; GenCast predicts one 12h step per call),
ROLLOUT_RESOLUTION (1.0; at 0.25 use mesh-6 and fewer steps/members —
the device-resident trajectory costs ~177 MB per member-step there),
ROLLOUT_MESH_SIZE (5), ROLLOUT_PULL_TO_HOST (0; set 1 at 0.25° where a
30-step device-resident trajectory overflows the 16 GB chip — the chunked
generator then streams each predicted step to host, which through THIS
rig's axon tunnel costs ~10 MB/s and dominates the wall clock; production
PCIe is ~1000× faster, so the artifact notes both), ROLLOUT_TIMING_RUNS
(2; use 1 for the long 0.25° configuration).
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
  resolution = float(os.environ.get("ROLLOUT_RESOLUTION", "1.0"))
  mesh_size = int(os.environ.get("ROLLOUT_MESH_SIZE", "5"))
  pull_to_host = os.environ.get("ROLLOUT_PULL_TO_HOST", "0") == "1"
  timing_runs = int(os.environ.get("ROLLOUT_TIMING_RUNS", "2"))
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu import rollout
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast, zoo
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  task = gencast.TASK
  # The released GenCast architecture, from the single source of truth.
  predictor = zoo.gencast_custom(resolution, mesh_size).build()
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=num_steps,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(
      rng, inputs, targets.isel(time=slice(0, 1)),
      forcings.isel(time=slice(0, 1)))
  inputs = inputs.astype(jnp.bfloat16)
  # targets stays HOST-side (numpy bf16): it is only a shape/coord template,
  # and at 0.25deg x 30 steps a device copy is ~14 GB — the deferred
  # device_put OOM'd the whole rollout at the first readback. The generator
  # device_puts the one-chunk template it actually feeds the jit.
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)
  params, inputs, forcings = jax.device_put((params, inputs, forcings))

  @jax.jit
  def _step(p, rng, inputs, targets_template, forcings):
    # params ride as a jit ARGUMENT: closing over them would inline the
    # graph_statics (kernel masks/index maps) as HLO constants — the remote
    # compile service rejects the oversized module with HTTP 413.
    return predictor(p, rng, inputs, targets_template, forcings)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return _step(params, rng, inputs, targets_template, forcings)

  def run(seed):
    if pull_to_host and members == 1:
      # Stream chunk-by-chunk in the tool: device-side bf16 cast before
      # each pull (halves the ~10 MB/s tunnel transfer) and per-chunk
      # progress prints — the generator's own pull path moves every leaf
      # at full width with no visibility into which chunk a failure hits.
      gen = rollout.chunked_prediction_generator(
          predictor_fn, jax.random.PRNGKey(seed), inputs, targets,
          forcings, num_steps_per_chunk=chunk, pull_to_host=False)
      last_t = None
      for k, ch in enumerate(gen):
        tc = time.perf_counter()
        for name in ch.var_names:
          pulled = np.asarray(ch.data(name).astype(jnp.bfloat16))
          if name == "temperature":
            last_t = pulled
        print(f"  chunk {k}: step+pull {time.perf_counter() - tc:.1f}s",
              flush=True)
      return float(np.mean(last_t.astype(np.float32)))
    preds = rollout.chunked_ensemble_prediction(
        predictor_fn, jax.random.PRNGKey(seed), inputs, targets, forcings,
        num_samples=members, num_steps_per_chunk=chunk,
        pull_to_host=pull_to_host)
    # Forced scalar readback: the only thing that actually blocks through
    # the axon tunnel (with pull_to_host the generator drain already
    # streamed every step to host, so this is free).
    return float(jnp.mean(jnp.asarray(
        preds.data("temperature"))[:, -1].astype(jnp.float32)))

  t0 = time.perf_counter()
  v = run(0)
  compile_s = time.perf_counter() - t0
  assert np.isfinite(v), "non-finite rollout output"
  times = []
  for i in range(timing_runs):
    t0 = time.perf_counter()
    v = run(i + 1)
    assert np.isfinite(v)
    times.append(time.perf_counter() - t0)
  steady = min(times)
  member_steps = members * num_steps
  per_ms = steady / member_steps
  # Reference chip-seconds per member-step: 1.0° = 6 (3 min × 4 v5e chips /
  # 120 member-steps); 0.25° = 128 (8 min × 8 v5p chips / 30 member-steps,
  # docs/cloud_vm_setup.md:36).
  baseline_cs = 128.0 if resolution == 0.25 else 6.0
  vs_baseline = baseline_cs / per_ms
  print(f"gencast_rollout_{resolution}deg: {steady:.1f} s for {members}x{num_steps} "
        f"steps ({per_ms:.2f} s/member-step; compile+first {compile_s:.1f}s)")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  suffix = "_025" if resolution == 0.25 else ""
  artifact = os.path.join(repo, f"BENCH_GENCAST_ROLLOUT{suffix}.json")
  with open(artifact, "w") as f:
    json.dump({
        "metric": f"gencast_{resolution}deg_mesh{mesh_size}_splash_"
                  f"{num_steps}step_{members}member_rollout",
        "value": round(steady, 1), "unit": "s",
        "s_per_member_step": round(per_ms, 3),
        "vs_baseline": round(vs_baseline, 3),
        "compile_s": round(compile_s, 1),
        "pull_to_host": pull_to_host,
        "note": ("full chunked-ensemble rollout on ONE 16 GB v5e, "
                 + ("trajectory streamed to host per step (this rig's "
                    "axon tunnel moves device->host at ~10 MB/s, so the "
                    "wall clock is stream-dominated; see the single-step "
                    "BENCH_GENCAST artifacts for pure device time); "
                    if pull_to_host else "trajectory device-resident; ")
                 + "reference = 3 min for "
                 "4 members x 30 steps on FOUR v5e chips at 1.0deg "
                 "(6 chip-s/member-step) / 8 min per 30-step member on "
                 "EIGHT 32 GB v5p at 0.25deg (128 chip-s/member-step), "
                 "docs/cloud_vm_setup.md:30-36; reproduce with "
                 f"ROLLOUT_RESOLUTION={resolution} ROLLOUT_MESH_SIZE="
                 f"{mesh_size} ROLLOUT_MEMBERS={members} ROLLOUT_STEPS="
                 f"{num_steps} python tools/bench_gencast_rollout.py")},
        f)
  print(f"# wrote {artifact}")


if __name__ == "__main__":
  main()
