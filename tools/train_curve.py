"""Training loss-descent curve: does the optimizer actually learn?

The bench tools time single train steps; this tool runs the real training
loop (train.make_train_step: loss + grads + AdamW on f32 masters) for N
steps on a fixed synthetic batch and records the loss series. On a fixed
batch the model must memorize, so a healthy pipeline shows a monotonic-ish
descent; a broken gradient path (e.g. a custom-VJP bug in the fused
kernels) shows a flat or diverging curve. Writes TRAINCURVE_<model>.json.

Usage:
  python tools/train_curve.py [num_steps]          # GraphCast 1.0deg/13lev
  CURVE_MODEL=gencast python tools/train_curve.py  # GenCast 1.0deg diffusion
  CURVE_STREAM=1 python tools/train_curve.py       # multi-batch + held-out

GenCast's loss is stochastic (fresh noise levels + spherical noise each
step), so its curve is noisy; we report first/last windowed means.

CURVE_STREAM=1 answers the stronger question — learning, not memorization:
every step trains on a FRESH synthetic batch (new seed) and a fixed
HELD-OUT batch (never trained on) is evaluated every CURVE_EVAL_EVERY
(default 5) steps with the pure loss fn. A descending held-out curve shows
the model is learning the generator's structure (synthetic fields share
spatial statistics across seeds), not memorizing one batch. The reference
delegates this loop to JAXline (reference README.md:161); this is our
equivalent evidence.
Rig rules: everything rides as jit args; readback forces each step.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _env_int(name, default):
  return int(os.environ.get(name, str(default)))


def _build_graphcast():
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (
      Autoregressive, Bfloat16Cast, InputsAndResiduals)

  task = configs.TASK_13
  resolution = float(os.environ.get("CURVE_RESOLUTION", "1.0"))
  model = configs.ModelConfig(
      resolution=resolution, mesh_size=_env_int("CURVE_MESH_SIZE", 5),
      latent_size=_env_int("CURVE_LATENT", 512),
      gnn_msg_steps=_env_int("CURVE_MSG_STEPS", 16),
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(model, task, fused_aggregation="processor",
                                 remat_processor=True)),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=True)
  def make_batch(seed):
    return synthetic.make_example_batch(
        task, resolution=resolution, batch=1, num_target_times=1, seed=seed)

  tag = f"graphcast_{str(resolution).replace('.', 'p')}"
  return predictor, make_batch, tag


def _build_gencast():
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast, zoo
  from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

  task = gencast.TASK
  # The released GenCast architecture (zoo), with env-size overrides.
  predictor = zoo.gencast_custom(
      resolution=float(os.environ.get("CURVE_RESOLUTION", "1.0")),
      mesh_size=_env_int("CURVE_MESH_SIZE", 5),
      d_model=_env_int("CURVE_LATENT", 512),
      num_layers=_env_int("CURVE_LAYERS", 16),
      latent_size=_env_int("CURVE_LATENT", 512),
  ).build(fused_aggregation=False)
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)
  res = os.environ.get("CURVE_RESOLUTION", "1.0")

  def make_batch(seed):
    return synthetic.make_example_batch(
        task, resolution=float(res), batch=1, num_target_times=1,
        time_step_hours=12, seed=seed)

  return predictor, make_batch, f"gencast_{res.replace('.', 'p')}"


def main():
  num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

  from graphcast_tpu import train

  which = os.environ.get("CURVE_MODEL", "graphcast")
  builders = {"graphcast": _build_graphcast, "gencast": _build_gencast}
  if which not in builders:
    raise SystemExit(f"CURVE_MODEL={which!r}: expected one of "
                     f"{sorted(builders)}")
  predictor, make_batch, tag = builders[which]()
  stream = os.environ.get("CURVE_STREAM", "0") == "1"
  eval_every = _env_int("CURVE_EVAL_EVERY", 5)

  def to_device(batch):
    return jax.device_put(tuple(b.astype(jnp.bfloat16) for b in batch))

  rng = jax.random.PRNGKey(0)
  optimizer = train.graphcast_optimizer(
      peak_lr=float(os.environ.get("CURVE_LR", "3e-4")))
  inputs, targets, forcings = make_batch(0)
  state = train.init_train_state(predictor, optimizer, rng, inputs, targets,
                                 forcings)
  step_fn = train.make_train_step(predictor, optimizer)
  state = jax.device_put(state)
  inputs, targets, forcings = to_device((inputs, targets, forcings))
  if stream:
    loss_fn = jax.jit(train.make_loss_fn(predictor))
    held = to_device(make_batch(999))  # never trained on
    held_rng = jax.random.PRNGKey(7)

  t0 = time.perf_counter()
  losses = []
  heldout = []  # (step, loss)
  for i in range(num_steps):
    if stream and i > 0:
      # Fresh batch per step: same synthetic generator, new seed.
      inputs, targets, forcings = to_device(make_batch(i + 10))
    state, loss, _ = step_fn(state, jax.random.fold_in(rng, i), inputs,
                             targets, forcings)
    losses.append(float(loss))  # forced readback, keeps host in lockstep
    if i == 0:
      compile_s = time.perf_counter() - t0
    if stream and (i % eval_every == 0 or i == num_steps - 1):
      hl, _ = loss_fn(state.params, held_rng, *held)
      heldout.append((i, float(hl)))
      print(f"step {i:4d}: train {losses[-1]:.5f} held-out {float(hl):.5f}")
    elif i % 10 == 0 or i == num_steps - 1:
      print(f"step {i:4d}: loss {losses[-1]:.5f}")
  assert all(np.isfinite(l) for l in losses), "non-finite loss in curve"

  w = max(1, num_steps // 10)
  first, last = float(np.mean(losses[:w])), float(np.mean(losses[-w:]))
  print(f"{tag}: loss {first:.5f} -> {last:.5f} over {num_steps} steps "
        f"({(1 - last / first) * 100:.1f}% drop, compile {compile_s:.1f}s)")

  record = {
      "metric": f"train_loss_descent_{tag}_{num_steps}steps"
                + ("_stream" if stream else ""),
      "first_window_mean": round(first, 5),
      "last_window_mean": round(last, 5),
      "drop_pct": round((1 - last / first) * 100, 2),
      "losses": [round(l, 5) for l in losses],
      "lr": float(os.environ.get("CURVE_LR", "3e-4")),
      "note": (("fresh synthetic batch every step + fixed held-out batch "
                "(seed 999, never trained on) evaluated with the pure "
                "loss fn — a descending held-out curve is learning, not "
                "memorization; " if stream else
                "fixed synthetic batch, ")
               + "real train step (AdamW, f32 masters, bf16 activations, "
               "fused kernels); reproduce with "
               + ("CURVE_STREAM=1 " if stream else "")
               + f"CURVE_MODEL={which} python tools/train_curve.py "
               f"{num_steps}")}
  if stream:
    hvals = [h for _, h in heldout]
    record["heldout"] = [[s, round(h, 5)] for s, h in heldout]
    record["heldout_first"] = round(hvals[0], 5)
    record["heldout_last"] = round(hvals[-1], 5)
    record["heldout_drop_pct"] = round((1 - hvals[-1] / hvals[0]) * 100, 2)
    print(f"{tag}: held-out {hvals[0]:.5f} -> {hvals[-1]:.5f} "
          f"({record['heldout_drop_pct']:.1f}% drop)")
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  artifact = os.path.join(
      repo, f"TRAINCURVE_{tag}{'_stream' if stream else ''}.json")
  with open(artifact, "w") as f:
    json.dump(record, f)
    f.write("\n")
  print(f"# wrote {artifact}")


if __name__ == "__main__":
  main()
