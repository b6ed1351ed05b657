"""GraphCast end-to-end demo (script equivalent of graphcast_demo.ipynb).

Covers the notebook's cells as first-class API calls:
1. build the wrapper-stack predictor
   Autoregressive(InputsAndResiduals(Bfloat16Cast(GraphCast)))
2. initialize random weights (or load a reference checkpoint bundle)
3. run a jitted autoregressive forecast
4. compute loss and gradients
5. run a long chunked rollout

Usage:
  python examples/graphcast_demo.py [--resolution 4.0] [--mesh-size 3]
      [--steps 8] [--checkpoint path/to/params.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu import rollout, train
from graphcast_tpu.compat import haiku_checkpoint
from graphcast_tpu.data import synthetic
from graphcast_tpu.models import configs
from graphcast_tpu.models.graphcast import GraphCast
from graphcast_tpu.wrappers import (
    Autoregressive, Bfloat16Cast, InputsAndResiduals)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--resolution", type=float, default=4.0)
  parser.add_argument("--mesh-size", type=int, default=3)
  parser.add_argument("--latent-size", type=int, default=128)
  parser.add_argument("--gnn-msg-steps", type=int, default=4)
  parser.add_argument("--steps", type=int, default=8,
                      help="number of 6h forecast steps")
  parser.add_argument("--checkpoint", type=str, default=None,
                      help="reference-format .npz checkpoint bundle")
  args = parser.parse_args()

  if args.checkpoint:
    params, model_config, task_config, desc, _ = (
        haiku_checkpoint.load_graphcast_checkpoint(args.checkpoint))
    print(f"loaded checkpoint: {desc}")
  else:
    task_config = configs.TASK_13
    model_config = configs.ModelConfig(
        resolution=args.resolution, mesh_size=args.mesh_size,
        latent_size=args.latent_size, gnn_msg_steps=args.gnn_msg_steps,
        hidden_layers=1)
    params = None

  # Fake data + stats (swap in real ERA5 via graphcast_tpu.xarray_bridge and
  # graphcast_tpu.data.era5.extract_inputs_targets_forcings).
  inputs, targets, forcings = synthetic.make_example_batch(
      task_config, resolution=model_config.resolution, batch=1,
      num_target_times=args.steps)
  stddev, mean, diffs = synthetic.make_norm_stats(task_config)

  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(model_config, task_config)),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=True)

  rng = jax.random.PRNGKey(0)
  if params is None:
    params = predictor.init(rng, inputs, targets, forcings)
  n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
  print(f"params: {n_params:,}")

  # --- jitted forecast ---
  @jax.jit
  def forward(params, rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  t0 = time.time()
  predictions = forward(params, rng, inputs, targets, forcings)
  jax.block_until_ready(jax.device_get(predictions.data("2m_temperature")))
  print(f"{args.steps}-step forecast (incl. compile): {time.time()-t0:.1f}s")
  print("prediction vars:", predictions.var_names)

  # --- loss + gradients ---
  loss_fn = train.make_loss_fn(predictor)
  trainable, statics = train.partition_params(params)
  (loss, diagnostics), grads = jax.jit(jax.value_and_grad(
      lambda p, r: loss_fn(train.merge_params(p, statics), r, inputs,
                           targets, forcings), has_aux=True))(trainable, rng)
  print(f"loss: {float(loss):.4f}")
  print("per-variable diagnostics:",
        {k: round(float(v), 4) for k, v in diagnostics.items()})

  # --- chunked long rollout ---
  long_targets = rollout.extend_targets_template(targets, args.steps * 2)
  long_forcings = rollout.extend_targets_template(forcings, args.steps * 2)

  def predictor_fn(rng, inputs, targets_template, forcings):
    return forward(params, rng, inputs, targets_template, forcings)

  chunked = rollout.chunked_prediction(
      predictor_fn, rng, inputs, long_targets, long_forcings,
      num_steps_per_chunk=args.steps)
  print("chunked rollout steps:", chunked.sizes["time"])


if __name__ == "__main__":
  main()
