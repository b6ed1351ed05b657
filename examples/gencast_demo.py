"""GenCast ensemble demo (script equivalent of gencast_mini_demo.ipynb).

1. build NaNCleaner(InputsAndResiduals(GenCast)) — the reference's inference
   wrapper stack;
2. initialize random weights;
3. draw an N-member ensemble, optionally sharded over all local devices;
4. compute the diffusion training loss + grads.

Usage:
  python examples/gencast_demo.py [--members 4] [--mesh-size 3]
      [--attention mha|triblockdiag_mha|splash_mha]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from graphcast_tpu import rollout, train
from graphcast_tpu.data import synthetic
from graphcast_tpu.models import gencast
from graphcast_tpu.models.denoiser import (
    DenoiserArchitectureConfig, NoiseEncoderConfig)
from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
from graphcast_tpu.parallel import sharding as sharding_lib
from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--resolution", type=float, default=4.0)
  parser.add_argument("--mesh-size", type=int, default=3)
  parser.add_argument("--latent-size", type=int, default=128)
  parser.add_argument("--members", type=int, default=4)
  parser.add_argument("--attention", type=str, default="triblockdiag_mha")
  parser.add_argument("--noise-levels", type=int, default=8)
  parser.add_argument("--fused", action="store_true",
                      help="force the fused Pallas denoiser kernels "
                           "(default: auto — on for TPU backends only)")
  args = parser.parse_args()

  task = gencast.TASK
  d_model = args.latent_size
  st_cfg = SparseTransformerConfig(
      attention_k_hop=4, d_model=d_model, num_layers=4,
      num_heads=max(1, d_model // 128) if args.attention == "splash_mha"
      else 4,
      attention_type=args.attention, ffw_hidden=2 * d_model,
      block_q=256, block_kv=256)
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=args.mesh_size,
      latent_size=args.latent_size)
  model = gencast.GenCast(
      task_config=task,
      denoiser_architecture_config=arch_cfg,
      sampler_config=gencast.SamplerConfig(
          num_noise_levels=args.noise_levels),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig(),
      fused_aggregation=True if args.fused else None)

  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = NaNCleaner(
      InputsAndResiduals(model, stddev_by_level=stddev, mean_by_level=mean,
                         diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=args.resolution, batch=1, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  if args.fused:
    arch = model._denoiser._architecture
    print(f"fused kernels: grid2mesh={arch._g2m_fused is not None} "
          f"mesh2grid={arch._m2g_decoder is not None}")

  @jax.jit
  def predictor_fn(rng, inputs, targets_template, forcings):
    return predictor(params, rng, inputs, targets_template, forcings)

  n_dev = len(jax.devices())
  mesh = (sharding_lib.make_mesh({"sample": n_dev})
          if args.members % n_dev == 0 and n_dev > 1 else None)
  t0 = time.time()
  ensemble = rollout.chunked_ensemble_prediction(
      predictor_fn, rng, inputs, targets, forcings,
      num_samples=args.members, mesh=mesh, mesh_axis="sample")
  t2m = np.asarray(ensemble.data("2m_temperature"))
  print(f"{args.members}-member ensemble (incl. compile): "
        f"{time.time()-t0:.1f}s on {n_dev} device(s)")
  print("ensemble spread (2m_temperature stddev across members): "
        f"{t2m.std(axis=0).mean():.3f}")

  loss_fn = train.make_loss_fn(predictor)
  trainable, statics = train.partition_params(params)
  (loss, _), grads = jax.jit(jax.value_and_grad(
      lambda p, r: loss_fn(train.merge_params(p, statics), r, inputs,
                           targets, forcings), has_aux=True))(trainable, rng)
  print(f"diffusion training loss: {float(loss):.4f}; grads finite: "
        f"{all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))}")


if __name__ == "__main__":
  main()
