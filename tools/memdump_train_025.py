"""AOT-compile the 0.25° AR train step and dump XLA's memory analysis.

Usage: python tools/memdump_train_025.py [ar_steps] [resolution] [mesh_size]

Compile-only (no execution): on TPU the remote service does static buffer
assignment, so either `compiled.memory_analysis()` or the OOM error text
gives the per-buffer breakdown we need to find what the nested
scan/checkpoint/lax.map remat combination is actually saving.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TRAIN_FUSED_VALUES = {"0": False, "1": True, "processor": "processor",
                       "encoder": "encoder"}


def _train_fused():
  raw = os.environ.get("TRAIN_FUSED", "0")
  if raw not in _TRAIN_FUSED_VALUES:
    raise SystemExit(
        f"TRAIN_FUSED must be one of {sorted(_TRAIN_FUSED_VALUES)}, "
        f"got {raw!r}")
  return _TRAIN_FUSED_VALUES[raw]


def main():
  ar_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
  resolution = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
  mesh_size = int(sys.argv[3]) if len(sys.argv) > 3 else 6
  import jax
  cache = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu",
                       "xla_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
  import jax.numpy as jnp

  from graphcast_tpu import train
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu.wrappers import (
      Autoregressive, Bfloat16Cast, InputsAndResiduals)

  task = configs.TASK
  model = configs.ModelConfig(
      resolution=resolution, mesh_size=mesh_size, latent_size=512,
      gnn_msg_steps=16, hidden_layers=1,
      radius_query_fraction_edge_length=0.6)
  stddev, mean, diffs = synthetic.make_norm_stats(task)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(model, task,
                                 decode_chunks=int(os.environ.get(
                                     "TRAIN_DECODE_CHUNKS", "64")),
                                 encode_chunks=int(os.environ.get(
                                     "TRAIN_ENCODE_CHUNKS", "50")),
                                 fused_aggregation=_train_fused(),
                                 remat_processor=True)),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs),
      gradient_checkpointing=True,
      loss_scan_unroll=int(os.environ.get("AR_UNROLL", "4")),
      loss_scan_block=int(os.environ.get("AR_BLOCK", "1")),
      loss_carry_offload=bool(int(os.environ.get("AR_OFFLOAD", "0"))),
      # AR_OFFLOAD_MP=1 stages the mesh-processor block boundaries in
      # pinned host memory during each step's backward.
      loss_offload_processor_carries=bool(
          int(os.environ.get("AR_OFFLOAD_MP", "0"))))

  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=resolution, batch=1, num_target_times=ar_steps)
  rng = jax.random.PRNGKey(0)
  optimizer = train.graphcast_optimizer(peak_lr=1e-3)
  state = train.init_train_state(predictor, optimizer, rng, inputs, targets,
                                 forcings)
  step_fn = train.make_train_step(predictor, optimizer)
  inputs = inputs.astype(jnp.bfloat16)
  targets = targets.astype(jnp.bfloat16)
  forcings = forcings.astype(jnp.bfloat16)

  lowered = step_fn.lower(state, rng, inputs, targets, forcings)
  print("lowered; compiling...", flush=True)
  opts = None
  if os.environ.get("COMPILER_OPTS"):
    opts = dict(kv.split("=", 1)
                for kv in os.environ["COMPILER_OPTS"].split(","))
    print("compiler options:", opts, flush=True)
  try:
    compiled = lowered.compile(compiler_options=opts)
  except Exception as e:  # noqa: BLE001 — we want the OOM breakdown text
    print("COMPILE FAILED:")
    print(str(e)[:20000])
    return
  ma = compiled.memory_analysis()
  print("memory analysis:", ma)
  try:
    print(f"  argument size:  {ma.argument_size_in_bytes/2**30:.2f} GiB")
    print(f"  output size:    {ma.output_size_in_bytes/2**30:.2f} GiB")
    print(f"  temp size:      {ma.temp_size_in_bytes/2**30:.2f} GiB")
    print(f"  generated code: {ma.generated_code_size_in_bytes/2**20:.2f} MiB")
  except AttributeError:
    pass


if __name__ == "__main__":
  main()
