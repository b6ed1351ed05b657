"""Golden full-stack regression forecasts.

Pins a tiny-config ``Autoregressive(InputsAndResiduals(Bfloat16Cast(
GraphCast)))`` 4-step forecast and a 3-noise-level GenCast sample (fixed
seeds) as committed ``.npz`` artifacts, so kernel/layout work in later
rounds can't silently drift end-to-end numerics the way only wiring bugs
do (module-level parity tests don't catch assembly mistakes; reference
equivalent: the notebook smoke forecasts, SURVEY §3.2/§3.5).

These run on CPU (conftest) with fixed jax/XLA versions, so results are
deterministic; tolerances only absorb last-bit libm variation. After an
*intended* numerics change, regenerate deliberately:

    GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py -q

and commit the updated ``tests/goldens/*.npz`` with the change that
explains the drift.
"""

import os

import jax
import numpy as np
import pytest

from graphcast_tpu import rollout
from graphcast_tpu.data import synthetic
from graphcast_tpu.models import configs, gencast
from graphcast_tpu.models.graphcast import GraphCast
from graphcast_tpu.wrappers import (Autoregressive, Bfloat16Cast,
                                    InputsAndResiduals)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

GC_TASK = configs.TaskConfig(
    input_variables=(
        "2m_temperature", "temperature", "toa_incident_solar_radiation",
        "land_sea_mask"),
    target_variables=("2m_temperature", "temperature"),
    forcing_variables=("toa_incident_solar_radiation",),
    pressure_levels=(500, 850),
    input_duration="12h",
)

GC_MODEL = configs.ModelConfig(
    resolution=30.0, mesh_size=2, latent_size=16, gnn_msg_steps=2,
    hidden_layers=1, radius_query_fraction_edge_length=0.6)

GENCAST_TASK = configs.TaskConfig(
    input_variables=(
        "2m_temperature", "temperature", "sea_surface_temperature",
        "day_progress_sin", "land_sea_mask"),
    target_variables=("2m_temperature", "temperature",
                      "sea_surface_temperature"),
    forcing_variables=("day_progress_sin",),
    pressure_levels=(500, 850),
    input_duration="24h",
)


def _graphcast_forecast() -> dict:
  """4-step AR forecast through the full inference wrapper stack."""
  inputs, targets, forcings = synthetic.make_example_batch(
      GC_TASK, resolution=30.0, batch=1, num_target_times=4)
  stddev, mean, diffs = synthetic.make_norm_stats(GC_TASK)
  predictor = Autoregressive(
      InputsAndResiduals(
          Bfloat16Cast(GraphCast(GC_MODEL, GC_TASK, cache_dir="")),
          stddev_by_level=stddev, mean_by_level=mean,
          diffs_stddev_by_level=diffs))
  params = predictor.init(jax.random.PRNGKey(42), inputs, targets, forcings)
  preds = predictor(params, jax.random.PRNGKey(17), inputs, targets, forcings)
  out = {n: np.asarray(preds.data(n), np.float32) for n in preds.var_names}
  # Also pin the chunked host-loop driver against the same stack: wiring
  # drift between the scan and chunked paths shows up here.
  chunked = rollout.chunked_prediction(
      jax.jit(lambda rng, inputs, targets_template, forcings: predictor(
          params, rng, inputs, targets_template, forcings)),
      jax.random.PRNGKey(17), inputs, targets, forcings,
      num_steps_per_chunk=2)
  for n in chunked.var_names:
    out["chunked/" + n] = np.asarray(chunked.data(n), np.float32)
  return out


def _gencast_sample() -> dict:
  """One GenCast ensemble sample, 3 noise levels, triblockdiag attention."""
  from graphcast_tpu.models.denoiser import (DenoiserArchitectureConfig,
                                             NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
  st_cfg = SparseTransformerConfig(
      attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
      attention_type="triblockdiag_mha", ffw_hidden=32,
      block_q=64, block_kv=64)
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=1, latent_size=16,
      hidden_layers=1)
  predictor = gencast.GenCast(
      task_config=GENCAST_TASK,
      denoiser_architecture_config=arch_cfg,
      sampler_config=gencast.SamplerConfig(num_noise_levels=3),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig(
          num_frequencies=8, output_sizes=(16, 8)),
      cache_dir="")
  inputs, targets, forcings = synthetic.make_example_batch(
      GENCAST_TASK, resolution=30.0, batch=1, num_target_times=1,
      time_step_hours=12)
  params = predictor.init(jax.random.PRNGKey(7), inputs, targets, forcings)
  sample = jax.jit(
      lambda rng: predictor(params, rng, inputs, targets, forcings)
  )(jax.random.PRNGKey(3))
  return {n: np.asarray(sample.data(n), np.float32)
          for n in sample.var_names}


def _check_against_golden(fname: str, arrays: dict):
  path = os.path.join(GOLDEN_DIR, fname)
  if os.environ.get("GOLDEN_REGEN"):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(path, **arrays)
    pytest.skip(f"regenerated golden {path}")
  if not os.path.exists(path):
    raise FileNotFoundError(
        f"missing golden {path}; generate with GOLDEN_REGEN=1")
  golden = np.load(path)
  assert set(golden.files) == set(arrays), (
      f"variable set drift: {sorted(arrays)} vs golden {sorted(golden.files)}")
  for name in sorted(arrays):
    got = arrays[name]
    want = golden[name]
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    assert np.isfinite(got).all(), f"{name}: non-finite values"
    np.testing.assert_allclose(
        got, want, rtol=1e-5, atol=1e-5,
        err_msg=(f"{name} drifted from the committed golden; if the change "
                 "is intended, regenerate with GOLDEN_REGEN=1 and commit."))


def test_graphcast_full_stack_golden():
  _check_against_golden("graphcast_tiny_forecast.npz", _graphcast_forecast())


def test_gencast_full_stack_golden():
  _check_against_golden("gencast_tiny_sample.npz", _gencast_sample())
