"""GenCast: diffusion-based probabilistic weather predictor.

EDM/Karras framework (reference: graphcast/gencast.py): a norm-conditioned
denoiser (models/denoiser.py) preconditioned with the c_in/c_out/c_skip
scalings, trained with σ-weighted MSE on spherical noise, sampled with
DPM-Solver++ 2S + stochastic churn. Ensemble members parallelize over a
device Mesh "sample" axis (graphcast_tpu/parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu import losses
from graphcast_tpu.diffusion import noise as noise_lib
from graphcast_tpu.diffusion.samplers import DPMSolverPlusPlus2S
from graphcast_tpu.fields import Field, FieldSet, _align_for_broadcast
from graphcast_tpu.models import configs
from graphcast_tpu.models.base import Predictor
from graphcast_tpu.models.denoiser import (
    Denoiser, DenoiserArchitectureConfig, NoiseEncoderConfig)

# GenCast variable vocabularies (reference: gencast.py:40-71).
TARGET_SURFACE_VARS = (
    "2m_temperature",
    "mean_sea_level_pressure",
    "10m_v_component_of_wind",
    "10m_u_component_of_wind",
    "total_precipitation_12hr",
    "sea_surface_temperature",
)
TARGET_SURFACE_NO_PRECIP_VARS = (
    "2m_temperature",
    "mean_sea_level_pressure",
    "10m_v_component_of_wind",
    "10m_u_component_of_wind",
    "sea_surface_temperature",
)

TASK = configs.TaskConfig(
    input_variables=(
        TARGET_SURFACE_NO_PRECIP_VARS + configs.TARGET_ATMOSPHERIC_VARS
        + configs.GENERATED_FORCING_VARS + configs.STATIC_VARS),
    target_variables=TARGET_SURFACE_VARS + configs.TARGET_ATMOSPHERIC_VARS,
    forcing_variables=configs.GENERATED_FORCING_VARS,
    pressure_levels=configs.PRESSURE_LEVELS_WEATHERBENCH_13,
    input_duration="24h",
)

GENCAST_LOSS_WEIGHTS = {
    "2m_temperature": 1.0,
    "10m_u_component_of_wind": 0.1,
    "10m_v_component_of_wind": 0.1,
    "mean_sea_level_pressure": 0.1,
    "sea_surface_temperature": 0.1,
    "total_precipitation_12hr": 0.1,
}


@dataclasses.dataclass(frozen=True, eq=True)
class SamplerConfig:
  """Reference: gencast.py:74-109."""
  max_noise_level: float = 80.0
  min_noise_level: float = 0.03
  num_noise_levels: int = 20
  rho: float = 7.0
  stochastic_churn_rate: float = 2.5
  churn_min_noise_level: float = 0.75
  churn_max_noise_level: float = float("inf")
  noise_level_inflation_factor: float = 1.05


@dataclasses.dataclass(frozen=True, eq=True)
class NoiseConfig:
  """Reference: gencast.py:111-115."""
  training_noise_level_rho: float = 7.0
  training_max_noise_level: float = 88.0
  training_min_noise_level: float = 0.02


@dataclasses.dataclass(frozen=True, eq=True)
class CheckPoint:
  """Checkpoint bundle schema (reference: gencast.py:118-127)."""
  description: str
  license: str
  params: dict[str, Any]
  task_config: configs.TaskConfig
  denoiser_architecture_config: DenoiserArchitectureConfig
  sampler_config: SamplerConfig
  noise_config: NoiseConfig
  noise_encoder_config: NoiseEncoderConfig


class GenCast(Predictor):
  """Conditional EDM diffusion predictor (reference: gencast.py:130-284)."""

  def __init__(self,
               task_config: configs.TaskConfig,
               denoiser_architecture_config: DenoiserArchitectureConfig,
               sampler_config: Optional[SamplerConfig] = None,
               noise_config: Optional[NoiseConfig] = None,
               noise_encoder_config: Optional[NoiseEncoderConfig] = None,
               cache_dir: Optional[str] = None,
               interpret_attention: Optional[bool] = None,
               decode_chunks: int = 1,
               encode_chunks: int = 1,
               fused_aggregation: Optional[bool] = None,
               sequence_parallel: Optional[tuple] = None):
    num_outputs = configs.num_output_channels(task_config)
    denoiser_architecture_config = dataclasses.replace(
        denoiser_architecture_config, node_output_size=num_outputs)
    self._denoiser = Denoiser(
        noise_encoder_config, denoiser_architecture_config,
        cache_dir=cache_dir, interpret_attention=interpret_attention,
        decode_chunks=decode_chunks, encode_chunks=encode_chunks,
        fused_aggregation=fused_aggregation,
        sequence_parallel=sequence_parallel)
    self._sampler_config = sampler_config
    self._noise_config = noise_config
    self._task_config = task_config

  # --- EDM preconditioning (reference: gencast.py:177-208) ---

  @staticmethod
  def _c_in(sigma):
    return (sigma ** 2 + 1) ** -0.5

  @staticmethod
  def _c_out(sigma):
    return sigma * (sigma ** 2 + 1) ** -0.5

  @staticmethod
  def _c_skip(sigma):
    return 1 / (sigma ** 2 + 1)

  def _loss_weighting(self, sigma):
    return self._c_out(sigma) ** -2

  def _scale_by(self, fs: FieldSet, scale_batch) -> FieldSet:
    """Multiplies every var by a per-batch scalar (broadcast over dims)."""
    scale = Field(scale_batch, ("batch",))
    def fn(name, f):
      s = _align_for_broadcast(scale.astype(f.data.dtype), f)
      return Field(f.data * s, f.dims)
    return fs.map(fn)

  def _preconditioned_denoiser(self, params, inputs, noisy_targets,
                               noise_levels, forcings):
    """D(x;σ) = c_skip·x + c_out·F(c_in·x; σ) (EDM eq. 7)."""
    raw = self._denoiser.apply(
        params, inputs,
        self._scale_by(noisy_targets, self._c_in(noise_levels)),
        noise_levels, forcings)
    return (self._scale_by(raw, self._c_out(noise_levels))
            + self._scale_by(noisy_targets, self._c_skip(noise_levels)))

  # --- Predictor API ---

  def init(self, rng, inputs, targets_template, forcings, **kwargs):
    batch = targets_template.sizes["batch"]
    noise_levels = jnp.ones((batch,), jnp.float32)
    noisy_targets = targets_template.map_data(
        lambda x: jnp.nan_to_num(x, nan=0.0))
    params = self._denoiser.init(rng, inputs, noisy_targets, noise_levels,
                                 forcings)
    # Spherical-harmonic synthesis tensors as non-trainable statics: they
    # must ride as jit arguments (1.5 GB Legendre at 0.25°), not constants.
    coords = targets_template.coords
    params["noise_statics"] = noise_lib.white_noise_basis_arrays(
        coords["lat"], coords["lon"])
    return params

  @staticmethod
  def _noise_basis(params):
    return params.get("noise_statics") if isinstance(params, dict) else None

  def __call__(self, params, rng, inputs, targets_template, forcings,
               **kwargs):
    if self._sampler_config is None:
      raise ValueError("sampler config required for inference")
    if targets_template.sizes.get("time", 1) != 1:
      # The denoiser appends every noisy-target frame as extra feature
      # channels, so a multi-step template silently changes the grid2mesh
      # input width and fails deep inside the GNN. GenCast is a ONE-step
      # (12h) predictor; roll it out chunk-by-chunk with
      # rollout.chunked_prediction(num_steps_per_chunk=1) (reference
      # semantics: gencast notebooks call the sampler once per step).
      raise ValueError(
          "GenCast predicts exactly one target step per call; got a "
          f"targets_template with {targets_template.sizes['time']} time "
          "steps. Use rollout.chunked_prediction(num_steps_per_chunk=1).")

    def denoiser_fn(inputs, noisy_targets, noise_levels, forcings):
      return self._preconditioned_denoiser(
          params, inputs, noisy_targets, noise_levels, forcings)

    sampler = DPMSolverPlusPlus2S(
        denoiser_fn, **dataclasses.asdict(self._sampler_config))
    return sampler(rng, inputs, targets_template, forcings,
                   noise_basis=self._noise_basis(params))

  def loss_and_predictions(self, params, rng, inputs, targets, forcings,
                           **kwargs):
    loss = self.loss(params, rng, inputs, targets, forcings, **kwargs)
    preds = self(params, rng, inputs, targets, forcings, **kwargs)
    return loss, preds

  def loss(self, params, rng, inputs, targets, forcings, **kwargs):
    """Denoising score-matching loss (reference: gencast.py:218-269)."""
    if self._noise_config is None:
      raise ValueError("noise config required for training")
    nc = self._noise_config
    dtype = targets.dtype() or jnp.float32
    batch = targets.sizes["batch"]
    level_key, noise_key = jax.random.split(rng)
    noise_levels = noise_lib.rho_inverse_cdf(
        min_value=nc.training_min_noise_level,
        max_value=nc.training_max_noise_level,
        rho=nc.training_noise_level_rho,
        cdf=jax.random.uniform(level_key, (batch,), dtype))

    noise = noise_lib.spherical_white_noise_like(
        noise_key, targets, basis_arrays=self._noise_basis(params))
    noisy_targets = targets + self._scale_by(noise, noise_levels)

    denoised = self._preconditioned_denoiser(
        params, inputs, noisy_targets, noise_levels, forcings)

    weights = {k: v for k, v in GENCAST_LOSS_WEIGHTS.items()
               if k in targets.var_names}
    loss, diagnostics = losses.weighted_mse_per_level(
        denoised, targets, per_variable_weights=weights)
    loss = loss * self._loss_weighting(noise_levels).astype(loss.dtype)
    return loss, diagnostics
