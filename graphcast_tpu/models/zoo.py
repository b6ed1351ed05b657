"""Released-model presets: the configs of the reference's pretrained
checkpoints, as constructors.

The reference ships its model configs inside checkpoint files (the
``CheckPoint.model_config`` / ``task_config`` fields, graphcast.py:204-210)
and documents the released variants in README.md:118-133 (GraphCast) and
README.md:48-79 (GenCast). These presets reproduce those configurations so
a user can build the matching architecture without a checkpoint in hand —
e.g. to train from scratch, or to load converted weights via
``compat.haiku_checkpoint`` into a known-shape skeleton.

Checkpoint-name ↔ preset mapping (bucket filenames):

- "GraphCast - ERA5 1979-2017 - resolution 0.25 - pressure levels 37 -
  mesh 2to6 - precipitation input and output" → :func:`graphcast`
- "GraphCast_small - ERA5 1979-2015 - resolution 1.0 - pressure levels 13 -
  mesh 2to5 - precipitation input and output" → :func:`graphcast_small`
- "GraphCast_operational - ERA5-HRES 1979-2021 - resolution 0.25 -
  pressure levels 13 - mesh 2to6 - precipitation output only"
  → :func:`graphcast_operational`
- "GenCast 0p25deg <2019" / "GenCast 0p25deg Operational <2022" (mesh-6)
  → :func:`gencast_0p25deg`
- "GenCast 1p0deg <2019" (mesh-5) → :func:`gencast_1p0deg`
- "GenCast 1p0deg Mini <2019" (mesh-4) → :func:`gencast_mini`
"""

from __future__ import annotations

import dataclasses

from graphcast_tpu.models import configs


@dataclasses.dataclass(frozen=True)
class GraphCastPreset:
  name: str
  model_config: configs.ModelConfig
  task_config: configs.TaskConfig


def graphcast() -> GraphCastPreset:
  """The GraphCast-paper model: 0.25°, 37 levels, mesh 2-6
  (README.md:122-124)."""
  return GraphCastPreset(
      name="GraphCast",
      model_config=configs.ModelConfig(resolution=0.25, mesh_size=6),
      task_config=configs.TASK)


def graphcast_small() -> GraphCastPreset:
  """Low-resource variant: 1.0°, 13 levels, mesh 2-5 (README.md:126-129)."""
  return GraphCastPreset(
      name="GraphCast_small",
      model_config=configs.ModelConfig(resolution=1.0, mesh_size=5),
      task_config=configs.TASK_13)


def graphcast_operational() -> GraphCastPreset:
  """HRES-initialisable variant: 0.25°, 13 levels, mesh 2-6, precipitation
  output only (README.md:130-133)."""
  return GraphCastPreset(
      name="GraphCast_operational",
      model_config=configs.ModelConfig(resolution=0.25, mesh_size=6),
      task_config=configs.TASK_13_PRECIP_OUT)


GRAPHCAST_PRESETS = {
    "GraphCast": graphcast,
    "GraphCast_small": graphcast_small,
    "GraphCast_operational": graphcast_operational,
}


@dataclasses.dataclass(frozen=True)
class GenCastPreset:
  name: str
  resolution: float
  task_config: configs.TaskConfig
  denoiser_architecture_config: "object"
  sampler_config: "object"
  noise_config: "object"
  noise_encoder_config: "object"

  def build(self, **gencast_kwargs):
    """Constructs the GenCast predictor for this preset. Extra kwargs pass
    through to :class:`gencast.GenCast` (e.g. ``decode_chunks``,
    ``encode_chunks``, ``fused_aggregation``) — execution knobs that do
    not change the architecture."""
    from graphcast_tpu.models import gencast
    return gencast.GenCast(
        task_config=self.task_config,
        denoiser_architecture_config=self.denoiser_architecture_config,
        sampler_config=self.sampler_config,
        noise_config=self.noise_config,
        noise_encoder_config=self.noise_encoder_config,
        **gencast_kwargs)


def gencast_custom(resolution: float, mesh_size: int, d_model: int = 512,
                   num_layers: int = 16, num_heads: int = 4,
                   latent_size: int = 512,
                   name: str = "GenCast (custom)") -> GenCastPreset:
  """The released GenCast architecture (arXiv 2312.15796 §A + the reference
  defaults) at an arbitrary resolution/mesh size: 512-latent GNN
  encoder/decoder, 16-layer / 4-head / k-hop-16 sparse transformer
  processor on the mesh. The benches/tools build from here so a preset
  correction lands everywhere at once."""
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig

  st_cfg = SparseTransformerConfig(
      attention_k_hop=16, d_model=d_model, num_layers=num_layers,
      num_heads=num_heads, attention_type="splash_mha")
  arch = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=mesh_size,
      latent_size=latent_size, hidden_layers=1)
  return GenCastPreset(
      name=name, resolution=resolution, task_config=gencast.TASK,
      denoiser_architecture_config=arch,
      sampler_config=gencast.SamplerConfig(),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig())


def _gencast_preset(name: str, resolution: float,
                    mesh_size: int) -> GenCastPreset:
  return gencast_custom(resolution, mesh_size, name=name)


def gencast_0p25deg() -> GenCastPreset:
  """GenCast 0p25deg (and the Operational <2022 fine-tune): 13 levels,
  mesh-6 (README.md:52-65)."""
  return _gencast_preset("GenCast 0p25deg", 0.25, 6)


def gencast_1p0deg() -> GenCastPreset:
  """GenCast 1p0deg <2019: 13 levels, mesh-5 (README.md:67-70)."""
  return _gencast_preset("GenCast 1p0deg", 1.0, 5)


def gencast_mini() -> GenCastPreset:
  """GenCast 1p0deg Mini <2019: 13 levels, mesh-4 — the low-cost demo model
  (README.md:71-79)."""
  return _gencast_preset("GenCast 1p0deg Mini", 1.0, 4)


GENCAST_PRESETS = {
    "GenCast 0p25deg": gencast_0p25deg,
    "GenCast 1p0deg": gencast_1p0deg,
    "GenCast 1p0deg Mini": gencast_mini,
}
