"""Released-model presets mirror the reference's documented checkpoints."""

from graphcast_tpu.models import configs, zoo


def test_graphcast_presets_match_released_checkpoints():
  gc = zoo.graphcast()
  assert gc.model_config.resolution == 0.25
  assert gc.model_config.mesh_size == 6
  assert gc.model_config.latent_size == 512
  assert gc.model_config.gnn_msg_steps == 16
  assert gc.task_config.pressure_levels == configs.PRESSURE_LEVELS_ERA5_37
  assert "total_precipitation_6hr" in gc.task_config.input_variables

  small = zoo.graphcast_small()
  assert small.model_config.resolution == 1.0
  assert small.model_config.mesh_size == 5
  assert small.task_config.pressure_levels == (
      configs.PRESSURE_LEVELS_WEATHERBENCH_13)

  op = zoo.graphcast_operational()
  assert op.model_config.resolution == 0.25
  assert op.model_config.mesh_size == 6
  assert op.task_config.pressure_levels == (
      configs.PRESSURE_LEVELS_WEATHERBENCH_13)
  # Operational is initialised from HRES: precipitation output only.
  assert "total_precipitation_6hr" not in op.task_config.input_variables
  assert "total_precipitation_6hr" in op.task_config.target_variables

  assert set(zoo.GRAPHCAST_PRESETS) == {
      "GraphCast", "GraphCast_small", "GraphCast_operational"}


def test_gencast_presets_match_released_checkpoints():
  for name, (res, mesh) in {
      "GenCast 0p25deg": (0.25, 6),
      "GenCast 1p0deg": (1.0, 5),
      "GenCast 1p0deg Mini": (1.0, 4),
  }.items():
    preset = zoo.GENCAST_PRESETS[name]()
    assert preset.resolution == res
    assert preset.denoiser_architecture_config.mesh_size == mesh
    st = preset.denoiser_architecture_config.sparse_transformer_config
    assert (st.d_model, st.num_layers, st.num_heads,
            st.attention_k_hop) == (512, 16, 4, 16)
    assert preset.task_config.pressure_levels == (
        configs.PRESSURE_LEVELS_WEATHERBENCH_13)


def test_gencast_preset_builds_predictor():
  predictor = zoo.gencast_mini().build()
  from graphcast_tpu.models.gencast import GenCast
  assert isinstance(predictor, GenCast)


def test_gencast_custom_matches_presets_and_forwards_build_kwargs():
  """gencast_custom is the single source of truth the benches build from:
  at the released sizes it must equal the named presets, and build()
  must forward execution knobs to GenCast."""
  for preset_fn, (res, mesh) in [(zoo.gencast_0p25deg, (0.25, 6)),
                                 (zoo.gencast_1p0deg, (1.0, 5)),
                                 (zoo.gencast_mini, (1.0, 4))]:
    preset = preset_fn()
    custom = zoo.gencast_custom(res, mesh)
    assert custom.denoiser_architecture_config == (
        preset.denoiser_architecture_config)
    assert custom.sampler_config == preset.sampler_config
    assert custom.noise_config == preset.noise_config
    assert custom.noise_encoder_config == preset.noise_encoder_config
    assert custom.task_config == preset.task_config
  predictor = zoo.gencast_custom(1.0, 4).build(
      decode_chunks=2, encode_chunks=2, fused_aggregation=False)
  arch = predictor._denoiser._architecture
  assert arch._decode_chunks == 2
  assert arch._encode_chunks == 2
