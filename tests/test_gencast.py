"""End-to-end GenCast tests: denoiser, preconditioning, sampler, loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.data import synthetic
from graphcast_tpu.models import configs, gencast
from graphcast_tpu.models.denoiser import (
    DenoiserArchitectureConfig, NoiseEncoderConfig)
from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
from graphcast_tpu.wrappers import InputsAndResiduals, NaNCleaner

TINY_TASK = configs.TaskConfig(
    input_variables=(
        "2m_temperature", "temperature", "sea_surface_temperature",
        "day_progress_sin", "land_sea_mask"),
    target_variables=("2m_temperature", "temperature",
                      "sea_surface_temperature"),
    forcing_variables=("day_progress_sin",),
    pressure_levels=(500, 850),
    input_duration="24h",
)


def tiny_gencast(attention_type="mha", num_noise_levels=4):
  st_cfg = SparseTransformerConfig(
      attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
      attention_type=attention_type, ffw_hidden=32,
      block_q=64, block_kv=64)
  arch_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=st_cfg, mesh_size=1, latent_size=16,
      hidden_layers=1)
  noise_enc = NoiseEncoderConfig(num_frequencies=8, output_sizes=(16, 8))
  sampler_cfg = gencast.SamplerConfig(num_noise_levels=num_noise_levels)
  return gencast.GenCast(
      task_config=TINY_TASK,
      denoiser_architecture_config=arch_cfg,
      sampler_config=sampler_cfg,
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=noise_enc,
      cache_dir="", interpret_attention=True)


def make_batch(batch=2):
  return synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=batch, num_target_times=1,
      time_step_hours=12)


@pytest.mark.parametrize("attention_type", ["mha", "triblockdiag_mha"])
def test_gencast_sample_shapes(attention_type):
  predictor = tiny_gencast(attention_type)
  inputs, targets, forcings = make_batch()
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  sample = jax.jit(
      lambda p, r: predictor(p, r, inputs, targets, forcings))(params, rng)
  assert sample.var_names == targets.var_names
  for n in targets.var_names:
    assert sample[n].shape == targets[n].shape
    assert np.isfinite(np.asarray(sample[n].data)).all()


def test_gencast_samples_differ_across_rngs():
  predictor = tiny_gencast()
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  fn = jax.jit(lambda p, r: predictor(p, r, inputs, targets, forcings))
  s1 = fn(params, jax.random.PRNGKey(1))
  s2 = fn(params, jax.random.PRNGKey(2))
  assert not np.allclose(np.asarray(s1.data("temperature")),
                         np.asarray(s2.data("temperature")))


def test_gencast_loss_and_grads():
  from graphcast_tpu import train
  predictor = tiny_gencast()
  inputs, targets, forcings = make_batch()
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  trainable, statics = train.partition_params(params)

  def loss_fn(p, r):
    loss, diagnostics = predictor.loss(
        train.merge_params(p, statics), r, inputs, targets, forcings)
    return jnp.mean(loss), diagnostics

  (loss, diag), grads = jax.jit(jax.value_and_grad(
      loss_fn, has_aux=True))(trainable, rng)
  assert np.isfinite(float(loss))
  assert "sea_surface_temperature" in diag
  leaves = jax.tree_util.tree_leaves(grads)
  assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
  # Transformer blocks get gradients.
  g_attn = grads["architecture"]["mesh_transformer"]["block_00"][
      "mha_proj_q"]["w"]
  assert float(jnp.abs(g_attn).sum()) > 0


def test_preconditioning_identities():
  """c_skip + c_out·c_in consistency: at σ→0, D(x) ≈ x (identity)."""
  g = gencast.GenCast
  sigma = jnp.asarray([1e-4])
  np.testing.assert_allclose(float(g._c_skip(sigma)[0]), 1.0, atol=1e-6)
  np.testing.assert_allclose(float(g._c_out(sigma)[0]), 1e-4, rtol=1e-3)
  np.testing.assert_allclose(float(g._c_in(sigma)[0]), 1.0, atol=1e-6)
  # At large σ, c_in·σ ≈ 1 (inputs normalized to unit variance).
  sigma = jnp.asarray([80.0])
  np.testing.assert_allclose(float(g._c_in(sigma)[0]) * 80.0, 1.0, rtol=1e-3)


def test_gencast_with_wrapper_stack():
  """Full inference stack: NaNCleaner(InputsAndResiduals(GenCast))."""
  predictor = tiny_gencast()
  stddev, mean, diffs = synthetic.make_norm_stats(TINY_TASK)
  stack = NaNCleaner(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs),
      var_to_clean="sea_surface_temperature", fill_value=0.0)
  inputs, targets, forcings = make_batch(batch=1)
  # Introduce NaNs into SST inputs (land mask).
  sst = np.asarray(inputs.data("sea_surface_temperature")).copy()
  sst[..., :2] = np.nan
  inputs = inputs.replace_data("sea_surface_temperature", sst)

  rng = jax.random.PRNGKey(0)
  params = stack.init(rng, inputs, targets, forcings)
  preds = stack(params, rng, inputs, targets, forcings)
  sst_pred = np.asarray(preds.data("sea_surface_temperature"))
  # NaN mask reintroduced on predictions.
  assert np.isnan(sst_pred[..., :2]).all()
  assert np.isfinite(sst_pred[..., 2:]).all()
  assert np.isfinite(np.asarray(preds.data("temperature"))).all()


def test_gencast_autoregressive_rollout():
  """Chained 12h GenCast steps through the Autoregressive scan (the
  production 30-step rollout path, tiny)."""
  from graphcast_tpu.wrappers import Autoregressive
  predictor = tiny_gencast(num_noise_levels=3)
  stddev, mean, diffs = synthetic.make_norm_stats(TINY_TASK)
  stack = Autoregressive(
      InputsAndResiduals(predictor, stddev_by_level=stddev,
                         mean_by_level=mean, diffs_stddev_by_level=diffs))
  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=3,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = stack.init(rng, inputs, targets, forcings)
  preds = jax.jit(
      lambda p, r: stack(p, r, inputs, targets, forcings))(params, rng)
  assert preds["temperature"].sizes["time"] == 3
  data = np.asarray(preds.data("temperature"))
  assert np.isfinite(data).all()
  # Different sampled trajectories at different steps.
  assert not np.allclose(data[:, 0], data[:, 2])


def test_denoiser_chunked_matches_full():
  """Chunked encode/decode in the denoiser must match the full paths."""
  import dataclasses as dc
  full = tiny_gencast()
  chunked = tiny_gencast()
  chunked._denoiser._architecture._encode_chunks = 4
  chunked._denoiser._architecture._decode_chunks = 4
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = full.init(rng, inputs, targets, forcings)
  s_full = full(params, rng, inputs, targets, forcings)
  # The chunked model lays out its grid2mesh statics differently (balanced
  # node chunks) — drop the full model's statics so it derives its own.
  params_chunk = dict(params)
  params_chunk["architecture"] = {
      k: v for k, v in params["architecture"].items()
      if k != "graph_statics"}
  s_chunk = chunked(params_chunk, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(s_chunk.data(n)), np.asarray(s_full.data(n)),
        rtol=3e-4, atol=3e-4)


def test_denoiser_fused_kernels_match_full():
  """fused_aggregation=True routes the denoiser's grid2mesh/mesh2grid
  through the conditioned Pallas kernels (interpret on CPU) at batch 1;
  outputs must match the plain paths."""
  full = tiny_gencast()
  fused = gencast.GenCast(
      task_config=TINY_TASK,
      denoiser_architecture_config=DenoiserArchitectureConfig(
          sparse_transformer_config=SparseTransformerConfig(
              attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
              attention_type="mha", ffw_hidden=32),
          mesh_size=1, latent_size=16, hidden_layers=1),
      sampler_config=gencast.SamplerConfig(num_noise_levels=4),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig(
          num_frequencies=8, output_sizes=(16, 8)),
      cache_dir="", interpret_attention=True, fused_aggregation=True)
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = full.init(rng, inputs, targets, forcings)
  s_full = full(params, rng, inputs, targets, forcings)
  params_fused = dict(params)
  params_fused["architecture"] = {
      k: v for k, v in params["architecture"].items()
      if k != "graph_statics"}
  s_fused = fused(params_fused, rng, inputs, targets, forcings)
  # The decoder kernel must actually be engaged.
  assert fused._denoiser._architecture._m2g_decoder is not None
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(s_fused.data(n)), np.asarray(s_full.data(n)),
        rtol=1e-3, atol=1e-3)

  # Training: loss + grads through the fused paths (fused-backward custom
  # VJPs, incl. the embed-mode decoder backward) must match the plain path.
  g_fused = jax.grad(lambda p: jnp.mean(
      fused.loss(p, rng, inputs, targets, forcings)[0]))(params_fused)
  g_full = jax.grad(lambda p: jnp.mean(
      full.loss({**p,
                 "architecture": {**p["architecture"],
                                  "graph_statics":
                                      params["architecture"][
                                          "graph_statics"]}},
                rng, inputs, targets, forcings)[0]))(params_fused)
  flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fused)[0])
  flat_p = dict(jax.tree_util.tree_flatten_with_path(g_full)[0])
  assert flat_f.keys() == flat_p.keys()
  for k in flat_f:
    np.testing.assert_allclose(
        np.asarray(flat_f[k]), np.asarray(flat_p[k]),
        rtol=2e-3, atol=2e-3, err_msg=str(k))


def test_denoiser_chunked_with_splash_matches_full():
  """Chunked GNN paths combined with splash attention (the combination that
  once lost the balanced-chunk statics padding to an if/elif chain bug)."""
  full = tiny_gencast(attention_type="splash_mha")
  chunked = tiny_gencast(attention_type="splash_mha")
  chunked._denoiser._architecture._encode_chunks = 4
  chunked._denoiser._architecture._decode_chunks = 4
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  params = full.init(rng, inputs, targets, forcings)
  s_full = full(params, rng, inputs, targets, forcings)
  params_chunk = dict(params)
  params_chunk["architecture"] = {
      k: v for k, v in params["architecture"].items()
      if k != "graph_statics"}
  s_chunk = chunked(params_chunk, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(s_chunk.data(n)), np.asarray(s_full.data(n)),
        rtol=3e-4, atol=3e-4)


def test_gencast_sequence_parallel_matches_unsharded():
  """The real denoiser under sp=2: forward sample and loss grads must match
  the unsharded model bit-for-tolerance (reference knob q_seq_shards,
  sparse_transformer.py:271-273)."""
  from jax.sharding import Mesh
  from graphcast_tpu import train

  def build(sequence_parallel=None):
    st_cfg = SparseTransformerConfig(
        attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
        attention_type="splash_mha", ffw_hidden=32,
        block_q=32, block_kv=32)
    arch_cfg = DenoiserArchitectureConfig(
        sparse_transformer_config=st_cfg, mesh_size=1, latent_size=16,
        hidden_layers=1)
    return gencast.GenCast(
        task_config=TINY_TASK,
        denoiser_architecture_config=arch_cfg,
        sampler_config=gencast.SamplerConfig(num_noise_levels=3),
        noise_config=gencast.NoiseConfig(),
        noise_encoder_config=NoiseEncoderConfig(
            num_frequencies=8, output_sizes=(16, 8)),
        cache_dir="", interpret_attention=True,
        sequence_parallel=sequence_parallel)

  mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
  base = build()
  sp = build(sequence_parallel=(mesh, "sp"))
  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)

  params_base = base.init(rng, inputs, targets, forcings)
  params_sp = sp.init(rng, inputs, targets, forcings)
  # Same trainable weights; graph_statics differ (per-shard splash maps).
  trainable, _ = train.partition_params(params_base)
  _, statics_sp = train.partition_params(params_sp)
  params_sp = train.merge_params(trainable, statics_sp)

  s_base = jax.jit(
      lambda p, r: base(p, r, inputs, targets, forcings))(
          params_base, jax.random.PRNGKey(5))
  s_sp = jax.jit(
      lambda p, r: sp(p, r, inputs, targets, forcings))(
          params_sp, jax.random.PRNGKey(5))
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(s_sp.data(n)), np.asarray(s_base.data(n)),
        rtol=1e-5, atol=1e-5)

  def loss_fn(model, statics):
    def fn(p, r):
      loss, _ = model.loss(train.merge_params(p, statics), r, inputs,
                           targets, forcings)
      return jnp.mean(loss)
    return fn

  _, statics_base = train.partition_params(params_base)
  g_base = jax.jit(jax.grad(loss_fn(base, statics_base)))(
      trainable, jax.random.PRNGKey(9))
  g_sp = jax.jit(jax.grad(loss_fn(sp, statics_sp)))(
      trainable, jax.random.PRNGKey(9))
  flat_base, _ = jax.tree_util.tree_flatten_with_path(g_base)
  flat_sp = dict(jax.tree_util.tree_flatten_with_path(g_sp)[0])
  assert len(flat_base) == len(flat_sp) and len(flat_base) > 0
  for path, val in flat_base:
    np.testing.assert_allclose(
        np.asarray(flat_sp[path]), np.asarray(val), rtol=2e-4, atol=2e-5,
        err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_denoiser_windowed_sender_gather_matches(monkeypatch):
  """GC_G2M_WINDOWED=1 (windowed sender gather in the denoiser's fused g2m
  encode, ops/window_gather.py) must be BIT-equal to the flat gather."""
  def build():
    return gencast.GenCast(
        task_config=TINY_TASK,
        denoiser_architecture_config=DenoiserArchitectureConfig(
            sparse_transformer_config=SparseTransformerConfig(
                attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
                attention_type="mha", ffw_hidden=32),
            mesh_size=1, latent_size=16, hidden_layers=1),
        sampler_config=gencast.SamplerConfig(num_noise_levels=4),
        noise_config=gencast.NoiseConfig(),
        noise_encoder_config=NoiseEncoderConfig(
            num_frequencies=8, output_sizes=(16, 8)),
        cache_dir="", interpret_attention=True, fused_aggregation=True)

  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  from graphcast_tpu.ops import window_gather
  monkeypatch.setattr(window_gather, "MIN_TABLE_ROWS", 0)
  monkeypatch.setenv("GC_G2M_WINDOWED", "0")
  plain = build()
  params = plain.init(rng, inputs, targets, forcings)
  s_plain = plain(params, rng, inputs, targets, forcings)

  monkeypatch.setenv("GC_G2M_WINDOWED", "1")
  windowed = build()
  learned = dict(params)
  learned["architecture"] = {
      k: v for k, v in params["architecture"].items()
      if k != "graph_statics"}
  params_g = windowed.init(rng, inputs, targets, forcings)
  assert (params_g["architecture"]["graph_statics"]
          .get("g2m_win_base") is not None)
  params_g = {**params_g, "noise_encoder": params["noise_encoder"],
              "architecture": {**learned["architecture"],
                               "graph_statics":
                                   params_g["architecture"]
                                   ["graph_statics"]}}
  s_windowed = windowed(params_g, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_array_equal(
        np.asarray(s_windowed.data(n)), np.asarray(s_plain.data(n)),
        err_msg=n)
