"""Regression guard: jitted model programs must not embed large constants.

The remote TPU compile service rejects oversized HLO requests, and closure
constants bloat every compile (CLAUDE.md rig rules 1 and 8; at 0.25° the
GenCast trace once carried 3.2 GB of inlined splash/kernel masks). These
tests trace small fused models and assert every jaxpr const stays tiny —
all graph data and kernel masks must ride in params ("graph_statics").
"""

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.data import synthetic
from graphcast_tpu.models import configs
from graphcast_tpu.models.graphcast import GraphCast
from graphcast_tpu import train

# Generous ceiling for a tiny-config trace: catches any O(edges)/O(mask)
# array that leaks in as a constant while ignoring small index vectors.
MAX_CONST_BYTES = 256 << 10


def _largest_consts(jaxpr, top=5):
  sizes = []
  for c in jaxpr.consts:
    a = np.asarray(c)
    sizes.append((a.size * a.dtype.itemsize, a.shape, str(a.dtype)))
  sizes.sort(reverse=True)
  return sizes[:top]


def test_graphcast_fused_step_consts_small():
  task = configs.TaskConfig(
      input_variables=(
          "2m_temperature", "temperature", "toa_incident_solar_radiation",
          "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("toa_incident_solar_radiation",),
      pressure_levels=(500, 850),
      input_duration="12h")
  model = configs.ModelConfig(
      resolution=20.0, mesh_size=2, latent_size=32, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  gc = GraphCast(model, task, cache_dir="", fused_aggregation=True)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=20.0, batch=1)
  rng = jax.random.PRNGKey(0)
  params = gc.init(rng, inputs, targets, forcings)

  def fn(p, r, inputs, targets, forcings):
    sel = gc.precompute_step_statics(p, inputs)
    out = gc(p, r, inputs, targets, forcings, **sel)
    return jnp.mean(out.data("2m_temperature"))

  jaxpr = jax.make_jaxpr(fn)(params, rng, inputs, targets, forcings)
  big = [s for s in _largest_consts(jaxpr) if s[0] > MAX_CONST_BYTES]
  assert not big, f"large inline constants leaked into the HLO: {big}"


def test_graphcast_processor_grad_consts_small():
  """jax.grad through the fused processor (fused fwd+bwd kernels) must not
  inline the bitpacked masks — they ride in the custom-VJP residuals from
  the forward's graph_statics jit args."""
  task = configs.TaskConfig(
      input_variables=(
          "2m_temperature", "temperature", "toa_incident_solar_radiation",
          "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("toa_incident_solar_radiation",),
      pressure_levels=(500, 850),
      input_duration="12h")
  model = configs.ModelConfig(
      resolution=20.0, mesh_size=2, latent_size=32, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  gc = GraphCast(model, task, cache_dir="", fused_aggregation="processor")
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=20.0, batch=1)
  rng = jax.random.PRNGKey(0)
  params = gc.init(rng, inputs, targets, forcings)
  learned, statics = train.partition_params(params)

  def loss(lp, statics):
    l, _ = gc.loss({**lp, **statics}, rng, inputs, targets, forcings)
    return jnp.mean(l)

  jaxpr = jax.make_jaxpr(jax.grad(loss))(learned, statics)
  big = [s for s in _largest_consts(jaxpr) if s[0] > MAX_CONST_BYTES]
  assert not big, f"large inline constants leaked into the grad HLO: {big}"


def test_graphcast_full_fused_grad_consts_small():
  """jax.grad through the FULLY-fused model (fused encoder + processor +
  decoder kernels, fused backwards) must not inline kernel masks or sender
  tables — the decoder backward reads its bitpacked one-hot / compact ids
  from the layout threaded through the custom-VJP residuals."""
  task = configs.TaskConfig(
      input_variables=(
          "2m_temperature", "temperature", "toa_incident_solar_radiation",
          "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("toa_incident_solar_radiation",),
      pressure_levels=(500, 850),
      input_duration="12h")
  model = configs.ModelConfig(
      resolution=20.0, mesh_size=2, latent_size=32, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  gc = GraphCast(model, task, cache_dir="", fused_aggregation=True)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=20.0, batch=1)
  rng = jax.random.PRNGKey(0)
  params = gc.init(rng, inputs, targets, forcings)
  assert gc._m2g_decoder is not None and gc._m2g_decoder.fused_backward
  learned, statics = train.partition_params(params)

  def loss(lp, statics):
    l, _ = gc.loss({**lp, **statics}, rng, inputs, targets, forcings)
    return jnp.mean(l)

  jaxpr = jax.make_jaxpr(jax.grad(loss))(learned, statics)
  big = [s for s in _largest_consts(jaxpr) if s[0] > MAX_CONST_BYTES]
  assert not big, f"large inline constants leaked into the grad HLO: {big}"


def test_splash_grad_consts_small():
  """jax.grad through splash must not inline the backward block maps.

  The _dq/_dkv kernels once re-embedded kv_index/mask_blocks (and the
  transposed dkv maps) via jnp.asarray even when the forward statics were
  threaded — tens of MB of bitpacked masks per big config (rig rule 8).
  Uses distinct backward block sizes so the separate bwd map is exercised.
  """
  import scipy.sparse as sp
  from graphcast_tpu.ops.splash import BlockSparseAttention

  n = 1024
  rng = np.random.RandomState(0)
  ij = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
  mask = sp.csr_matrix((ij < 96) | (rng.rand(n, n) < 0.01))
  attn = BlockSparseAttention.from_mask(
      mask, block_q=128, block_kv=128, interpret=True,
      block_q_dkv=256, block_kv_dkv=256)
  statics = {k: jnp.asarray(v) for k, v in attn.host_statics().items()}
  assert "bwd_mask_rows_t" in statics and "bwd_mask_blocks" in statics

  q = jnp.asarray(rng.randn(1, n, 1, 128), jnp.float32)
  k = jnp.asarray(rng.randn(1, n, 1, 128), jnp.float32)
  v = jnp.asarray(rng.randn(1, n, 1, 128), jnp.float32)

  def loss(q, k, v, statics):
    return jnp.sum(attn(q, k, v, statics=statics))

  jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v, statics)
  # Threshold below any single bitpacked map (~128-512 KB here).
  big = [s for s in _largest_consts(jaxpr) if s[0] > (64 << 10)]
  assert not big, f"large inline constants leaked into the grad HLO: {big}"


def test_gencast_fused_step_consts_small():
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig

  task = configs.TaskConfig(
      input_variables=("2m_temperature", "temperature", "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=(),
      pressure_levels=(500, 850),
      input_duration="24h")
  st_cfg = SparseTransformerConfig(
      attention_k_hop=2, d_model=128, num_layers=2, num_heads=1,
      attention_type="splash_mha", ffw_hidden=128, block_q=64, block_kv=64)
  predictor = gencast.GenCast(
      task_config=task,
      denoiser_architecture_config=DenoiserArchitectureConfig(
          sparse_transformer_config=st_cfg, mesh_size=2, latent_size=128,
          hidden_layers=1),
      sampler_config=gencast.SamplerConfig(num_noise_levels=2),
      noise_config=gencast.NoiseConfig(),
      noise_encoder_config=NoiseEncoderConfig(
          num_frequencies=8, output_sizes=(16, 8)),
      cache_dir="", interpret_attention=True, fused_aggregation=True)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=10.0, batch=1, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(0)
  params = predictor.init(rng, inputs, targets, forcings)
  # The kernel masks and splash maps must live in the statics, not consts.
  statics = params["architecture"]["graph_statics"]
  assert any(k.startswith("splash_") for k in statics)

  def fn(p, r, inputs, targets, forcings):
    out = predictor(p, r, inputs, targets, forcings)
    return jnp.mean(out.data("2m_temperature"))

  jaxpr = jax.make_jaxpr(fn)(params, rng, inputs, targets, forcings)
  big = [s for s in _largest_consts(jaxpr) if s[0] > MAX_CONST_BYTES]
  assert not big, f"large inline constants leaked into the HLO: {big}"
