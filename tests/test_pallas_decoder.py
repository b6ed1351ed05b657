"""FusedMesh2GridDecoder: kernel vs reference math, grads, model parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.ops.pallas_decoder import FusedMesh2GridDecoder


def _random_setup(G=20, M=30, C=128, num_outputs=5, bn=8, dtype=jnp.float32,
                  seed=0, **dec_kw):
  rs = np.random.RandomState(seed)
  senders = rs.randint(0, M, size=3 * G).astype(np.int32)
  dec = FusedMesh2GridDecoder(senders, G, num_outputs, block_nodes=bn,
                              interpret=True, **dec_kw)
  grid = jnp.asarray(rs.randn(G, C), dtype)
  mesh_proj = jnp.asarray(rs.randn(M, C), dtype)
  const = jnp.asarray(rs.randn(3 * G, C), dtype)
  const_slot = dec.rearrange_edge_array(const)
  sq = {k: jnp.asarray(rs.randn(C, C) / np.sqrt(C), jnp.float32)
        for k in ["wr", "w1", "wng", "wna", "wn1", "wd0"]}
  weights = {
      **sq,
      "b1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "escale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "eoffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bn0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "bn1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "nscale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "noffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bd0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "wd1": jnp.asarray(rs.randn(C, dec.out_pad) / np.sqrt(C), jnp.float32),
      "bd1": jnp.asarray(rs.randn(dec.out_pad) * 0.1, jnp.float32),
  }
  return dec, grid, mesh_proj, const_slot, weights


def test_kernel_matches_reference_math_f32():
  dec, grid, mesh_proj, const_slot, weights = _random_setup()
  out = dec(grid, mesh_proj, const_slot, weights)
  ref = dec._reference_math(grid, mesh_proj, const_slot, weights)
  assert out.shape == (20, 5)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-5, atol=2e-5)


def test_kernel_matches_reference_math_bf16():
  dec, grid, mesh_proj, const_slot, weights = _random_setup(
      dtype=jnp.bfloat16, seed=1)
  out = dec(grid, mesh_proj, const_slot, weights)
  ref = dec._reference_math(grid, mesh_proj, const_slot, weights)
  assert out.dtype == jnp.bfloat16
  np.testing.assert_allclose(
      np.asarray(out, np.float32), np.asarray(ref, np.float32),
      rtol=0.05, atol=0.05)


def test_mxu_ln_stats_matches_reference():
  """ln_stats="mxu" (ones-matmul LayerNorm statistics) decoder output must
  match the reference math."""
  dec, grid, mesh_proj, const_slot, weights = _random_setup(
      seed=2, ln_stats="mxu")
  assert dec.ln_stats == "mxu"
  out = dec(grid, mesh_proj, const_slot, weights)
  ref = dec._reference_math(grid, mesh_proj, const_slot, weights)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-5, atol=2e-5)


def test_compact_gather_matches_direct():
  """compact_gather=True (per-block unique-sender tables + in-kernel one-hot
  expansion) must produce the same result as the direct-gather kernel."""
  rs = np.random.RandomState(3)
  # Row-packed compact masks need block_nodes % 32 == 0 (and bwd_split
  # sub-blocks on mask-row-group boundaries): 64-node blocks, 3 blocks.
  G, M, C, bn = 160, 24, 128, 64
  # Senders with heavy reuse inside blocks (like real triangle containment).
  senders = np.repeat(rs.randint(0, M, size=G), 3).astype(np.int32)
  grid = jnp.asarray(rs.randn(G, C), jnp.float32)
  mesh_proj = jnp.asarray(rs.randn(M, C), jnp.float32)
  const = jnp.asarray(rs.randn(3 * G, C), jnp.float32)

  outs = []
  for compact in (False, True):
    dec = FusedMesh2GridDecoder(senders, G, 7, block_nodes=bn,
                                interpret=True, compact_gather=compact)
    assert dec.compact == compact
    const_slot = dec.rearrange_edge_array(const)
    sq = {k: jnp.asarray(rs2.randn(C, C) / np.sqrt(C), jnp.float32)
          for rs2 in [np.random.RandomState(9)]
          for k in ["wr", "w1", "wng", "wna", "wn1", "wd0"]}
    weights = {
        **sq,
        "b1": jnp.zeros(C), "escale": jnp.ones(C), "eoffset": jnp.zeros(C),
        "bn0": jnp.zeros(C), "bn1": jnp.zeros(C),
        "nscale": jnp.ones(C), "noffset": jnp.zeros(C),
        "bd0": jnp.zeros(C),
        "wd1": jnp.asarray(
            np.random.RandomState(9).randn(C, dec.out_pad) / np.sqrt(C),
            jnp.float32),
        "bd1": jnp.zeros(dec.out_pad),
    }
    outs.append(np.asarray(dec(grid, mesh_proj, const_slot, weights)))
  np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)


def test_rearrange_edge_array_slot_major():
  G, bn = 5, 8
  senders = np.arange(3 * G, dtype=np.int32) % 4
  dec = FusedMesh2GridDecoder(senders, G, 2, block_nodes=bn, interpret=True)
  per_edge = jnp.arange(3 * G, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
  slot = dec.rearrange_edge_array(per_edge)
  assert slot.shape == (3, dec.padded_grid, 4)
  # Edge-slot j of node v was row 3v + j in receiver-sorted order.
  for v in range(G):
    for j in range(3):
      assert float(slot[j, v, 0]) == 3 * v + j
  assert float(jnp.abs(slot[:, G:]).max()) == 0.0  # zero padding


def test_gradients_flow_and_match_reference():
  """Default (fused) backward kernel vs XLA autodiff of the reference math,
  including the const_slot cotangent (param-derived for GraphCast)."""
  dec, grid, mesh_proj, const_slot, weights = _random_setup(seed=2)
  assert dec.fused_backward

  def loss_kernel(g, mp, cs, w):
    return jnp.sum(dec(g, mp, cs, w) ** 2)

  def loss_ref(g, mp, cs, w):
    return jnp.sum(dec._reference_math(g, mp, cs, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  for a, b in zip(jax.tree_util.tree_leaves(gk),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_unfused_backward_fallback_matches_reference():
  dec, grid, mesh_proj, const_slot, weights = _random_setup(
      seed=2, fused_backward=False)

  def loss_kernel(g, mp, w):
    return jnp.sum(dec(g, mp, const_slot, w) ** 2)

  def loss_ref(g, mp, w):
    return jnp.sum(dec._reference_math(g, mp, const_slot, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(grid, mesh_proj, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2))(grid, mesh_proj, weights)
  for a, b in zip(jax.tree_util.tree_leaves(gk),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("split", [1, 2, 4])
def test_fused_backward_split_grid(split):
  """bwd_split sub-blocks accumulate the same grads as split=1."""
  dec, grid, mesh_proj, const_slot, weights = _random_setup(
      seed=4, bwd_split=split)

  def loss_kernel(g, mp, cs, w):
    return jnp.sum(dec(g, mp, cs, w) ** 2)

  def loss_ref(g, mp, cs, w):
    return jnp.sum(dec._reference_math(g, mp, cs, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  for a, b in zip(jax.tree_util.tree_leaves(gk),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_fused_backward_mxu_ln_stats():
  """ln_stats="mxu" (ones-matmul LayerNorm statistics) through the fused
  backward matches the reference grads."""
  dec, grid, mesh_proj, const_slot, weights = _random_setup(
      seed=5, ln_stats="mxu")
  assert dec.ln_stats == "mxu"

  def loss_kernel(g, mp, cs, w):
    return jnp.sum(dec(g, mp, cs, w) ** 2)

  def loss_ref(g, mp, cs, w):
    return jnp.sum(dec._reference_math(g, mp, cs, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  for a, b in zip(jax.tree_util.tree_leaves(gk),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("compact", [False, True])
def test_fused_backward_embed_mode(compact):
  """Fused backward through the in-kernel embed MLP + edge matmul chain
  (the denoiser's configuration), direct and compact gather paths."""
  rs = np.random.RandomState(7)
  G, M, C, F, bn = 160, 24, 128, 8, 64
  senders = np.repeat(rs.randint(0, M, size=G), 3).astype(np.int32)
  dec = FusedMesh2GridDecoder(senders, G, 5, block_nodes=bn,
                              interpret=True, compact_gather=compact)
  assert dec.compact == compact
  grid = jnp.asarray(rs.randn(G, C), jnp.float32)
  mesh_proj = jnp.asarray(rs.randn(M, C), jnp.float32)
  raw = jnp.asarray(rs.randn(3 * G, F), jnp.float32)
  const_slot = dec.rearrange_edge_array(raw)
  sq = {k: jnp.asarray(rs.randn(C, C) / np.sqrt(C), jnp.float32)
        for k in ["we", "ew1", "wr", "w1", "wng", "wna", "wn1", "wd0"]}
  weights = {
      **sq,
      "ew0": jnp.asarray(rs.randn(F, C) / np.sqrt(F), jnp.float32),
      "eb0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "eb1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "b0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "b1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "escale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "eoffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bn0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "bn1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "nscale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "noffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bd0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "wd1": jnp.asarray(rs.randn(C, dec.out_pad) / np.sqrt(C), jnp.float32),
      "bd1": jnp.asarray(rs.randn(dec.out_pad) * 0.1, jnp.float32),
  }
  # Forward parity first (embed mode).
  out = dec(grid, mesh_proj, const_slot, weights)
  ref = dec._reference_math(grid, mesh_proj, const_slot, weights)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-5, atol=2e-5)

  def loss_kernel(g, mp, cs, w):
    return jnp.sum(dec(g, mp, cs, w) ** 2)

  def loss_ref(g, mp, cs, w):
    return jnp.sum(dec._reference_math(g, mp, cs, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  names = (["grid", "mesh", "const"]
           + sorted(weights.keys()))
  for name, a, b in zip(names, jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3, err_msg=name)


def test_fused_backward_compact_plain_mode():
  """Compact-gather backward (dcomp accumulation + scatter-add) without the
  embed/edge-matmul chain."""
  rs = np.random.RandomState(11)
  G, M, C, bn = 160, 24, 128, 64
  senders = np.repeat(rs.randint(0, M, size=G), 3).astype(np.int32)
  dec = FusedMesh2GridDecoder(senders, G, 5, block_nodes=bn,
                              interpret=True, compact_gather=True,
                              bwd_split=2)
  grid = jnp.asarray(rs.randn(G, C), jnp.float32)
  mesh_proj = jnp.asarray(rs.randn(M, C), jnp.float32)
  const = jnp.asarray(rs.randn(3 * G, C), jnp.float32)
  const_slot = dec.rearrange_edge_array(const)
  sq = {k: jnp.asarray(rs.randn(C, C) / np.sqrt(C), jnp.float32)
        for k in ["wr", "w1", "wng", "wna", "wn1", "wd0"]}
  weights = {
      **sq,
      "b1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "escale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "eoffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bn0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "bn1": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "nscale": jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32),
      "noffset": jnp.asarray(0.1 * rs.randn(C), jnp.float32),
      "bd0": jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
      "wd1": jnp.asarray(rs.randn(C, dec.out_pad) / np.sqrt(C), jnp.float32),
      "bd1": jnp.asarray(rs.randn(dec.out_pad) * 0.1, jnp.float32),
  }

  def loss_kernel(g, mp, cs, w):
    return jnp.sum(dec(g, mp, cs, w) ** 2)

  def loss_ref(g, mp, cs, w):
    return jnp.sum(dec._reference_math(g, mp, cs, w) ** 2)

  gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
      grid, mesh_proj, const_slot, weights)
  for a, b in zip(jax.tree_util.tree_leaves(gk),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_model_fused_decoder_engaged_and_matches():
  """GraphCast with fused_aggregation=True at batch 1 must route decode
  through FusedMesh2GridDecoder and match the plain model."""
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import configs
  from graphcast_tpu.models.graphcast import GraphCast
  from graphcast_tpu import train

  task = configs.TaskConfig(
      input_variables=(
          "2m_temperature", "temperature", "toa_incident_solar_radiation",
          "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("toa_incident_solar_radiation",),
      pressure_levels=(500, 850),
      input_duration="12h")
  model = configs.ModelConfig(
      resolution=30.0, mesh_size=1, latent_size=16, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=30.0, batch=1)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(model, task, cache_dir="", fused_aggregation=False)
  m_fused = GraphCast(model, task, cache_dir="", fused_aggregation=True)
  params = m_plain.init(rng, inputs, targets, forcings)
  learned, _ = train.partition_params(params)
  params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
  assert m_fused._m2g_decoder is not None

  out_plain = m_plain(params, rng, inputs, targets, forcings)
  out_fused = m_fused(params_fused, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_fused.data(n)), np.asarray(out_plain.data(n)),
        rtol=5e-4, atol=5e-4)

  # With the hoisted const (precompute_step_statics) the result is the same.
  sel = m_fused.precompute_step_statics(params_fused, inputs)
  assert "m2g_const_slot" in sel["static_edge_latents"]
  out_hoisted = m_fused(params_fused, rng, inputs, targets, forcings,
                        **sel)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_hoisted.data(n)), np.asarray(out_fused.data(n)),
        rtol=1e-5, atol=1e-5)
