"""Validates the fused edge-step kernel against the unfused composition."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.ops import pallas_edge, pallas_mp


def make_setup(seed=0, n=96, e=600, c=128, bn=32, cs=64):
  rng = np.random.RandomState(seed)
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  # Ensure no empty node block (every block must own ≥ 1 edge).
  receivers[:n] = np.arange(n)
  receivers = np.sort(receivers)
  summer = pallas_mp.BlockedSegmentSum(
      receivers, n, block_nodes=bn, chunk_edges=cs, interpret=True,
      padded_input=True)
  step = pallas_edge.FusedEdgeStep(summer, interpret=True)
  senders = rng.randint(0, n, e).astype(np.int32)

  e_pad = jnp.asarray(summer.pad_edges(
      rng.randn(e, c).astype(np.float32)))
  x = jnp.asarray(rng.randn(n, c).astype(np.float32))
  params = dict(
      we=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
      ws=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
      wr=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
      b0=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
      w1=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
      b1=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
      scale=jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32)),
      offset=jnp.asarray(0.1 * rng.randn(c).astype(np.float32)))
  return summer, step, senders, receivers, e_pad, x, params


def unfused_reference(summer, senders, receivers, e_orig, x, p):
  """The processor edge step in plain ops, on the ORIGINAL edge order."""
  x0 = (e_orig @ p["we"] + (x @ p["ws"])[senders]
        + (x @ p["wr"])[receivers] + p["b0"][None])
  h = x0 * jax.nn.sigmoid(x0)
  y = h @ p["w1"] + p["b1"][None]
  mean = jnp.mean(y, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
  yn = (y - mean) * jax.lax.rsqrt(var + pallas_edge.LN_EPS)
  yn = yn * p["scale"][None] + p["offset"][None]
  eout = e_orig + yn
  agg = jax.ops.segment_sum(yn, jnp.asarray(receivers),
                            num_segments=summer.num_nodes,
                            indices_are_sorted=True)
  return eout, agg


def run_fused(step, senders, e_pad, x, p):
  summer = step.summer
  gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
  gr_pad = step.pad_nodes(x @ p["wr"])
  return step(e_pad, gs, gr_pad, p["we"], p["b0"], p["w1"], p["b1"],
              p["scale"], p["offset"])


def test_fused_edge_step_matches_unfused():
  summer, step, senders, receivers, e_pad, x, p = make_setup()
  e_orig = jnp.asarray(np.asarray(e_pad)[summer.layout_index
                                         [summer.layout_index
                                          < summer.num_edges]])
  # Recover the original-order edge latents from the padded layout.
  valid = summer.layout_index < summer.num_edges
  e_orig = jnp.zeros((summer.num_edges, e_pad.shape[-1]), e_pad.dtype)
  e_orig = e_orig.at[summer.layout_index[valid]].set(
      jnp.asarray(np.asarray(e_pad)[valid]))

  eout_pad, agg = run_fused(step, senders, e_pad, x, p)
  want_eout, want_agg = unfused_reference(
      summer, senders, receivers, e_orig, x, p)

  got_eout = np.asarray(eout_pad)[valid]
  idx = summer.layout_index[valid]
  np.testing.assert_allclose(got_eout, np.asarray(want_eout)[idx],
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(agg), np.asarray(want_agg),
                             rtol=2e-4, atol=2e-4)


def test_fused_edge_step_gradients():
  summer, step, senders, receivers, e_pad, x, p = make_setup(seed=1)
  valid = summer.layout_index < summer.num_edges
  idx = summer.layout_index[valid]
  w_e = jnp.asarray(np.random.RandomState(2).randn(
      summer.num_edges, e_pad.shape[-1]).astype(np.float32))
  w_a = jnp.asarray(np.random.RandomState(3).randn(
      summer.num_nodes, e_pad.shape[-1]).astype(np.float32))

  del w_e

  def loss_fused2(e_pad, x, p):
    eout_pad, agg = run_fused(step, senders, e_pad, x, p)
    return (jnp.sum(jnp.square(eout_pad[jnp.asarray(np.nonzero(valid)[0])]))
            + jnp.sum(agg * w_a))

  def loss_unfused(e_orig, x, p):
    eout, agg = unfused_reference(summer, senders, receivers, e_orig, x, p)
    return jnp.sum(jnp.square(eout)) + jnp.sum(agg * w_a)

  e_orig = jnp.zeros((summer.num_edges, e_pad.shape[-1]), e_pad.dtype)
  e_orig = e_orig.at[idx].set(jnp.asarray(np.asarray(e_pad)[valid]))

  g_fused = jax.grad(loss_fused2, argnums=(0, 1))(e_pad, x, p)
  g_unfused = jax.grad(loss_unfused, argnums=(0, 1))(e_orig, x, p)

  # Edge grads: compare on real slots mapped back to original order.
  de_pad = np.asarray(g_fused[0])
  de = np.zeros((summer.num_edges, e_pad.shape[-1]), np.float32)
  de[idx] = de_pad[valid]
  np.testing.assert_allclose(de, np.asarray(g_unfused[0]),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(g_fused[1]),
                             np.asarray(g_unfused[1]),
                             rtol=2e-4, atol=2e-4)


def test_agg_only_variant_matches_unfused():
  """include_edge_matmul=False + write_edges=False (the grid2mesh encoder
  variant): edge rows already hold embed(feats) @ We + b0."""
  summer, _, senders, receivers, e_pad, x, p = make_setup(seed=4)
  step = pallas_edge.FusedEdgeStep(
      summer, interpret=True, include_edge_matmul=False, write_edges=False)

  # Original-order edge latents recovered from the padded layout.
  valid = summer.layout_index < summer.num_edges
  e_orig = jnp.zeros((summer.num_edges, e_pad.shape[-1]), e_pad.dtype)
  e_orig = e_orig.at[summer.layout_index[valid]].set(
      jnp.asarray(np.asarray(e_pad)[valid]))
  # Fold We/b0 into the edge rows (what the hoisted const contains).
  const_orig = e_orig @ p["we"] + p["b0"][None]
  const_pad = jnp.asarray(summer.pad_edges(np.asarray(const_orig)))

  gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
  gr_pad = step.pad_nodes(x @ p["wr"])
  agg = step(const_pad, gs, gr_pad, None, None, p["w1"], p["b1"],
             p["scale"], p["offset"])

  _, want_agg = unfused_reference(summer, senders, receivers, e_orig, x, p)
  np.testing.assert_allclose(np.asarray(agg), np.asarray(want_agg),
                             rtol=2e-4, atol=2e-4)

  # Gradients flow (custom VJP recompute).
  def loss(c, x):
    gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
    gr = step.pad_nodes(x @ p["wr"])
    return jnp.sum(step(c, gs, gr, None, None, p["w1"], p["b1"],
                        p["scale"], p["offset"]) ** 2)
  g = jax.grad(loss, argnums=(0, 1))(const_pad, x)
  assert all(np.isfinite(np.asarray(t)).all() for t in g)
  assert float(jnp.abs(g[1]).max()) > 0


def test_model_fused_encoder_matches_plain_batch1_and_batch2():
  """GraphCast with the fused grid2mesh encoder (batch 1) and the padded
  general path (batch 2) must match the plain model."""
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
      resolution=20.0, mesh_size=2, latent_size=16, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  rng = jax.random.PRNGKey(0)
  for batch in (1, 2):
    inputs, targets, forcings = synthetic.make_example_batch(
        task, resolution=20.0, batch=batch)
    m_plain = GraphCast(model, task, cache_dir="", fused_aggregation=False)
    m_fused = GraphCast(model, task, cache_dir="", fused_aggregation=True)
    params = m_plain.init(rng, inputs, targets, forcings)
    learned, _ = train.partition_params(params)
    params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
    if m_fused._g2m_fused is None:
      pytest.skip("tiny grid left an empty mesh-node block")
    out_plain = m_plain(params, rng, inputs, targets, forcings)
    out_fused = m_fused(params_fused, rng, inputs, targets, forcings)
    for n in targets.var_names:
      np.testing.assert_allclose(
          np.asarray(out_fused.data(n)), np.asarray(out_plain.data(n)),
          rtol=5e-4, atol=5e-4, err_msg=f"batch={batch} var={n}")


def _cotangents(step, summer, senders, e_pad, x, p, seed=7):
  gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
  gr_pad = step.pad_nodes(x @ p["wr"])
  args = (e_pad, gs, gr_pad, p["we"], p["b0"], p["w1"], p["b1"],
          p["scale"], p["offset"])
  rng = np.random.RandomState(seed)
  d_eout = jnp.asarray(rng.randn(*e_pad.shape).astype(np.float32))
  d_agg = jnp.asarray(
      rng.randn(summer.num_nodes, e_pad.shape[1]).astype(np.float32))
  _, vjp = jax.vjp(lambda *a: step(*a), *args)
  if step.write_edges:
    return vjp((d_eout, d_agg))
  return vjp(d_agg)


@pytest.mark.parametrize("bwd_split", [1, 2])
def test_fused_backward_kernel_matches_recompute(bwd_split):
  """Every cotangent (edges, gathered senders, receiver blocks, all params)
  from the fused backward kernel must match the unfused XLA recompute."""
  summer, _, senders, receivers, e_pad, x, p = make_setup(seed=1)
  step_k = pallas_edge.FusedEdgeStep(summer, interpret=True,
                                     fused_backward=True,
                                     bwd_split=bwd_split)
  step_r = pallas_edge.FusedEdgeStep(summer, interpret=True,
                                     fused_backward=False)
  gk = _cotangents(step_k, summer, senders, e_pad, x, p)
  gr = _cotangents(step_r, summer, senders, e_pad, x, p)
  names = ["de", "dgs", "dgr", "dwe", "db0", "dw1", "db1", "dscale", "doff"]
  for n, a, b in zip(names, gk, gr):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4, err_msg=n)


def test_fused_backward_kernel_agg_only():
  """include_edge_matmul=False + write_edges=False (grid2mesh encoder
  variant) through the backward kernel vs recompute."""
  summer, _, senders, receivers, e_pad, x, p = make_setup(seed=4)
  kw = dict(interpret=True, include_edge_matmul=False, write_edges=False)
  step_k = pallas_edge.FusedEdgeStep(summer, fused_backward=True, **kw)
  step_r = pallas_edge.FusedEdgeStep(summer, fused_backward=False, **kw)
  gk = _cotangents(step_k, summer, senders, e_pad, x, p)
  gr = _cotangents(step_r, summer, senders, e_pad, x, p)
  names = ["de", "dgs", "dgr", "dwe", "db0", "dw1", "db1", "dscale", "doff"]
  for n, a, b in zip(names, gk, gr):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4, err_msg=n)


def test_processor_fused_training_grads_match_plain():
  """fused_aggregation="processor" (fused fwd+bwd kernels for the mesh
  processor, chunked/XLA everything else — the training config) must give
  the same loss and learned-param gradients as the plain XLA path."""
  from graphcast_tpu import train
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models.graphcast import GraphCast
  from tests.test_graphcast_model import TINY_MODEL, TINY_TASK

  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=1)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=False)
  m_fused = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation="processor")
  params = m_plain.init(rng, inputs, targets, forcings)
  learned, statics_plain = train.partition_params(params)
  params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
  _, statics_fused = train.partition_params(params_fused)
  # "processor" must NOT engage the fused encode/decode.
  assert m_fused._g2m_fused is None and m_fused._m2g_decoder is None
  assert m_fused._mesh_gnn.fused_edge_steps is not None

  def loss_of(model, statics):
    def fn(lp):
      loss, _ = model.loss({**lp, **statics}, rng, inputs, targets, forcings)
      return jnp.mean(loss)  # loss is [batch]
    return fn

  l_plain, g_plain = jax.value_and_grad(loss_of(m_plain, statics_plain))(
      learned)
  l_fused, g_fused = jax.value_and_grad(loss_of(m_fused, statics_fused))(
      learned)
  np.testing.assert_allclose(float(l_fused), float(l_plain), rtol=1e-4)
  flat_p = dict(jax.tree_util.tree_flatten_with_path(g_plain)[0])
  flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fused)[0])
  assert flat_p.keys() == flat_f.keys()
  for k in flat_p:
    np.testing.assert_allclose(
        np.asarray(flat_f[k]), np.asarray(flat_p[k]),
        rtol=5e-4, atol=5e-4, err_msg=str(k))


def test_full_fused_training_grads_match_plain():
  """fused_aggregation=True (fused encoder + processor + decoder, ALL with
  fused backward kernels — the fully-fused training config) must give the
  same loss and learned-param gradients as the plain XLA path."""
  from graphcast_tpu import train
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models.graphcast import GraphCast
  from tests.test_graphcast_model import TINY_MODEL, TINY_TASK

  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=1, num_target_times=1)
  rng = jax.random.PRNGKey(0)
  m_plain = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=False)
  m_fused = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="",
                      fused_aggregation=True)
  params = m_plain.init(rng, inputs, targets, forcings)
  learned, statics_plain = train.partition_params(params)
  params_fused = m_fused.attach_graph_statics(dict(learned), inputs)
  _, statics_fused = train.partition_params(params_fused)
  assert m_fused._m2g_decoder is not None
  assert m_fused._m2g_decoder.fused_backward

  def loss_of(model, statics):
    def fn(lp):
      loss, _ = model.loss({**lp, **statics}, rng, inputs, targets, forcings)
      return jnp.mean(loss)  # loss is [batch]
    return fn

  l_plain, g_plain = jax.value_and_grad(loss_of(m_plain, statics_plain))(
      learned)
  l_fused, g_fused = jax.value_and_grad(loss_of(m_fused, statics_fused))(
      learned)
  np.testing.assert_allclose(float(l_fused), float(l_plain), rtol=1e-4)
  flat_p = dict(jax.tree_util.tree_flatten_with_path(g_plain)[0])
  flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fused)[0])
  assert flat_p.keys() == flat_f.keys()
  for k in flat_p:
    np.testing.assert_allclose(
        np.asarray(flat_f[k]), np.asarray(flat_p[k]),
        rtol=5e-4, atol=5e-4, err_msg=str(k))


def _embed_setup(seed, f=32):
  """make_setup plus raw [E, f] edge features and embed-MLP weights."""
  summer, _, senders, receivers, e_pad, x, p = make_setup(seed=seed)
  c = e_pad.shape[-1]
  rng = np.random.RandomState(seed + 100)
  raw = rng.randn(summer.num_edges, f).astype(np.float32)
  raw_pad = jnp.asarray(summer.pad_edges(raw))
  ew = (jnp.asarray(rng.randn(f, c).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(c).astype(np.float32) * 0.1))
  return summer, senders, receivers, raw, raw_pad, ew, x, p


def _embed_reference_latents(raw, ew):
  """The in-kernel embed chain in plain ops: MLP + parameter-free LN."""
  ew0, eb0, ew1, eb1 = ew
  x0 = raw @ ew0 + eb0[None]
  hh = x0 * jax.nn.sigmoid(x0)
  y0 = hh @ ew1 + eb1[None]
  mean = jnp.mean(y0, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(y0 - mean), axis=-1, keepdims=True)
  return (y0 - mean) * jax.lax.rsqrt(var + pallas_edge.LN_EPS)


@pytest.mark.parametrize("write_edges", [False, True])
def test_fused_edge_step_embed_matches_unfused(write_edges):
  """embed_weights mode (raw features in, embed MLP + parameter-free LN
  in-kernel) must match embedding outside then running the plain step."""
  summer, senders, receivers, raw, raw_pad, ew, x, p = _embed_setup(seed=6)
  step = pallas_edge.FusedEdgeStep(summer, interpret=True,
                                   write_edges=write_edges)
  gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
  gr_pad = step.pad_nodes(x @ p["wr"])
  out = step(raw_pad, gs, gr_pad, p["we"], p["b0"], p["w1"], p["b1"],
             p["scale"], p["offset"], embed_weights=ew)

  e_orig = _embed_reference_latents(jnp.asarray(raw), ew)
  want_eout, want_agg = unfused_reference(
      summer, senders, receivers, e_orig, x, p)
  if write_edges:
    eout_pad, agg = out
    valid = summer.layout_index < summer.num_edges
    idx = summer.layout_index[valid]
    np.testing.assert_allclose(np.asarray(eout_pad)[valid],
                               np.asarray(want_eout)[idx],
                               rtol=2e-4, atol=2e-4)
  else:
    agg = out
  np.testing.assert_allclose(np.asarray(agg), np.asarray(want_agg),
                             rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("write_edges", [False, True])
def test_fused_backward_kernel_embed(write_edges):
  """embed_weights mode through the fused backward kernel: every cotangent
  (raw features, senders, receiver blocks, step params AND the embed MLP's
  dew0/deb0/dew1/deb1) must match the unfused XLA recompute."""
  summer, senders, receivers, raw, raw_pad, ew, x, p = _embed_setup(seed=8)

  def cots(step):
    gs = (x @ p["ws"])[jnp.asarray(summer.pad_edges(senders))]
    gr_pad = step.pad_nodes(x @ p["wr"])
    fn = lambda e, g, gr, we, b0, w1, b1, sc, off, emb: step(
        e, g, gr, we, b0, w1, b1, sc, off, embed_weights=emb)
    out, vjp = jax.vjp(fn, raw_pad, gs, gr_pad, p["we"], p["b0"], p["w1"],
                       p["b1"], p["scale"], p["offset"], ew)
    rng = np.random.RandomState(9)
    if write_edges:
      eout, agg = out
      d = (jnp.asarray(rng.randn(*eout.shape).astype(np.float32)),
           jnp.asarray(rng.randn(*agg.shape).astype(np.float32)))
    else:
      d = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    return vjp(d)

  kw = dict(interpret=True, write_edges=write_edges)
  gk = cots(pallas_edge.FusedEdgeStep(summer, fused_backward=True, **kw))
  gr = cots(pallas_edge.FusedEdgeStep(summer, fused_backward=False, **kw))
  names = ["draw", "dgs", "dgr", "dwe", "db0", "dw1", "db1", "dscale",
           "doff", "dembed"]
  for n, a, b in zip(names, gk, gr):
    for i, (ai, bi) in enumerate(zip(jax.tree_util.tree_leaves(a),
                                     jax.tree_util.tree_leaves(b))):
      np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                 rtol=3e-4, atol=3e-4,
                                 err_msg=f"{n}[{i}]")


def test_mxu_ln_stats_matches_vpu():
  """ln_stats="mxu" (ones-matmul LayerNorm statistics) must match the
  default VPU-reduction statistics in forward AND through the fused
  backward kernel."""
  summer, step_v, senders, receivers, e_pad, x, p = make_setup(seed=5)
  step_m = pallas_edge.FusedEdgeStep(summer, interpret=True, ln_stats="mxu")
  assert step_v.ln_stats == "vpu"

  eout_v, agg_v = run_fused(step_v, senders, e_pad, x, p)
  eout_m, agg_m = run_fused(step_m, senders, e_pad, x, p)
  np.testing.assert_allclose(np.asarray(eout_m), np.asarray(eout_v),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(agg_m), np.asarray(agg_v),
                             rtol=2e-4, atol=2e-4)

  gm = _cotangents(step_m, summer, senders, e_pad, x, p)
  gv = _cotangents(step_v, summer, senders, e_pad, x, p)
  names = ["de", "dgs", "dgr", "dwe", "db0", "dw1", "db1", "dscale", "doff"]
  for n, a, b in zip(names, gm, gv):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4, err_msg=n)


def test_empty_block_rejected():
  receivers = np.sort(np.concatenate(
      [np.zeros(50, np.int32), np.full(50, 99, np.int32)]))
  summer = pallas_mp.BlockedSegmentSum(receivers, 100, block_nodes=25,
                                       chunk_edges=32, interpret=True,
                                       padded_input=True)
  with pytest.raises(ValueError):
    pallas_edge.FusedEdgeStep(summer, interpret=True)


def test_pipelined_forward_matches_plain():
  """The software-pipelined forward (measured-dead lever, default off;
  GC_PIPELINED_EDGE=1 re-enables) must stay bit-equivalent to the plain
  kernel: same ops, same dtypes, one grid step later."""
  summer, step, senders, receivers, e_pad, x, p = make_setup(seed=3)
  step_pipe = pallas_edge.FusedEdgeStep(summer, interpret=True,
                                        pipelined=True)
  assert not step.pipelined and step_pipe.pipelined
  eout_a, agg_a = run_fused(step, senders, e_pad, x, p)
  eout_b, agg_b = run_fused(step_pipe, senders, e_pad, x, p)
  np.testing.assert_array_equal(np.asarray(eout_a), np.asarray(eout_b))
  np.testing.assert_array_equal(np.asarray(agg_a), np.asarray(agg_b))
