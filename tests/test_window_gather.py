"""Windowed two-stage gather + node_order-permuted layouts.

Covers round-5's g2m encoder gather redesign:
- ops/window_gather.plan_windowed_gather / WindowedGatherPlan: exact row
  equality vs the flat gather, bucket structure invariants, and the
  scattered-layout bailout;
- BlockedSegmentSum(node_order=...): outputs/grads identical to the
  unpermuted summer (the permutation is internal to the layout);
- FusedEdgeStep over a permuted summer: agg + grads match the unpermuted
  step (reference semantics unchanged: typed_graph_net.py:130-184).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.ops import pallas_mp, window_gather
from graphcast_tpu.ops.pallas_edge import FusedEdgeStep


def _local_layout(rng, L, G, jitter=40):
  """Senders that drift through the table (window-local layout)."""
  centers = np.linspace(0, G - 1, L)
  s = np.clip(centers + rng.randint(-jitter, jitter + 1, L), 0,
              G - 1).astype(np.int64)
  return s


@pytest.mark.parametrize("L,G,se", [
    (3000, 2000, 512),
    (512, 64, 512),       # single superchunk, window = whole table
    (4096, 4096, 1024),
])
def test_windowed_gather_matches_flat(L, G, se):
  rng = np.random.RandomState(0)
  senders = _local_layout(rng, L, G)
  valid = rng.rand(L) > 0.1
  plan = window_gather.plan_windowed_gather(
      senders, valid, G, superchunk_edges=se, num_buckets=3,
      width_align=64, max_expansion=None)
  table = jnp.asarray(rng.randn(G, 128), jnp.float32)
  got = plan(table, jnp.asarray(plan.base), jnp.asarray(plan.local))
  assert got.shape == (L, 128)
  want = np.asarray(table)[senders]
  np.testing.assert_array_equal(np.asarray(got)[valid], want[valid])


def test_plan_invariants_and_buckets():
  rng = np.random.RandomState(1)
  L, G = 8192, 6000
  senders = _local_layout(rng, L, G, jitter=100)
  valid = np.ones(L, bool)
  plan = window_gather.plan_windowed_gather(
      senders, valid, G, superchunk_edges=512, num_buckets=4,
      width_align=64, max_expansion=None)
  ns = plan.num_superchunks
  # Buckets tile [0, ns) contiguously.
  assert plan.buckets[0][0] == 0 and plan.buckets[-1][1] == ns
  for (a, b, w), (a2, b2, w2) in zip(plan.buckets, plan.buckets[1:]):
    assert b == a2
  # Every local index stays inside its bucket's window and windows stay
  # inside the table.
  for s0, s1, w in plan.buckets:
    assert w % 64 == 0 or w == G
    for s in range(s0, s1):
      assert 0 <= plan.base[s] <= G - w
      assert plan.local[s].min() >= 0 and plan.local[s].max() < w
  # The bucketed window traffic beats a single global-width plan.
  single = window_gather.plan_windowed_gather(
      senders, valid, G, superchunk_edges=512, num_buckets=1,
      width_align=64, max_expansion=None)
  assert plan.window_rows_total <= single.window_rows_total


def test_scattered_layout_bails_out():
  rng = np.random.RandomState(2)
  L, G = 4096, 100000
  senders = rng.randint(0, G, L).astype(np.int64)  # no locality
  plan = window_gather.plan_windowed_gather(
      senders, np.ones(L, bool), G, superchunk_edges=512,
      num_buckets=4, max_expansion=2.5)
  assert plan is None


def test_out_of_range_senders_raise():
  with pytest.raises(ValueError, match="out of range"):
    window_gather.plan_windowed_gather(
        np.array([0, 5, 10]), np.ones(3, bool), 10, superchunk_edges=512)


def test_padding_slots_are_ignored_in_spans():
  """Padding slots may carry arbitrary ids without widening windows."""
  rng = np.random.RandomState(3)
  L, G = 2048, 4096
  senders = _local_layout(rng, L, G)
  valid = np.ones(L, bool)
  valid[100:200] = False
  senders2 = senders.copy()
  senders2[100:200] = 0  # far from the local window of later superchunks
  p1 = window_gather.plan_windowed_gather(
      senders, valid, G, superchunk_edges=256, max_expansion=None)
  p2 = window_gather.plan_windowed_gather(
      senders2, valid, G, superchunk_edges=256, max_expansion=None)
  assert [b[2] for b in p1.buckets] == [b[2] for b in p2.buckets]


# --- node_order permuted layouts ---


def _random_graph(rng, n, e):
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  order = rng.permutation(n).astype(np.int32)
  return receivers, order


@pytest.mark.parametrize("padded", [False, True])
def test_node_order_summer_matches_unpermuted(padded):
  rng = np.random.RandomState(4)
  n, e, c = 100, 700, 128
  receivers, order = _random_graph(rng, n, e)
  base = pallas_mp.BlockedSegmentSum(
      receivers, n, block_nodes=64, chunk_edges=128, interpret=True,
      padded_input=padded)
  perm = pallas_mp.BlockedSegmentSum(
      receivers, n, block_nodes=64, chunk_edges=128, interpret=True,
      padded_input=padded, node_order=order)
  # Layout maps original edges and original receiver ids consistently.
  valid = perm.layout_index < e
  np.testing.assert_array_equal(
      perm.padded_receivers[valid],
      receivers[perm.layout_index[valid]])

  messages = jnp.asarray(rng.randn(e, c), jnp.float32)
  if padded:
    got = perm(jnp.asarray(perm.pad_edges(np.asarray(messages))))
    want = base(jnp.asarray(base.pad_edges(np.asarray(messages))))
  else:
    got = perm(messages)
    want = base(messages)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-6)

  # Grads through both layouts match on the ORIGINAL edge list.
  w = jnp.asarray(rng.randn(n, c), jnp.float32)
  if padded:
    def grads_in_original_order(summer):
      # pad_edges is host-side; differentiate w.r.t. the padded array and
      # map the per-slot grads back to original edge order.
      padded_m = jnp.asarray(summer.pad_edges(np.asarray(messages)))
      g = jax.grad(lambda m: jnp.sum(summer(m) * w))(padded_m)
      valid_slots = summer.layout_index < e
      out = np.zeros((e, c), np.float32)
      out[summer.layout_index[valid_slots]] = np.asarray(g)[valid_slots]
      return out
    np.testing.assert_allclose(grads_in_original_order(perm),
                               grads_in_original_order(base),
                               rtol=1e-6, atol=1e-6)
  else:
    g_got = jax.grad(lambda m: jnp.sum(perm(m) * w))(messages)
    g_want = jax.grad(lambda m: jnp.sum(base(m) * w))(messages)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-6, atol=1e-6)


def test_node_order_fused_edge_step_matches():
  """FusedEdgeStep over a permuted summer == unpermuted, fwd + grads."""
  rng = np.random.RandomState(5)
  n, e, c = 96, 800, 128
  receivers, order = _random_graph(rng, n, e)
  summers = {
      "base": pallas_mp.BlockedSegmentSum(
          receivers, n, block_nodes=32, chunk_edges=64, interpret=True,
          padded_input=True),
      "perm": pallas_mp.BlockedSegmentSum(
          receivers, n, block_nodes=32, chunk_edges=64, interpret=True,
          padded_input=True, node_order=order),
  }
  e_feat = rng.randn(e, c).astype(np.float32)
  nodes = jnp.asarray(rng.randn(n, c), np.float32)
  w1 = jnp.asarray(rng.randn(c, c) * 0.1, np.float32)
  b1 = jnp.asarray(rng.randn(c) * 0.1, np.float32)
  scale = jnp.asarray(rng.randn(c) * 0.1 + 1.0, np.float32)
  off = jnp.asarray(rng.randn(c) * 0.1, np.float32)
  d_agg = jnp.asarray(rng.randn(n, c), np.float32)

  outs = {}
  grads = {}
  for name, s in summers.items():
    step = FusedEdgeStep(s, include_edge_matmul=False, write_edges=False,
                         interpret=True)
    e_pad = jnp.asarray(s.pad_edges(e_feat))
    def run(nodes_in, e_pad_in, s=s, step=step):
      gr_pad = step.pad_nodes(nodes_in)
      zero_gs = jnp.zeros_like(e_pad_in)
      return step(e_pad_in, zero_gs, gr_pad, None, None, w1, b1, scale, off)
    agg = run(nodes, e_pad)
    outs[name] = np.asarray(agg)
    g = jax.grad(lambda nn_, ep: jnp.sum(run(nn_, ep) * d_agg),
                 argnums=0)(nodes, e_pad)
    grads[name] = np.asarray(g)
  np.testing.assert_allclose(outs["perm"], outs["base"],
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(grads["perm"], grads["base"],
                             rtol=1e-5, atol=1e-5)
