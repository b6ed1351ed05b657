"""Validates the fused one-hot aggregation kernel against segment_sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.ops import pallas_mp


@pytest.mark.parametrize("n,e,c,bn,ek", [
    (100, 600, 128, 64, 128),
    (257, 1531, 256, 128, 256),  # ragged everything
    (64, 64, 128, 64, 128),      # one edge per node-ish
])
def test_blocked_segment_sum_matches(n, e, c, bn, ek):
  rng = np.random.RandomState(0)
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=bn,
                                    chunk_edges=ek, interpret=True)
  messages = jnp.asarray(rng.randn(e, c), jnp.float32)
  got = agg(messages)
  want = jax.ops.segment_sum(messages, jnp.asarray(receivers),
                             num_segments=n, indices_are_sorted=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_skewed_degree_distribution():
  """A few nodes receive most edges (like coarse multimesh levels)."""
  rng = np.random.RandomState(1)
  n, c = 128, 128
  receivers = np.sort(np.concatenate([
      np.zeros(500, np.int32),  # node 0 gets 500 edges
      rng.randint(0, n, 200).astype(np.int32)]))
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=64,
                                    chunk_edges=128, interpret=True)
  messages = jnp.asarray(rng.randn(len(receivers), c), jnp.float32)
  got = agg(messages)
  want = jax.ops.segment_sum(messages, jnp.asarray(receivers),
                             num_segments=n, indices_are_sorted=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_bf16_messages():
  rng = np.random.RandomState(2)
  n, e, c = 128, 900, 128
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=128,
                                    chunk_edges=256, interpret=True)
  messages = jnp.asarray(rng.randn(e, c), jnp.bfloat16)
  got = agg(messages)
  assert got.dtype == jnp.bfloat16
  want = jax.ops.segment_sum(messages.astype(jnp.float32),
                             jnp.asarray(receivers), num_segments=n,
                             indices_are_sorted=True)
  np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                             rtol=0.05, atol=0.1)


@pytest.mark.parametrize("batch", [None, 2])
def test_padded_input_mode_forward_and_grad(batch):
  """padded_input=True: messages already in the chunk-aligned layout (via
  pad_edges) — kernel output and VJP must match segment_sum on the original
  edge list."""
  rng = np.random.RandomState(3)
  n, e, c = 100, 700, 128
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=64,
                                    chunk_edges=128, interpret=True,
                                    padded_input=True)
  shape = (e, c) if batch is None else (e, batch, c)
  messages = jnp.asarray(rng.randn(*shape), jnp.float32)
  padded = jnp.asarray(agg.pad_edges(np.asarray(messages)))

  got = agg(padded)
  want = jax.ops.segment_sum(messages, jnp.asarray(receivers),
                             num_segments=n, indices_are_sorted=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)

  # Gradient: d/d(padded messages) of sum(w * agg) == w[recv] on real slots,
  # 0 on padding slots.
  w = jnp.asarray(rng.randn(*got.shape), jnp.float32)
  g = jax.grad(lambda m: jnp.sum(agg(m) * w))(padded)
  valid = agg.layout_index < e
  recv = agg.padded_receivers
  want_g = np.zeros(g.shape, np.float32)
  want_g[valid] = np.asarray(w)[recv[valid]]
  np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-5, atol=1e-5)


def test_pad_edges_roundtrip_and_batch_path():
  rng = np.random.RandomState(4)
  n, e = 60, 300
  receivers = np.sort(rng.randint(0, n, e)).astype(np.int32)
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=32,
                                    chunk_edges=64, interpret=True)
  senders = rng.randint(0, n, e).astype(np.int32)
  padded_senders = agg.pad_edges(senders)
  valid = agg.layout_index < e
  np.testing.assert_array_equal(padded_senders[valid],
                                senders[agg.layout_index[valid]])
  assert (padded_senders[~valid] == 0).all()
  assert (agg.padded_receivers[~valid] == n + 1).all()

  # Non-padded 3-D batch path matches per-batch segment sums.
  messages = jnp.asarray(rng.randn(e, 3, 128), jnp.float32)
  got = agg(messages)
  for b in range(3):
    want = jax.ops.segment_sum(messages[:, b], jnp.asarray(receivers),
                               num_segments=n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got[:, b]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
