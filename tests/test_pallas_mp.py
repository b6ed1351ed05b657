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
