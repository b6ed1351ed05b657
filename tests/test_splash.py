"""Validates the Pallas block-sparse attention kernel against dense MHA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from graphcast_tpu.ops import splash


def make_banded_mask(n, bandwidth, seed=0):
  """Random banded-ish sparse mask with self edges (like RCM-permuted k-hop)."""
  rng = np.random.RandomState(seed)
  rows, cols = [], []
  for i in range(n):
    lo, hi = max(0, i - bandwidth), min(n, i + bandwidth + 1)
    for j in range(lo, hi):
      if i == j or rng.rand() < 0.6:
        rows.append(i)
        cols.append(j)
  mask = sp.csr_matrix((np.ones(len(rows), bool), (rows, cols)),
                       shape=(n, n))
  return mask


@pytest.mark.parametrize("n,bandwidth,bq,bkv", [
    (512, 40, 128, 128),
    (520, 64, 128, 128),   # n not a multiple of block size → padding path
])
def test_forward_matches_dense(n, bandwidth, bq, bkv):
  mask = make_banded_mask(n, bandwidth)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=bq, block_kv=bkv,
                                               interpret=True)
  assert attn.fraction_visited < 1.0
  rng = jax.random.PRNGKey(0)
  kq, kk, kv_ = jax.random.split(rng, 3)
  shape = (2, n, 2, 128)  # batch=2, heads=2, head_dim=128
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)

  got = attn(q, k, v)
  want = splash.reference_masked_attention(
      q, k, v, jnp.asarray(mask.toarray()))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)


def test_head_fold_sizes_match(monkeypatch):
  """The head-folded forward (hb batch·head slices per grid step, one mask
  unpack per block pair) must equal the unfolded kernel for every fold."""
  n, bandwidth = 256, 32
  mask = make_banded_mask(n, bandwidth, seed=2)
  rng = jax.random.PRNGKey(3)
  kq, kk, kv_ = jax.random.split(rng, 3)
  shape = (2, n, 4, 128)  # bh = 8
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)
  outs, grads = [], []
  for hb in (1, 2, 4, 8):
    monkeypatch.setenv("SPLASH_HB", str(hb))
    attn = splash.BlockSparseAttention.from_mask(
        mask, block_q=128, block_kv=128, interpret=True)
    outs.append(np.asarray(attn(q, k, v)))
    loss = lambda q, k, v: jnp.sum(jnp.sin(attn(q, k, v)))
    grads.append(jax.grad(loss, argnums=(0, 1, 2))(q, k, v))
  for o, g in zip(outs[1:], grads[1:]):
    np.testing.assert_allclose(o, outs[0], rtol=1e-6, atol=1e-6)
    for a, b, name in zip(g, grads[0], "qkv"):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-5, atol=1e-5,
                                 err_msg=f"d{name} fold mismatch")
  monkeypatch.setenv("SPLASH_HB", "3")  # does not divide bh=8
  with pytest.raises(ValueError, match="must divide"):
    splash.BlockSparseAttention.from_mask(
        mask, block_q=128, block_kv=128, interpret=True)(q, k, v)
  # Auto fold at the GenCast shape (bh=4, 512² tiles, d=128) is 4.
  monkeypatch.delenv("SPLASH_HB")
  assert splash._head_block(4, 512, 512, 128) == 4


def test_gradients_match_dense():
  n, bandwidth = 256, 32
  mask = make_banded_mask(n, bandwidth, seed=1)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=128,
                                               block_kv=128, interpret=True)
  rng = jax.random.PRNGKey(1)
  kq, kk, kv_, kt = jax.random.split(rng, 4)
  shape = (1, n, 1, 128)
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)
  target = jax.random.normal(kt, shape, jnp.float32)

  def loss_splash(q, k, v):
    return jnp.sum((attn(q, k, v) - target) ** 2)

  def loss_dense(q, k, v):
    out = splash.reference_masked_attention(q, k, v,
                                            jnp.asarray(mask.toarray()))
    return jnp.sum((out - target) ** 2)

  g_splash = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
  g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for gs, gd, name in zip(g_splash, g_dense, "qkv"):
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=2e-3, atol=2e-3,
                               err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("bq_dkv,bkv_dkv", [(256, 128), (128, 256)])
def test_independent_backward_block_sizes(bq_dkv, bkv_dkv):
  """block_q_dkv/block_kv_dkv tile the backward kernels on their own block
  map (incl. different padding); grads must still match dense."""
  n, bandwidth = 300, 32  # n not a multiple of either block size
  mask = make_banded_mask(n, bandwidth, seed=2)
  attn = splash.BlockSparseAttention.from_mask(
      mask, block_q=128, block_kv=128,
      block_q_dkv=bq_dkv, block_kv_dkv=bkv_dkv, interpret=True)
  assert attn._bwd_map is not attn._map  # second map actually built
  rng = jax.random.PRNGKey(3)
  kq, kk, kv_, kt = jax.random.split(rng, 4)
  shape = (1, n, 1, 128)
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)
  target = jax.random.normal(kt, shape, jnp.float32)

  def loss_splash(q, k, v):
    return jnp.sum((attn(q, k, v) - target) ** 2)

  def loss_dense(q, k, v):
    out = splash.reference_masked_attention(q, k, v,
                                            jnp.asarray(mask.toarray()))
    return jnp.sum((out - target) ** 2)

  g_splash = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
  g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
  for gs, gd, name in zip(g_splash, g_dense, "qkv"):
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=2e-3, atol=2e-3,
                               err_msg=f"d{name} mismatch")


def test_bf16_path():
  n = 256
  mask = make_banded_mask(n, 48, seed=2)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=128,
                                               block_kv=128, interpret=True)
  rng = jax.random.PRNGKey(2)
  shape = (1, n, 2, 128)
  q = jax.random.normal(rng, shape, jnp.bfloat16)
  k = jax.random.normal(rng, shape, jnp.bfloat16)
  v = jax.random.normal(rng, shape, jnp.bfloat16)
  got = attn(q, k, v)
  assert got.dtype == jnp.bfloat16
  want = splash.reference_masked_attention(
      q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
      jnp.asarray(mask.toarray()))
  np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                             rtol=0.05, atol=0.05)


def test_block_map_matches_dense_construction():
  """The sparse-native _build_block_map (no mask.toarray densify — O(nnz)
  host memory, required beyond mesh-6) must reproduce the dense-derived
  block structure exactly, including padding, the full-block fast path
  (mask_rows == 0 ⇔ every entry unmasked), and both map orientations
  sharing one compact bitmap table."""
  n, bq, bkv = 520, 64, 64   # non-multiple n → padded tail blocks
  mask = make_banded_mask(n, 48, seed=3)
  # Force some FULL blocks: a dense square aligned to the block grid.
  dense_patch = sp.csr_matrix(np.ones((128, 128), dtype=bool))
  mask = mask.tolil()
  mask[128:256, 128:256] = dense_patch
  mask = mask.tocsr()
  got = splash._build_block_map(mask, bq, bkv)

  nq, nkv = -(-n // bq), -(-n // bkv)
  dense = np.zeros((nq * bq, nkv * bkv), dtype=bool)
  dense[:n, :n] = mask.toarray()
  blocks = dense.reshape(nq, bq, nkv, bkv).transpose(0, 2, 1, 3)
  active = blocks.any(axis=(2, 3))
  full = blocks.all(axis=(2, 3))
  assert full.any(), "test mask must contain full blocks"
  assert (active & ~full).any(), "test mask must contain partial blocks"

  def check_block(i, j, row):
    if full[i, j]:
      assert row == 0, (i, j)
    else:
      assert row > 0, (i, j)
      np.testing.assert_array_equal(
          got["mask_blocks"][row],
          splash._pack_mask_bits_rows(blocks[i, j], bq))

  kv_lists = [np.nonzero(active[i])[0] for i in range(nq)]
  ma = max(len(l) for l in kv_lists)
  assert got["ma"] == ma and got["nq"] == nq and got["nkv"] == nkv
  for i, lst in enumerate(kv_lists):
    assert got["kv_count"][i] == len(lst)
    np.testing.assert_array_equal(got["kv_index"][i, :len(lst)], lst)
    assert not got["kv_index"][i, len(lst):].any()
    assert not got["mask_rows"][i, len(lst):].any()   # padded slots → row 0
    for s, j in enumerate(lst):
      check_block(i, j, got["mask_rows"][i, s])

  q_lists = [np.nonzero(active[:, j])[0] for j in range(nkv)]
  mat = max(len(l) for l in q_lists)
  assert got["mat"] == mat
  assert got["mask_blocks_t"] is got["mask_blocks"]   # shared compact table
  for j, lst in enumerate(q_lists):
    assert got["q_count"][j] == len(lst)
    np.testing.assert_array_equal(got["q_index"][j, :len(lst)], lst)
    for s, i in enumerate(lst):
      check_block(i, j, got["mask_rows_t"][j, s])

  # Compactness: exactly one table row per partial block, plus the dummy.
  n_partial = int((active & ~full).sum())
  assert got["mask_blocks"].shape == (1 + n_partial, bq // 32, bkv)
  assert (got["mask_blocks"][0] == np.uint32(0xFFFFFFFF)).all()


def test_full_block_fast_path_matches_dense():
  """A mask with fully-unmasked interior blocks must take the row-0 fast
  path and still match dense attention exactly — forward and grads."""
  n = 256
  dense_mask = np.zeros((n, n), dtype=bool)
  dense_mask[:128, :128] = True                     # 4 full 64x64 blocks...
  rng_np = np.random.RandomState(7)
  dense_mask[128:, :] = rng_np.rand(128, n) < 0.3   # ...plus partial ones
  np.fill_diagonal(dense_mask, True)
  mask = sp.csr_matrix(dense_mask)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=64,
                                               block_kv=64, interpret=True)
  assert (attn._map["mask_rows"] == 0).any()
  assert (attn._map["mask_rows"] > 0).any()

  rng = jax.random.PRNGKey(9)
  kq, kk, kv_, kt = jax.random.split(rng, 4)
  shape = (1, n, 2, 128)
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)
  target = jax.random.normal(kt, shape, jnp.float32)

  got = attn(q, k, v)
  want = splash.reference_masked_attention(q, k, v, jnp.asarray(dense_mask))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)

  def loss(fn):
    return lambda q, k, v: jnp.sum((fn(q, k, v) - target) ** 2)

  dense_fn = lambda q, k, v: splash.reference_masked_attention(
      q, k, v, jnp.asarray(dense_mask))
  g_splash = jax.grad(loss(attn), argnums=(0, 1, 2))(q, k, v)
  g_dense = jax.grad(loss(dense_fn), argnums=(0, 1, 2))(q, k, v)
  for gs, gd, name in zip(g_splash, g_dense, "qkv"):
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=2e-3, atol=2e-3,
                               err_msg=f"d{name} mismatch")


def test_block_map_sparsity():
  mask = make_banded_mask(1024, 64)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=128,
                                               block_kv=128)
  # Bandwidth 64, blocks 128 → ≤ 3 active kv blocks per q block of 8 total.
  assert attn.fraction_visited <= 3 / 8 + 1e-6


def _np_unpack_rows(packed, rows, group):
  """Numpy inverse of splash._pack_mask_bits_rows (row r of a group lives
  at word r % gw, bit r // gw)."""
  gw = group // 32
  lead, C = packed.shape[:-2], packed.shape[-1]
  p = packed.reshape(*lead, rows // group, 1, gw, C)
  b = np.arange(32, dtype=np.uint32).reshape(1, 32, 1, 1)
  bits = (p >> b) & 1                     # [..., ng, 32, gw, C]
  return bits.reshape(*lead, rows, C).astype(bool)


def test_mask_row_group_divides_rows():
  """The row group must divide rows (pack contract) AND rows//2 (so the
  fused-edge backward can slice sub-chunks) for every 64-multiple —
  regression: 640 used to return 256, which divides neither."""
  for rows in range(64, 1344, 64):
    g = splash.mask_row_group(rows)
    assert g % 32 == 0 and g <= 256, (rows, g)
    assert rows % g == 0 and (rows // 2) % g == 0, (rows, g)
  # Power-of-two values unchanged from the original min(256, rows//2).
  assert [splash.mask_row_group(r) for r in (64, 128, 256, 512, 1024)] == \
      [32, 64, 128, 256, 256]
  # Non-64-multiples pack as one whole group.
  assert splash.mask_row_group(96) == 96


@pytest.mark.parametrize("rows", [64, 96, 128, 512, 576, 640, 704])
def test_pack_mask_bits_rows_roundtrip(rows):
  rng = np.random.RandomState(rows)
  mask = rng.rand(3, rows, 64) > 0.5
  g = splash.mask_row_group(rows)
  packed = splash._pack_mask_bits_rows(mask, g)
  assert packed.shape == (3, rows // 32, 64) and packed.dtype == np.uint32
  np.testing.assert_array_equal(_np_unpack_rows(packed, rows, g), mask)


def test_blocked_segment_sum_chunk_640():
  """chunk_edges=640 (a 64-multiple that is not a power of two) must build
  packed masks and aggregate correctly — regression for mask_row_group."""
  from graphcast_tpu.ops import pallas_mp
  rng = np.random.RandomState(0)
  n, e = 300, 2000
  receivers = np.sort(rng.randint(0, n, size=e).astype(np.int32))
  agg = pallas_mp.BlockedSegmentSum(receivers, n, block_nodes=64,
                                    chunk_edges=640, interpret=True)
  mask, mask_t = agg.onehot_masks()
  assert mask_t.shape[1] == 640 // 32
  msgs = rng.randn(e, 128).astype(np.float32)
  out = np.asarray(agg(jnp.asarray(msgs)))
  want = np.zeros((n, 128), np.float32)
  np.add.at(want, receivers, msgs)
  np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-4)


def test_sequence_parallel_matches_single_device():
  """q_seq sharding over an 8-device mesh: forward and grads must equal the
  single-device kernel (k/v cotangents psum-reduced across shards)."""
  from graphcast_tpu.parallel import sharding as sharding_lib

  n, bandwidth = 512, 48
  mask = make_banded_mask(n, bandwidth, seed=4)
  attn = splash.BlockSparseAttention.from_mask(mask, block_q=64,
                                               block_kv=64, interpret=True)
  mesh = sharding_lib.make_mesh({"sp": 8})
  sp_fn = attn.sequence_parallel(mesh, "sp")

  rng = jax.random.PRNGKey(0)
  kq, kk, kv_, kt = jax.random.split(rng, 4)
  shape = (1, n, 1, 128)
  q = jax.random.normal(kq, shape, jnp.float32)
  k = jax.random.normal(kk, shape, jnp.float32)
  v = jax.random.normal(kv_, shape, jnp.float32)
  target = jax.random.normal(kt, shape, jnp.float32)

  out_sp = jax.jit(sp_fn)(q, k, v)
  out_1 = attn(q, k, v)
  np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_1),
                             rtol=2e-4, atol=2e-4)

  def loss(fn):
    return lambda q, k, v: jnp.sum((fn(q, k, v) - target) ** 2)

  g_sp = jax.jit(jax.grad(loss(sp_fn), argnums=(0, 1, 2)))(q, k, v)
  g_1 = jax.grad(loss(attn), argnums=(0, 1, 2))(q, k, v)
  for gs, g1, name in zip(g_sp, g_1, "qkv"):
    np.testing.assert_allclose(np.asarray(gs), np.asarray(g1),
                               rtol=2e-3, atol=2e-3,
                               err_msg=f"d{name} mismatch")
