"""Block-sparse flash attention Pallas TPU kernel ("splash" equivalent).

The reference imports jax.experimental.pallas.ops.tpu.splash_attention
(sparse_transformer.py:34,244-275); here we implement our own block-sparse
attention for the RCM-banded k-hop mesh masks:

- The (static, host-side) sparse mask is compiled into a *block map*: for
  every query block, the list of key/value blocks containing any unmasked
  entry, plus per-(q,kv)-block dense bitmaps for partially-masked blocks.
  Fully-masked blocks are never visited — compute scales with the band, not
  N².
- Fully-UNMASKED blocks carry no bitmap at all: per-slot ``mask_rows``
  point into a compact bitmap table whose row 0 means "full — skip
  masking"; the kernels branch on it with ``pl.when`` and skip the VPU
  bitmap unpack + select (the upstream splash kernel's full-block
  specialization in its MaskInfo protocol). NB the GenCast k-hop-16
  masks under BFS-patch ordering have NO full blocks at any practical
  tile size (measured round 4: 0 at 512², 0.7% at 64²), so maps without
  full blocks statically compile the masked path only (``has_full``) —
  the dead branch cost ~4-7% end-to-end. The compact table (shared by
  both map orientations) still shrinks the threaded statics ~5×.
- Forward: flash-style streaming softmax (f32 accumulators in VMEM) over the
  active kv blocks of each q block; emits logsumexp for the backward pass.
- Backward: custom VJP with two Pallas kernels — dq over the q-block map,
  and dk/dv over the transposed (kv→q) block map — recomputing attention
  weights from q,k,v and the saved logsumexp (no O(N·band) attention matrix
  is ever materialized).

Layouts: q,k,v,o are [batch_heads, num_nodes, head_dim] inside the kernel
(callers reshape from [batch, nodes, heads, head_dim]); head_dim should be a
multiple of 128 to tile onto the MXU (the reference has the same constraint,
sparse_transformer.py:291).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def mask_row_group(rows: int) -> int:
  """Row-group granularity for sublane-packed masks over ``rows`` rows.

  The packing is strided per group, so a consumer may slice the packed
  words only at multiples of the group; the group must also DIVIDE the
  row count (``_pack_mask_bits_rows`` asserts it). The group is chosen as
  the largest 32-multiple ≤256 dividing rows//2, so the fused-edge
  backward can split a chunk in two (bwd_split=2 ⇒ sub-chunks of
  rows//2). For power-of-two rows this is min(256, rows//2); for other
  64-multiples (e.g. 640 → 160) it is the largest qualifying divisor.
  Rows not divisible by 64 pack as one whole group (split-1 consumers
  only)."""
  if rows % 64 == 0:
    half = rows // 2
    g = 256
    while half % g:
      g -= 32
    return g
  return rows


def _pack_mask_bits_rows(mask: np.ndarray, group_rows: int) -> np.ndarray:
  """[..., R, C] bool → [..., R//32, C] uint32, packed along ROWS.

  Words live on the sublane axis so the tiled (8, 128) device layout is
  compact: the lane-packed [R, C//32] layout pads its last dim to 128
  lanes — a 16× HBM expansion (and an XLA layout copy) for C=256 masks.

  Rows are packed strided per group of ``group_rows`` rows (row r of a
  group → word r %% gw at bit r // gw, gw = group_rows//32), matching the
  in-kernel tiled ``pltpu.repeat`` along sublanes. A consumer may slice
  the packed rows at any multiple of ``group_rows`` rows.
  """
  *lead, R, C = mask.shape
  g = group_rows
  assert g % 32 == 0 and R % g == 0, (R, g)
  gw = g // 32
  # row r (in group) = b * gw + w  ⇒  word w, bit b.
  m = mask.reshape(*lead, R // g, 32, gw, C).astype(np.uint32)
  weights = (np.uint32(1) << np.arange(32, dtype=np.uint32)).reshape(
      (1,) * len(lead) + (1, 32, 1, 1))
  packed = (m * weights).sum(axis=-3).astype(np.uint32)  # [..., R//g, gw, C]
  return packed.reshape(*lead, R // 32, C)


def _unpack_mask_rows(packed, rows, cols, group_rows):
  """In-kernel inverse of :func:`_pack_mask_bits_rows`:
  [rows//32, cols] uint32 → [rows, cols] bool."""
  g = group_rows
  gw = g // 32
  ngroups = rows // g
  parts = []
  for k in range(ngroups):
    words = pltpu.repeat(packed[k * gw:(k + 1) * gw], 32, axis=0)  # [g, cols]
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (g, cols), 0) // gw
    parts.append(((words >> shifts) & 1) > 0)
  return parts[0] if ngroups == 1 else jnp.concatenate(parts, axis=0)


def _build_block_map(mask: sp.csr_matrix, block_q: int, block_kv: int):
  """Compiles a sparse mask into q-block → active-kv-block maps.

  Returns dict with:
    kv_index:  [nq, ma]  kv-block id per slot (0-padded)
    kv_count:  [nq]      number of active slots
    mask_rows: [nq, ma]  bitmap-table row per slot; 0 = fully-unmasked
      block (or padded slot) — the kernels skip masking for it entirely
    mask_blocks: [1 + n_partial, block_q//32, block_kv] ROW-packed bitmaps,
      COMPACT: only partially-masked blocks get a row; row 0 is a reserved
      all-ones dummy (never consumed — the full branch skips the unpack)
    plus transposed maps (q_index, q_count, mask_rows_t) for dkv;
    mask_blocks_t is the SAME table (both orientations share the bitmaps).
  """
  n = mask.shape[0]
  nq = -(-n // block_q)
  nkv = -(-n // block_kv)
  n_q_pad = nq * block_q
  n_kv_pad = nkv * block_kv
  nw = block_kv // 32
  assert block_kv % 32 == 0, block_kv
  assert block_q % 32 == 0, block_q
  gw = block_q // 32

  # Sparse-native build: never densify the mask (the dense [n, n] bool is
  # ~1.7 GB at mesh-6 and O(N²) beyond — mesh-7 would need 27 GB host RAM).
  # Work directly on the nonzero coordinates: block ids, then bitpacked
  # per-block bitmaps via scatter-or.
  coo = mask.tocoo()
  keep = coo.data.astype(bool)
  rows = coo.row[keep].astype(np.int64)
  cols = coo.col[keep].astype(np.int64)

  qb = rows // block_q
  kb = cols // block_kv
  bid = qb * nkv + kb
  # Active blocks, sorted (qb, kb), with per-block nnz to detect FULL
  # blocks (every entry unmasked ⇒ no bitmap needed). Blocks straddling
  # the padded tail can never be full: padded coords are absent from the
  # mask, so their nnz < block_q * block_kv and they stay partial — the
  # bitmap then correctly masks the padded k/v rows to NEG_INF.
  uniq, nnz_per_block = np.unique(bid, return_counts=True)
  n_active = len(uniq)
  qb_u = (uniq // nkv).astype(np.int64)
  kb_u = (uniq % nkv).astype(np.int64)

  full = nnz_per_block == block_q * block_kv
  n_partial = int((~full).sum())
  # row_of[a]: compact bitmap row of active block a (0 = full fast path).
  row_of = np.zeros(max(n_active, 1), dtype=np.int32)
  row_of[np.nonzero(~full)[0]] = np.arange(1, n_partial + 1, dtype=np.int32)

  # Packed bitmaps for the partial blocks only, shared by both map
  # orientations. ROW-packed (words on sublanes, strided over the whole
  # q-block: row r → word r % gw, bit r // gw — _pack_mask_bits_rows):
  # the lane-packed [.., bq, bkv//32] layout tile-pads its last dim to
  # 128 lanes, an 8-16× HBM expansion via an XLA layout copy.
  mask_blocks = np.zeros((1 + n_partial, gw, block_kv), dtype=np.uint32)
  mask_blocks[0] = np.uint32(0xFFFFFFFF)   # dummy "full" row
  inv = np.searchsorted(uniq, bid)
  dest = row_of[inv]
  sel = dest > 0                           # coords in full blocks need no bits
  lr = rows[sel] % block_q
  lc = cols[sel] % block_kv
  np.bitwise_or.at(mask_blocks, (dest[sel], lr % gw, lc),
                   np.uint32(1) << (lr // gw).astype(np.uint32))

  kv_count = np.bincount(qb_u, minlength=nq).astype(np.int32)
  ma = max(int(kv_count.max(initial=0)), 1)
  offs = np.concatenate([[0], np.cumsum(kv_count)])
  slot = np.arange(n_active, dtype=np.int64) - offs[qb_u]
  kv_index = np.zeros((nq, ma), dtype=np.int32)
  kv_index[qb_u, slot] = kb_u
  mask_rows = np.zeros((nq, ma), dtype=np.int32)
  mask_rows[qb_u, slot] = row_of[:n_active]

  order_t = np.argsort(kb_u * nq + qb_u, kind="stable")
  q_count = np.bincount(kb_u, minlength=nkv).astype(np.int32)
  mat = max(int(q_count.max(initial=0)), 1)
  offs_t = np.concatenate([[0], np.cumsum(q_count)])
  slot_t = np.arange(n_active, dtype=np.int64) - offs_t[kb_u[order_t]]
  q_index = np.zeros((nkv, mat), dtype=np.int32)
  q_index[kb_u[order_t], slot_t] = qb_u[order_t]
  mask_rows_t = np.zeros((nkv, mat), dtype=np.int32)
  mask_rows_t[kb_u[order_t], slot_t] = row_of[:n_active][order_t]

  return dict(
      n=n, nq=nq, nkv=nkv, ma=ma, mat=mat,
      n_q_pad=n_q_pad, n_kv_pad=n_kv_pad,
      kv_index=kv_index, kv_count=kv_count,
      mask_rows=mask_rows, mask_blocks=mask_blocks,
      q_index=q_index, q_count=q_count,
      mask_rows_t=mask_rows_t, mask_blocks_t=mask_blocks,
      # Static specialization knob: with no full blocks the kernels compile
      # the masked path only (no per-block branch). Measured: the dead
      # branch costs ~4-7% at the GenCast configs, whose k-hop-16 masks
      # have ZERO full 512-blocks (0.7% even at 64x64) — the fast path is
      # real only for masks with genuinely dense interiors.
      has_full=bool(n_active > n_partial),
  )


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _fwd_kernel(kv_index, kv_count, mask_rows, q_ref, k_ref, v_ref, mask_ref,
                o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, ma, hb,
                has_full):
  """Head-folded forward step: ``hb`` batch·head slices per grid step.

  The mask bitmap is HEAD-INVARIANT, so folding heads into the block
  amortizes the VPU bitmap unpack (measured at 23% of the forward kernel
  at mesh-6 512² tiles, batch12 round 4) across the fold — the mask is
  unpacked ONCE per (q, kv) block pair and applied as an f32 additive
  bias (bit-identical to the select: |s| ≪ ulp(1e30) so s + NEG_INF
  rounds to exactly NEG_INF). The fold also cuts grid steps hb×.
  """
  j = pl.program_id(2)
  i = pl.program_id(1)

  @pl.when(j == 0)
  def _init():
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

  @pl.when(j < kv_count[i])
  def _compute():
    def update(bias):
      for h in range(hb):
        s = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bkv]
        if bias is not None:
          s = s + bias
        m_prev = m_scr[h][:, :1]                       # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)     # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                # [bq, 1]
        p = jnp.exp(s - m_new)                         # [bq, bkv]
        l_new = l_scr[h][:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[h] = jnp.broadcast_to(m_new, m_scr.shape[1:])
        l_scr[h] = jnp.broadcast_to(l_new, l_scr.shape[1:])

    def bias_of_mask():
      mask = _unpack_mask_rows(mask_ref[0], q_ref.shape[1], k_ref.shape[1],
                               q_ref.shape[1])
      return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    if not has_full:
      # Static specialization: no full blocks in this map — compile the
      # masked path only (the dead branch costs ~4-7% at the GenCast
      # configs, whose masks have no full blocks at any practical tile).
      update(bias_of_mask())
    else:
      # Full-block fast path: row 0 ⇒ every entry unmasked; skip the VPU
      # bitmap unpack + bias.
      full = mask_rows[i, j] == 0

      @pl.when(full)
      def _full():
        update(None)

      @pl.when(jnp.logical_not(full))
      def _partial():
        update(bias_of_mask())

  @pl.when(j == ma - 1)
  def _finalize():
    for h in range(hb):
      l = l_scr[h][:, :1]
      l_safe = jnp.where(l == 0.0, 1.0, l)
      o_ref[h] = (acc_scr[h] / l_safe).astype(o_ref.dtype)
      lse_ref[h] = m_scr[h][:, :1] + jnp.log(l_safe)


def _head_block(bh: int, block_q: int, block_kv: int, d: int,
                itemsize: int = 2) -> int:
  """Largest head fold with per-operand DMA blocks ≤ 512 KB (VMEM scoped
  limit is 16 MB; q/k/v/o each double-buffer). ``itemsize`` is the q/k/v
  element size in bytes — f32 operands halve the affordable fold. Env
  SPLASH_HB overrides."""
  env = os.environ.get("SPLASH_HB")
  if env:
    return max(1, int(env))
  limit = 512 * 1024
  for h in (8, 4, 2):
    if bh % h == 0 and h * max(block_q, block_kv) * d * itemsize <= limit:
      return h
  return 1


def _fwd(q, k, v, block_map, block_q, block_kv, scale, interpret,
         statics=None):
  """q,k,v: [bh, n_pad, d] (already padded). Returns (o, lse).
  ``statics``: optional device arrays {kv_index, kv_count, mask_rows,
  mask_blocks} threaded as jit args (the bitpacked masks — compact, partial
  blocks only — would otherwise inline into the HLO once per transformer
  layer)."""
  bh, n_q_pad, d = q.shape
  nq, ma = block_map["nq"], block_map["ma"]
  st = statics or {}
  kv_index = st.get("kv_index")
  if kv_index is None:
    kv_index = jnp.asarray(block_map["kv_index"])
  kv_count = st.get("kv_count")
  if kv_count is None:
    kv_count = jnp.asarray(block_map["kv_count"])
  mask_rows = st.get("mask_rows")
  if mask_rows is None:
    mask_rows = jnp.asarray(block_map["mask_rows"])
  mask_blocks = st.get("mask_blocks")
  if mask_blocks is None:
    mask_blocks = jnp.asarray(block_map["mask_blocks"])

  hb = _head_block(bh, block_q, block_kv, d, q.dtype.itemsize)
  if bh % hb:
    raise ValueError(f"SPLASH_HB={hb} must divide batch·heads={bh}")
  grid = (bh // hb, nq, ma)
  kernel = functools.partial(_fwd_kernel, scale=scale, ma=ma, hb=hb,
                             has_full=bool(block_map.get("has_full", True)))
  out_shape = (
      jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
      jax.ShapeDtypeStruct((bh, n_q_pad, 1), jnp.float32),
  )
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=grid,
      in_specs=[
          pl.BlockSpec((hb, block_q, d),
                       lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
          pl.BlockSpec((hb, block_kv, d),
                       lambda b, i, j, kvi, kvc, mrw: (b, kvi[i, j], 0)),
          pl.BlockSpec((hb, block_kv, d),
                       lambda b, i, j, kvi, kvc, mrw: (b, kvi[i, j], 0)),
          pl.BlockSpec((1, block_q // 32, block_kv),
                       lambda b, i, j, kvi, kvc, mrw: (mrw[i, j], 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((hb, block_q, d),
                       lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
          pl.BlockSpec((hb, block_q, 1),
                       lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
      ],
      scratch_shapes=[
          pltpu.VMEM((hb, block_q, 128), jnp.float32),
          pltpu.VMEM((hb, block_q, 128), jnp.float32),
          pltpu.VMEM((hb, block_q, d), jnp.float32),
      ],
  )
  o, lse = pl.pallas_call(
      kernel, grid_spec=grid_spec, out_shape=out_shape,
      # (batch·head, q-block) steps are independent; only the kv sweep (j)
      # carries the online-softmax scratch. Declaring this lets Mosaic
      # pipeline/reorder across the parallel dims.
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
      interpret=interpret)(kv_index, kv_count, mask_rows, q, k, v,
                           mask_blocks)
  return o, lse[..., 0]


# ---------------------------------------------------------------------------
# Backward kernels.
# ---------------------------------------------------------------------------


def _dq_kernel(kv_index, kv_count, mask_rows, q_ref, k_ref, v_ref, mask_ref,
               do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale, ma, hb,
               has_full):
  """Head-folded like :func:`_fwd_kernel`: one mask unpack per (q, kv)
  block pair, applied as an additive f32 bias across the ``hb`` fold."""
  j = pl.program_id(2)
  i = pl.program_id(1)

  @pl.when(j == 0)
  def _init():
    dq_scr[:] = jnp.zeros_like(dq_scr)

  @pl.when(j < kv_count[i])
  def _compute():
    def update(bias):
      for h in range(hb):
        k = k_ref[h]
        s = jax.lax.dot_general(
            q_ref[h], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
          s = s + bias
        dp = jax.lax.dot_general(
            do_ref[h], v_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [bq, bkv]
        p = jnp.exp(s - lse_ref[h])                   # [bq, bkv]
        ds = p * (dp - delta_ref[h]) * scale          # [bq, bkv]
        dq_scr[h] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bias_of_mask():
      mask = _unpack_mask_rows(mask_ref[0], q_ref.shape[1], k_ref.shape[1],
                               q_ref.shape[1])
      return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    if not has_full:
      update(bias_of_mask())
    else:
      full = mask_rows[i, j] == 0                   # see _fwd_kernel

      @pl.when(full)
      def _full():
        update(None)

      @pl.when(jnp.logical_not(full))
      def _partial():
        update(bias_of_mask())

  @pl.when(j == ma - 1)
  def _finalize():
    for h in range(hb):
      dq_ref[h] = dq_scr[h].astype(dq_ref.dtype)


def _dkv_kernel(q_index, q_count, mask_rows_t, q_ref, k_ref, v_ref, mask_ref,
                do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                *, scale, mat, hb, has_full):
  """Head-folded like :func:`_fwd_kernel`: one mask unpack per (q, kv)
  block pair, applied as an additive f32 bias across the ``hb`` fold."""
  s_idx = pl.program_id(2)
  j = pl.program_id(1)

  @pl.when(s_idx == 0)
  def _init():
    dk_scr[:] = jnp.zeros_like(dk_scr)
    dv_scr[:] = jnp.zeros_like(dv_scr)

  @pl.when(s_idx < q_count[j])
  def _compute():
    def update(bias):
      for h in range(hb):
        q = q_ref[h]     # [bq, d]
        do = do_ref[h]   # [bq, d]
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bkv]
        if bias is not None:
          s = s + bias
        dp = jax.lax.dot_general(
            do, v_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bkv]
        p = jnp.exp(s - lse_ref[h])                      # [bq, bkv]
        dv_scr[h] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bkv, d]
        ds = p * (dp - delta_ref[h]) * scale             # [bq, bkv]
        dk_scr[h] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bkv, d]

    def bias_of_mask():
      mask = _unpack_mask_rows(mask_ref[0], q_ref.shape[1], k_ref.shape[1],
                               q_ref.shape[1])
      return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    if not has_full:
      update(bias_of_mask())
    else:
      full = mask_rows_t[j, s_idx] == 0               # see _fwd_kernel

      @pl.when(full)
      def _full():
        update(None)

      @pl.when(jnp.logical_not(full))
      def _partial():
        update(bias_of_mask())

  @pl.when(s_idx == mat - 1)
  def _finalize():
    for h in range(hb):
      dk_ref[h] = dk_scr[h].astype(dk_ref.dtype)
      dv_ref[h] = dv_scr[h].astype(dv_ref.dtype)


def _repad(x, n, n_pad):
  """Slice the node axis (axis 1) to n real rows and zero-pad to n_pad."""
  if x.shape[1] == n_pad:
    return x
  return jnp.pad(x[:, :n], ((0, 0), (0, n_pad - x[:, :n].shape[1]))
                 + ((0, 0),) * (x.ndim - 2))


def _bwd(q, k, v, o, lse, do, block_map, block_q, block_kv, scale, interpret,
         statics=None):
  """Backward kernels. May run on a block map built at different
  (block_q_dkv, block_kv_dkv) sizes than the forward (reference knobs:
  sparse_transformer.py:244-275); inputs arrive padded to the FORWARD map's
  sizes and are re-padded here if the backward map pads differently.
  Zero-padded rows are inert: their mask bits are False (p=0 with lse
  re-padded to 0) and their do/delta are 0.
  ``statics``: optional device arrays {kv_index, kv_count, mask_rows,
  mask_blocks, q_index, q_count, mask_rows_t, mask_blocks_t} for THIS map,
  threaded as jit args so the bitpacked masks don't inline as HLO constants
  under jax.grad (rig rule 8)."""
  n = block_map["n"]
  q = _repad(q, n, block_map["n_q_pad"])
  o = _repad(o, n, block_map["n_q_pad"])
  do = _repad(do, n, block_map["n_q_pad"])
  lse = _repad(lse, n, block_map["n_q_pad"])
  k = _repad(k, n, block_map["n_kv_pad"])
  v = _repad(v, n, block_map["n_kv_pad"])
  bh, n_q_pad, d = q.shape
  n_kv_pad = k.shape[1]
  nq, ma = block_map["nq"], block_map["ma"]
  nkv, mat = block_map["nkv"], block_map["mat"]

  delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                  axis=-1)  # [bh, n_q_pad]
  lse_b = lse[..., None]      # [bh, n_q_pad, 1]
  delta_b = delta[..., None]  # [bh, n_q_pad, 1]

  st = statics or {}
  kv_index = st.get("kv_index")
  if kv_index is None:
    kv_index = jnp.asarray(block_map["kv_index"])
  kv_count = st.get("kv_count")
  if kv_count is None:
    kv_count = jnp.asarray(block_map["kv_count"])
  mask_rows = st.get("mask_rows")
  if mask_rows is None:
    mask_rows = jnp.asarray(block_map["mask_rows"])
  mask_blocks = st.get("mask_blocks")
  if mask_blocks is None:
    mask_blocks = jnp.asarray(block_map["mask_blocks"])

  has_full = bool(block_map.get("has_full", True))
  hb = _head_block(bh, block_q, block_kv, d, q.dtype.itemsize)
  if bh % hb:
    raise ValueError(f"SPLASH_HB={hb} must divide batch·heads={bh}")
  dq = pl.pallas_call(
      functools.partial(_dq_kernel, scale=scale, ma=ma, hb=hb,
                        has_full=has_full),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(bh // hb, nq, ma),
          in_specs=[
              pl.BlockSpec((hb, block_q, d),
                           lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, i, j, kvi, kvc, mrw: (b, kvi[i, j], 0)),
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, i, j, kvi, kvc, mrw: (b, kvi[i, j], 0)),
              pl.BlockSpec((1, block_q // 32, block_kv),
                           lambda b, i, j, kvi, kvc, mrw: (mrw[i, j], 0, 0)),
              pl.BlockSpec((hb, block_q, d),
                           lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
              pl.BlockSpec((hb, block_q, 1),
                           lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
              pl.BlockSpec((hb, block_q, 1),
                           lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
          ],
          out_specs=pl.BlockSpec((hb, block_q, d),
                                 lambda b, i, j, kvi, kvc, mrw: (b, i, 0)),
          scratch_shapes=[pltpu.VMEM((hb, block_q, d), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
      interpret=interpret,
  )(kv_index, kv_count, mask_rows, q, k, v, mask_blocks, do, lse_b, delta_b)

  q_index = st.get("q_index")
  if q_index is None:
    q_index = jnp.asarray(block_map["q_index"])
  q_count = st.get("q_count")
  if q_count is None:
    q_count = jnp.asarray(block_map["q_count"])
  mask_rows_t = st.get("mask_rows_t")
  if mask_rows_t is None:
    mask_rows_t = jnp.asarray(block_map["mask_rows_t"])
  mask_blocks_t = st.get("mask_blocks_t")
  if mask_blocks_t is None:
    mask_blocks_t = jnp.asarray(block_map["mask_blocks_t"])

  dk, dv = pl.pallas_call(
      functools.partial(_dkv_kernel, scale=scale, mat=mat, hb=hb,
                        has_full=has_full),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(bh // hb, nkv, mat),
          in_specs=[
              pl.BlockSpec((hb, block_q, d),
                           lambda b, j, s, qi, qc, mrwt: (b, qi[j, s], 0)),
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, j, s, qi, qc, mrwt: (b, j, 0)),
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, j, s, qi, qc, mrwt: (b, j, 0)),
              pl.BlockSpec((1, block_q // 32, block_kv),
                           lambda b, j, s, qi, qc, mrwt: (mrwt[j, s], 0, 0)),
              pl.BlockSpec((hb, block_q, d),
                           lambda b, j, s, qi, qc, mrwt: (b, qi[j, s], 0)),
              pl.BlockSpec((hb, block_q, 1),
                           lambda b, j, s, qi, qc, mrwt: (b, qi[j, s], 0)),
              pl.BlockSpec((hb, block_q, 1),
                           lambda b, j, s, qi, qc, mrwt: (b, qi[j, s], 0)),
          ],
          out_specs=[
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, j, s, qi, qc, mrwt: (b, j, 0)),
              pl.BlockSpec((hb, block_kv, d),
                           lambda b, j, s, qi, qc, mrwt: (b, j, 0)),
          ],
          scratch_shapes=[
              pltpu.VMEM((hb, block_kv, d), jnp.float32),
              pltpu.VMEM((hb, block_kv, d), jnp.float32),
          ],
      ),
      out_shape=(
          jax.ShapeDtypeStruct((bh, n_kv_pad, d), k.dtype),
          jax.ShapeDtypeStruct((bh, n_kv_pad, d), v.dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel", "parallel", "arbitrary")),
      interpret=interpret,
  )(q_index, q_count, mask_rows_t, q, k, v, mask_blocks_t, do, lse_b,
    delta_b)

  return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------


class BlockSparseAttention:
  """Callable block-sparse attention for a fixed static mask."""

  def __init__(self, block_map: dict, block_q: int, block_kv: int,
               interpret: Optional[bool] = None,
               bwd_map: Optional[dict] = None,
               block_q_dkv: Optional[int] = None,
               block_kv_dkv: Optional[int] = None):
    self._map = block_map
    self._block_q = block_q
    self._block_kv = block_kv
    self._bwd_map = bwd_map if bwd_map is not None else block_map
    self._block_q_bwd = block_q_dkv if block_q_dkv else block_q
    self._block_kv_bwd = block_kv_dkv if block_kv_dkv else block_kv
    self._interpret = interpret

  @classmethod
  def from_mask(cls, mask: sp.csr_matrix, block_q: int = 256,
                block_kv: int = 256, interpret: Optional[bool] = None,
                block_q_dkv: Optional[int] = None,
                block_kv_dkv: Optional[int] = None,
                ) -> "BlockSparseAttention":
    """block_q_dkv/block_kv_dkv, when given and different from the forward
    sizes, build a second block map used by both backward kernels
    (reference: sparse_transformer.py:244-275 passes independent fwd/bwd
    block params to the splash kernel)."""
    n = mask.shape[0]
    block_q = min(block_q, _round_up(n, 128))
    block_kv = min(block_kv, _round_up(n, 128))
    bwd_map = None
    if block_q_dkv or block_kv_dkv:
      block_q_dkv = min(block_q_dkv or block_q, _round_up(n, 128))
      block_kv_dkv = min(block_kv_dkv or block_kv, _round_up(n, 128))
      if (block_q_dkv, block_kv_dkv) != (block_q, block_kv):
        bwd_map = _build_block_map(mask, block_q_dkv, block_kv_dkv)
      else:
        block_q_dkv = block_kv_dkv = None
    return cls(_build_block_map(mask, block_q, block_kv), block_q, block_kv,
               interpret, bwd_map=bwd_map, block_q_dkv=block_q_dkv,
               block_kv_dkv=block_kv_dkv)

  @property
  def fraction_visited(self) -> float:
    """Fraction of all N² blocks actually computed (sparsity win)."""
    m = self._map
    return float(m["kv_count"].sum()) / (m["nq"] * m["nkv"])

  def host_statics(self):
    """Index/mask numpy arrays for threading as jit args (e.g. via a
    model's graph_statics) instead of HLO constants. Covers the forward
    kernel AND both backward kernels (the dkv transposed maps, plus the
    separate backward map when block_q_dkv/block_kv_dkv differ), so
    jax.grad through the attention inlines no large constants either."""
    m = self._map
    out = {"kv_index": m["kv_index"], "kv_count": m["kv_count"],
           "mask_rows": m["mask_rows"], "mask_blocks": m["mask_blocks"]}
    bm = self._bwd_map
    out["bwd_q_index"] = bm["q_index"]
    out["bwd_q_count"] = bm["q_count"]
    out["bwd_mask_rows_t"] = bm["mask_rows_t"]
    if bm is not self._map:
      # Distinct backward block sizes: the dq kernel needs the backward
      # map's own q→kv arrays too (otherwise it reuses the forward ones),
      # and the backward map has its own compact bitmap table (shared by
      # its two orientations — when the maps coincide, "mask_blocks" IS
      # that table and no second copy is uploaded).
      out["bwd_kv_index"] = bm["kv_index"]
      out["bwd_kv_count"] = bm["kv_count"]
      out["bwd_mask_rows"] = bm["mask_rows"]
      out["bwd_mask_blocks"] = bm["mask_blocks"]
    return out

  def __call__(self, q, k, v, scale: Optional[float] = None, statics=None):
    """q,k,v: [batch, n, heads, head_dim] → [batch, n, heads, head_dim].
    ``statics``: optional device-array dict (see :meth:`host_statics`)."""
    interpret = self._interpret
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    if scale is None:
      scale = q.shape[-1] ** -0.5
    batch, n, heads, d = q.shape
    m = self._map
    if n != m["n"]:
      raise ValueError(f"mask built for {m['n']} nodes, got {n}")

    def to_bh(x, n_pad):
      x = jnp.swapaxes(x, 1, 2).reshape(batch * heads, n, d)
      return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qb = to_bh(q, m["n_q_pad"])
    kb = to_bh(k, m["n_kv_pad"])
    vb = to_bh(v, m["n_kv_pad"])
    ob = _attend(qb, kb, vb, statics, self._map_static(), float(scale),
                 interpret)
    ob = ob[:, :n].reshape(batch, heads, n, d)
    return jnp.swapaxes(ob, 1, 2)

  def _map_static(self):
    # Wrapped as a hashable tuple key for the custom-vjp closure.
    return _MapHolder(self._map, self._block_q, self._block_kv,
                      self._bwd_map, self._block_q_bwd, self._block_kv_bwd)

  def sequence_parallel(self, mesh, axis: str):
    """Returns a :class:`SequenceParallelAttention` computing this attention
    with the q/node axis sharded over ``mesh`` axis ``axis`` (the reference
    kernel's q_seq_shards, sparse_transformer.py:271-273, which it never
    uses > 1). Callable like the attention itself; exposes ``host_statics``
    so the per-shard maps/masks can ride in graph_statics as jit args."""
    return SequenceParallelAttention(self, mesh, axis)


class SequenceParallelAttention:
  """Splash attention with the q/node axis sharded over a Mesh axis.

  Each shard holds a contiguous range of q blocks plus replicated k/v;
  the per-q-block scalar-prefetch maps and bitpacked masks shard along
  the same axis. Forward and dq are communication-free; dk/dv partial
  sums are reduced by shard_map's transpose (k/v enter replicated).
  """

  _STATIC_NAMES = ("kv_index", "kv_count", "mask_rows", "mask_blocks",
                   "q_index", "q_count", "mask_rows_t")
  # The compact bitmap table ("mask_blocks") is REPLICATED across shards
  # (it holds only the partially-masked blocks and is shared by both map
  # orientations); everything else shards along the q-block axis.
  _REPLICATED = ("mask_blocks",)

  def __init__(self, attn: "BlockSparseAttention", mesh, axis: str):
    m = attn._map
    S = int(mesh.shape[axis])
    nq, nkv, ma = m["nq"], m["nkv"], m["ma"]
    if nq % S:
      raise ValueError(
          f"{nq} q blocks do not divide over {S} '{axis}' shards; pick a "
          f"block_q so the padded node count splits evenly")
    nq_l = nq // S
    q_index, q_count, mask_rows_t, mat_l = _build_shard_transposed_maps(m, S)
    self._statics = {
        "kv_index": m["kv_index"].reshape(S, nq_l, ma),
        "kv_count": m["kv_count"].reshape(S, nq_l),
        "mask_rows": m["mask_rows"].reshape(S, nq_l, ma),
        "mask_blocks": m["mask_blocks"],
        "q_index": q_index, "q_count": q_count, "mask_rows_t": mask_rows_t,
    }
    bq, bkv = attn._block_q, attn._block_kv
    self._dims = _SpDims(nq_l, nkv, ma, mat_l, nq_l * bq, m["n_kv_pad"],
                         bq, bkv, has_full=m.get("has_full", True))
    self._mesh = mesh
    self._axis = axis
    self._map = m
    interpret = attn._interpret
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    self._interpret = interpret

  def host_statics(self):
    """Per-shard index/mask numpy arrays (leading dim = shard axis) to
    thread as jit args instead of HLO constants (rig rule 8)."""
    return dict(self._statics)

  def __call__(self, q, k, v, scale: Optional[float] = None, statics=None):
    from jax.sharding import PartitionSpec as P
    try:
      from jax import shard_map
    except ImportError:  # older jax
      from jax.experimental.shard_map import shard_map

    if scale is None:
      scale = q.shape[-1] ** -0.5
    scale = float(scale)
    m = self._map
    n = m["n"]
    dims, interpret, axis = self._dims, self._interpret, self._axis
    batch, n_in, heads, d = q.shape
    if n_in != n:
      raise ValueError(f"mask built for {n} nodes, got {n_in}")
    st = statics or {}
    arrays = tuple(
        st[name] if st.get(name) is not None
        else jnp.asarray(self._statics[name])
        for name in self._STATIC_NAMES)

    def local_fn(qb, kb, vb, kvi, kvc, mrw, mb, qi, qc, mrwt):
      # mb (the compact bitmap table) arrives whole — replicated spec.
      return _attend_arrays(qb, kb, vb, kvi[0], kvc[0], mrw[0], mb, qi[0],
                            qc[0], mrwt[0], dims, scale, interpret)

    # check_vma off: pallas_call out_shapes don't carry vma metadata.
    static_specs = tuple(
        P() if name in self._REPLICATED else P(axis)
        for name in self._STATIC_NAMES)
    sharded = shard_map(
        local_fn, mesh=self._mesh,
        in_specs=(P(None, axis, None), P(), P()) + static_specs,
        out_specs=P(None, axis, None),
        check_vma=False)

    def to_bh(x, n_pad):
      x = jnp.swapaxes(x, 1, 2).reshape(batch * heads, n_in, d)
      return jnp.pad(x, ((0, 0), (0, n_pad - n_in), (0, 0)))

    qb = to_bh(q, m["n_q_pad"])
    kb = to_bh(k, m["n_kv_pad"])
    vb = to_bh(v, m["n_kv_pad"])
    ob = sharded(qb, kb, vb, *arrays)
    ob = ob[:, :n_in].reshape(batch, heads, n_in, d)
    return jnp.swapaxes(ob, 1, 2)


class _MapHolder:
  """Hashable holder so the block maps can be static args of custom_vjp."""

  def __init__(self, block_map, block_q, block_kv,
               bwd_map=None, block_q_bwd=None, block_kv_bwd=None):
    self.map = block_map
    self.block_q = block_q
    self.block_kv = block_kv
    self.bwd_map = bwd_map if bwd_map is not None else block_map
    self.block_q_bwd = block_q_bwd or block_q
    self.block_kv_bwd = block_kv_bwd or block_kv

  def __hash__(self):
    return hash((id(self.map), id(self.bwd_map), self.block_q, self.block_kv,
                 self.block_q_bwd, self.block_kv_bwd))

  def __eq__(self, other):
    return (isinstance(other, _MapHolder) and other.map is self.map
            and other.bwd_map is self.bwd_map
            and other.block_q == self.block_q
            and other.block_kv == self.block_kv
            and other.block_q_bwd == self.block_q_bwd
            and other.block_kv_bwd == self.block_kv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attend(q, k, v, statics, holder, scale, interpret):
  o, _ = _fwd(q, k, v, holder.map, holder.block_q, holder.block_kv, scale,
              interpret, statics)
  return o


def _attend_fwd(q, k, v, statics, holder, scale, interpret):
  o, lse = _fwd(q, k, v, holder.map, holder.block_q, holder.block_kv, scale,
                interpret, statics)
  return o, (q, k, v, o, lse, statics)


def _attend_bwd(holder, scale, interpret, residuals, do):
  q, k, v, o, lse, statics = residuals
  bwd_statics = None
  if statics:
    # Resolve the backward map's arrays out of the threaded statics (see
    # host_statics): explicit bwd_* keys win; when the backward map IS the
    # forward map, the forward q→kv arrays are reused for the dq kernel.
    same = holder.bwd_map is holder.map
    bwd_statics = {}
    for name in ("kv_index", "kv_count", "mask_rows", "mask_blocks"):
      val = statics.get("bwd_" + name)
      if val is None and same:
        val = statics.get(name)
      if val is not None:
        bwd_statics[name] = val
    for name in ("q_index", "q_count", "mask_rows_t"):
      val = statics.get("bwd_" + name)
      if val is not None:
        bwd_statics[name] = val
    # Both orientations share one compact bitmap table per map: the dkv
    # kernel's table is the backward map's own ("bwd_mask_blocks") when the
    # block sizes differ, else the forward table.
    val = statics.get("bwd_mask_blocks")
    if val is None and same:
      val = statics.get("mask_blocks")
    if val is not None:
      bwd_statics["mask_blocks_t"] = val
  dq, dk, dv = _bwd(q, k, v, o, lse, do, holder.bwd_map, holder.block_q_bwd,
                    holder.block_kv_bwd, scale, interpret,
                    statics=bwd_statics)
  # Grads must match the primal (forward-padded) shapes.
  n = holder.map["n"]
  dq = _repad(dq, n, holder.map["n_q_pad"])
  dk = _repad(dk, n, holder.map["n_kv_pad"])
  dv = _repad(dv, n, holder.map["n_kv_pad"])
  return dq, dk, dv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Sequence parallelism: shard the q/node axis over a mesh axis.
# ---------------------------------------------------------------------------
#
# The reference's splash kernel exposes q_seq_shards but always uses 1
# (sparse_transformer.py:271-273). Here we shard the q-block axis over an ICI
# mesh axis: every shard holds its contiguous q-node range plus the FULL k/v
# (replicated), and — because the block maps are per-q-block — the scalar-
# prefetch maps and bitpacked masks shard along the same axis, so each chip
# runs the same kernel on its slice with no communication in the forward
# pass. The backward dq is equally local; dk/dv are partial sums per shard
# that shard_map's transpose reduces (psum) because k/v enter replicated.


class _SpDims:
  """Hashable static dims for the array-operand attention entry point."""

  def __init__(self, nq, nkv, ma, mat, n_q_pad, n_kv_pad, block_q, block_kv,
               has_full=True):
    self.nq, self.nkv, self.ma, self.mat = nq, nkv, ma, mat
    self.n_q_pad, self.n_kv_pad = n_q_pad, n_kv_pad
    self.block_q, self.block_kv = block_q, block_kv
    self.has_full = bool(has_full)

  def _key(self):
    return (self.nq, self.nkv, self.ma, self.mat, self.n_q_pad,
            self.n_kv_pad, self.block_q, self.block_kv, self.has_full)

  def __hash__(self):
    return hash(self._key())

  def __eq__(self, other):
    return isinstance(other, _SpDims) and other._key() == self._key()

  def as_map(self, kv_index, kv_count, mask_rows, mask_blocks, q_index,
             q_count, mask_rows_t):
    return dict(
        n=self.n_q_pad, nq=self.nq, nkv=self.nkv, ma=self.ma, mat=self.mat,
        n_q_pad=self.n_q_pad, n_kv_pad=self.n_kv_pad,
        kv_index=kv_index, kv_count=kv_count, mask_rows=mask_rows,
        mask_blocks=mask_blocks, q_index=q_index, q_count=q_count,
        mask_rows_t=mask_rows_t, mask_blocks_t=mask_blocks,
        has_full=self.has_full)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _attend_arrays(q, k, v, kv_index, kv_count, mask_rows, mask_blocks,
                   q_index, q_count, mask_rows_t, dims, scale, interpret):
  """Like _attend, but with the block maps as ARRAY operands (required for
  SPMD: under shard_map each device carries its own map slice)."""
  m = dims.as_map(kv_index, kv_count, mask_rows, mask_blocks, q_index,
                  q_count, mask_rows_t)
  o, _ = _fwd(q, k, v, m, dims.block_q, dims.block_kv, scale, interpret)
  return o


def _attend_arrays_fwd(q, k, v, kv_index, kv_count, mask_rows, mask_blocks,
                       q_index, q_count, mask_rows_t, dims, scale,
                       interpret):
  m = dims.as_map(kv_index, kv_count, mask_rows, mask_blocks, q_index,
                  q_count, mask_rows_t)
  o, lse = _fwd(q, k, v, m, dims.block_q, dims.block_kv, scale, interpret)
  return o, (q, k, v, o, lse, kv_index, kv_count, mask_rows, mask_blocks,
             q_index, q_count, mask_rows_t)


def _attend_arrays_bwd(dims, scale, interpret, residuals, do):
  (q, k, v, o, lse, kv_index, kv_count, mask_rows, mask_blocks, q_index,
   q_count, mask_rows_t) = residuals
  m = dims.as_map(kv_index, kv_count, mask_rows, mask_blocks, q_index,
                  q_count, mask_rows_t)
  dq, dk, dv = _bwd(q, k, v, o, lse, do, m, dims.block_q, dims.block_kv,
                    scale, interpret)

  def f0(x):  # integer operands take float0 cotangents
    return np.zeros(x.shape, jax.dtypes.float0)

  return (dq, dk, dv, f0(kv_index), f0(kv_count), f0(mask_rows),
          f0(mask_blocks), f0(q_index), f0(q_count), f0(mask_rows_t))


_attend_arrays.defvjp(_attend_arrays_fwd, _attend_arrays_bwd)


def _build_shard_transposed_maps(block_map, num_shards):
  """Per-shard kv→(local q block) maps for the dkv kernel.

  The compact bitmap table is global (replicated across shards); only the
  row POINTERS are re-derived per shard from the forward map's mask_rows."""
  nq, nkv, ma = block_map["nq"], block_map["nkv"], block_map["ma"]
  nq_l = nq // num_shards
  kv_index = block_map["kv_index"]
  kv_count = block_map["kv_count"]
  mask_rows = block_map["mask_rows"]

  per_shard = [[[] for _ in range(nkv)] for _ in range(num_shards)]
  for i in range(nq):
    s = i // nq_l
    for slot in range(int(kv_count[i])):
      j = int(kv_index[i, slot])
      per_shard[s][j].append((i - s * nq_l, int(mask_rows[i, slot])))
  mat_l = max(
      (len(lst) for shard in per_shard for lst in shard), default=1)
  mat_l = max(mat_l, 1)

  q_index = np.zeros((num_shards, nkv, mat_l), np.int32)
  q_count = np.zeros((num_shards, nkv), np.int32)
  mask_rows_t = np.zeros((num_shards, nkv, mat_l), np.int32)
  for s in range(num_shards):
    for j in range(nkv):
      lst = per_shard[s][j]
      q_count[s, j] = len(lst)
      for t, (local_q, row) in enumerate(lst):
        q_index[s, j, t] = local_q
        mask_rows_t[s, j, t] = row
  return q_index, q_count, mask_rows_t, mat_l


def reference_masked_attention(q, k, v, mask, scale=None):
  """Dense reference implementation for kernel validation.

  q,k,v: [batch, n, heads, d]; mask: [n, n] bool.
  """
  if scale is None:
    scale = q.shape[-1] ** -0.5
  logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
  logits = jnp.where(mask[None, None], logits, NEG_INF)
  weights = jax.nn.softmax(logits, axis=-1)
  return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
