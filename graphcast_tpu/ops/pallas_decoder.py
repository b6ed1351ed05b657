"""Pallas TPU kernel: the fully-fused mesh2grid decoder.

The mesh2grid GNN (reference semantics: graphcast.py:700-738 +
typed_graph_net.py:130-184) is the per-step stage with the largest edge set
(3 edges per grid node = 3.1M edges at 0.25°) but a tiny useful output
([num_grid, num_outputs]). Run as XLA chunks it moves several multi-GB
[E, 512] intermediates through HBM per step (measured 139 ms standalone at
0.25°, ~10× its roofline). This kernel runs the ENTIRE decoder — edge MLP +
LayerNorm, 3-edge aggregation, node MLP + LayerNorm + residual, and the
output MLP — in one pass over grid-node blocks, writing only the final
[num_grid, num_outputs] array.

Two static properties make it mask-free (unlike the mesh-processor kernel):
  * every grid node has EXACTLY 3 incoming edges (triangle containment,
    reference grid_mesh_connectivity.py:104), receiver-sorted — so with
    edge arrays re-laid out slot-major ([3, num_grid, C]: slice j holds
    edge-slot j of every node), aggregation is a plain 3-term add and the
    per-block edge compute is three [block, C] matmul pipelines;
  * the decoder's edge features are structural, so their embed + first
    linear layer is a rollout constant (`const`, from
    GraphCast.precompute_step_statics) handed to the kernel pre-laid-out.

Pipeline per grid-node block i (C = latent, Co = padded output channels):
    gproj = grid_i @ Wr                                    # receiver proj
    for j in 0..2:
      y_j = LN(swish(const[j,i] + gs[j,i] + gproj) @ W1 + b1)
    agg  = y_0 + y_1 + y_2                                 # f32
    nupd = LN(swish(grid_i @ Wng + agg @ Wna + b_n0) @ Wn1 + b_n1)
    res  = grid_i + nupd                                   # node residual
    out  = swish(res @ Wd0 + b_d0) @ Wd1 + b_d1            # output MLP

The custom VJP runs a fused backward kernel by default
(_decoder_bwd_kernel): each grid sub-block recomputes its forward pipeline
in VMEM and emits input grads (grid latents, sender rows, const/raw-edge
features) plus all weight grads in one HBM pass — the same design as
ops/pallas_edge._fused_edge_bwd_kernel. ``fused_backward=False`` falls back
to XLA autodiff of the plain-ops recompute (exact, unfused — it
re-materializes the [3E, C] gathered senders in HBM, which is what OOMed
fully-fused training at 0.25°).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphcast_tpu.ops.pallas_edge import (
    _ln_bwd, _ln_moments, _ln_stats_for, _ln_stats_option)

LN_EPS = 1e-5


def _swish(x):
  """x * sigmoid(x) with explicitly-dtyped constants (jax.nn.sigmoid on
  bf16 trips a Mosaic vector.broadcast verification bug)."""
  one = jnp.asarray(1.0, x.dtype)
  return x * (one / (one + jnp.exp(-x)))


def _ln(y, scale, offset, mode="vpu"):
  yc, rstd = _ln_moments(y, mode)
  return yc * rstd * scale + offset


def _mm(a, b):
  return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)


def _decoder_kernel(*refs, compact, bn, edge_matmul, embed, ln_stats="vpu"):
  it = iter(refs)
  const_ref = next(it)
  if embed:
    # const rows are the RAW structural edge features ([3, bn, F], F ≈ 8):
    # the embed MLP + parameter-free LN run in-kernel, so the [3.1M, 512]
    # embedded-edge constant never exists in HBM (it alone is ~3.2 GB at
    # 0.25° and OOMed the 16 GB chip when hoisted).
    ew0_ref = next(it)
    eb0_ref = next(it)
    ew1_ref = next(it)
    eb1_ref = next(it)
  if edge_matmul:
    # const rows are pre-first-layer edge latents (e.g. the static
    # parameter-free-LN embeds of a norm-conditioned model); We'/b0'
    # fold the conditioning scale/offset (see denoiser wiring).
    we_ref = next(it)
    b0_ref = next(it)
  if compact:
    # Sender rows arrive as a per-block compact table (few unique mesh
    # senders per block, see FusedMesh2GridDecoder) and expand on the MXU
    # via a bitpacked one-hot instead of a 3.1M-row HBM gather.
    maskc_ref = next(it)
    comp_ref = next(it)
  else:
    gs_ref = next(it)
  (grid_ref, wr_ref, w1_ref, b1_ref, es_ref, eo_ref,
   wng_ref, wna_ref, bn0_ref, wn1_ref, bn1_ref, ns_ref, no_ref,
   wd0_ref, bd0_ref, wd1_ref, bd1_ref, out_ref) = it

  g = grid_ref[:]                                    # [bn, C] act dtype
  gproj = _mm(g, wr_ref[:])                          # f32
  if compact:
    from graphcast_tpu.ops.splash import _unpack_mask_rows, mask_row_group
    comp = comp_ref[0]
    u = comp.shape[0]
    bnw = bn // 32

  agg = jnp.zeros_like(gproj)
  for j in range(3):
    if embed:
      x = _mm(const_ref[j], ew0_ref[:]) + eb0_ref[0][None].astype(
          jnp.float32)
      hh = _swish(x.astype(g.dtype))
      y = _mm(hh, ew1_ref[:]) + eb1_ref[0][None].astype(jnp.float32)
      eyc, erstd = _ln_moments(y, ln_stats)
      en = (eyc * erstd).astype(g.dtype)
      x0 = _mm(en, we_ref[:])
      x0 += b0_ref[0][None].astype(jnp.float32)
    elif edge_matmul:
      x0 = _mm(const_ref[j], we_ref[:])
      x0 += b0_ref[0][None].astype(jnp.float32)
    else:
      x0 = const_ref[j].astype(jnp.float32)
    if compact:
      oh = _unpack_mask_rows(maskc_ref[0][j * bnw:(j + 1) * bnw], bn,
                             u, mask_row_group(bn)).astype(comp.dtype)
      x0 += _mm(oh, comp)
    else:
      x0 += gs_ref[j].astype(jnp.float32)
    x0 += gproj
    # Swish in the activation dtype (matches the XLA path's bf16 activation
    # math and halves the VPU cost that dominates this kernel).
    h = _swish(x0.astype(g.dtype))
    y = _mm(h, w1_ref[:]) + b1_ref[0][None].astype(jnp.float32)
    agg += _ln(y, es_ref[0][None].astype(jnp.float32),
               eo_ref[0][None].astype(jnp.float32), ln_stats)

  x = _mm(g, wng_ref[:]) + _mm(agg.astype(g.dtype), wna_ref[:])
  x += bn0_ref[0][None].astype(jnp.float32)
  h = _swish(x.astype(g.dtype))
  y = _mm(h, wn1_ref[:]) + bn1_ref[0][None].astype(jnp.float32)
  upd = _ln(y, ns_ref[0][None].astype(jnp.float32),
            no_ref[0][None].astype(jnp.float32), ln_stats)
  res = (g.astype(jnp.float32) + upd).astype(g.dtype)

  x = _mm(res, wd0_ref[:]) + bd0_ref[0][None].astype(jnp.float32)
  h = _swish(x.astype(g.dtype))
  out = _mm(h, wd1_ref[:]) + bd1_ref[0][None].astype(jnp.float32)
  out_ref[:] = out.astype(out_ref.dtype)




def _decoder_bwd_kernel(*refs, compact, split, edge_matmul, embed, ln_stats):
  """Backward of _decoder_kernel: recompute the sub-block's forward pipeline
  from its inputs (two j-passes so at most one edge slot's intermediates are
  live), then emit every input/param grad in the same HBM pass. Weight grads
  accumulate in constant-index f32 output blocks (the TPU grid is
  sequential); the compact sender-table grad (dcomp) flushes per FORWARD
  block — its ``split`` sub-blocks accumulate into the same [u, C] window.
  LayerNorm scale/offset (es/eo, ns/no) ARE inputs of downstream compute
  (eo/no feed the recomputed agg/res), and the biases b1/bn1 do not cancel
  out of the normalized outputs (LN is over channels), so all of b1, bn1,
  eo, no stay kernel inputs; bd1 only shifts the final output and is
  dropped (dbd1 = Σ dout)."""
  i = pl.program_id(0)
  it = iter(refs)
  const_ref = next(it)
  if embed:
    ew0_ref = next(it)
    eb0_ref = next(it)
    ew1_ref = next(it)
    eb1_ref = next(it)
  if edge_matmul:
    we_ref = next(it)
    b0_ref = next(it)
  if compact:
    maskb_ref = next(it)
    comp_ref = next(it)
  else:
    gs_ref = next(it)
  grid_ref = next(it)
  wr_ref = next(it)
  w1_ref = next(it)
  b1_ref = next(it)
  es_ref = next(it)
  eo_ref = next(it)
  wng_ref = next(it)
  wna_ref = next(it)
  bn0_ref = next(it)
  wn1_ref = next(it)
  bn1_ref = next(it)
  ns_ref = next(it)
  no_ref = next(it)
  wd0_ref = next(it)
  bd0_ref = next(it)
  wd1_ref = next(it)
  dout_ref = next(it)
  # Outputs.
  dgrid_ref = next(it)
  if compact:
    dcomp_ref = next(it)
  else:
    dgs_ref = next(it)
  dconst_ref = next(it)
  if embed:
    dew0_ref = next(it)
    deb0_ref = next(it)
    dew1_ref = next(it)
    deb1_ref = next(it)
  if edge_matmul:
    dwe_ref = next(it)
    db0_ref = next(it)
  dwr_ref = next(it)
  dw1_ref = next(it)
  db1_ref = next(it)
  des_ref = next(it)
  deo_ref = next(it)
  dwng_ref = next(it)
  dwna_ref = next(it)
  dbn0_ref = next(it)
  dwn1_ref = next(it)
  dbn1_ref = next(it)
  dns_ref = next(it)
  dno_ref = next(it)
  dwd0_ref = next(it)
  dbd0_ref = next(it)
  dwd1_ref = next(it)
  dbd1_ref = next(it)

  waccums = [dwr_ref, dw1_ref, db1_ref, des_ref, deo_ref, dwng_ref,
             dwna_ref, dbn0_ref, dwn1_ref, dbn1_ref, dns_ref, dno_ref,
             dwd0_ref, dbd0_ref, dwd1_ref, dbd1_ref]
  if embed:
    waccums += [dew0_ref, deb0_ref, dew1_ref, deb1_ref]
  if edge_matmul:
    waccums += [dwe_ref, db0_ref]

  @pl.when(i == 0)
  def _init_weight_accums():
    for r in waccums:
      r[:] = jnp.zeros_like(r)

  if compact:
    @pl.when(jax.lax.rem(i, split) == 0)
    def _init_dcomp():
      dcomp_ref[:] = jnp.zeros_like(dcomp_ref)


  g = grid_ref[:]                                  # [bs, C] act dtype
  dtype = g.dtype
  one = jnp.asarray(1.0, dtype)
  gproj = _mm(g, wr_ref[:])                        # f32
  if compact:
    from graphcast_tpu.ops.splash import _unpack_mask_rows, mask_row_group
    comp = comp_ref[0]
    u = comp.shape[0]

  def _cmm(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)

  def slot_fwd(j):
    """Recompute slot j's forward pipeline; returns its intermediates."""
    if embed:
      xe = _mm(const_ref[j], ew0_ref[:]) + eb0_ref[0][None].astype(
          jnp.float32)
      xe_d = xe.astype(dtype)
      sig_e = one / (one + jnp.exp(-xe_d))
      hh = xe_d * sig_e
      y0 = _mm(hh, ew1_ref[:]) + eb1_ref[0][None].astype(jnp.float32)
      eyc, erstd = _ln_moments(y0, ln_stats)
      en_h = eyc * erstd                           # f32, parameter-free LN
      en = en_h.astype(dtype)
      emb = (xe_d, sig_e, hh, en_h, erstd)
      x0 = _mm(en, we_ref[:]) + b0_ref[0][None].astype(jnp.float32)
    elif edge_matmul:
      en = const_ref[j]
      emb = None
      x0 = _mm(en, we_ref[:]) + b0_ref[0][None].astype(jnp.float32)
    else:
      en = None
      emb = None
      x0 = const_ref[j].astype(jnp.float32)
    if compact:
      oh = _unpack_mask_rows(maskb_ref[0, j, 0], g.shape[0], u,
                             mask_row_group(g.shape[0] * split)).astype(dtype)
      x0 = x0 + _mm(oh, comp)
    else:
      oh = None
      x0 = x0 + gs_ref[j].astype(jnp.float32)
    x0 = x0 + gproj
    xd = x0.astype(dtype)
    sig = one / (one + jnp.exp(-xd))
    h = xd * sig
    y = _mm(h, w1_ref[:]) + b1_ref[0][None].astype(jnp.float32)
    yc, rstd = _ln_moments(y, ln_stats)
    return oh, en, emb, xd, sig, h, yc * rstd, rstd

  es_row = es_ref[0][None].astype(jnp.float32)
  eo_row = eo_ref[0][None].astype(jnp.float32)

  # --- forward pass 1: the slot aggregation, then the node/output MLPs ---
  agg = jnp.zeros_like(gproj)
  for j in range(3):
    agg += slot_fwd(j)[6] * es_row + eo_row
  agg_d = agg.astype(dtype)
  xn = _mm(g, wng_ref[:]) + _mm(agg_d, wna_ref[:])
  xn += bn0_ref[0][None].astype(jnp.float32)
  xn_d = xn.astype(dtype)
  sig_n = one / (one + jnp.exp(-xn_d))
  hn = xn_d * sig_n
  yn = _mm(hn, wn1_ref[:]) + bn1_ref[0][None].astype(jnp.float32)
  ync, nrstd = _ln_moments(yn, ln_stats)
  ynh = ync * nrstd
  upd = ynh * ns_ref[0][None].astype(jnp.float32)
  upd += no_ref[0][None].astype(jnp.float32)
  res = (g.astype(jnp.float32) + upd).astype(dtype)
  xo = _mm(res, wd0_ref[:]) + bd0_ref[0][None].astype(jnp.float32)
  xo_d = xo.astype(dtype)
  sig_o = one / (one + jnp.exp(-xo_d))
  ho = xo_d * sig_o

  # --- backward through output + node MLPs ---
  dout = dout_ref[:].astype(jnp.float32)
  dbd1_ref[:] += jnp.sum(dout, axis=0, keepdims=True)
  dout_d = dout.astype(dtype)
  dwd1_ref[:] += _cmm(ho, dout_d, ((0,), (0,)))
  dho = _cmm(dout_d, wd1_ref[:], ((1,), (1,)))
  dso = sig_o + xo_d * sig_o * (one - sig_o)
  dxo = dho * dso.astype(jnp.float32)
  dbd0_ref[:] += jnp.sum(dxo, axis=0, keepdims=True)
  dxo_d = dxo.astype(dtype)
  dwd0_ref[:] += _cmm(res, dxo_d, ((0,), (0,)))
  dres = _cmm(dxo_d, wd0_ref[:], ((1,), (1,)))
  dg = dres                                        # residual branch
  dno_ref[:] += jnp.sum(dres, axis=0, keepdims=True)
  dns_ref[:] += jnp.sum(dres * ynh, axis=0, keepdims=True)
  dyhn = dres * ns_ref[0][None].astype(jnp.float32)
  dyn = _ln_bwd(dyhn, ynh, nrstd, ln_stats)
  dbn1_ref[:] += jnp.sum(dyn, axis=0, keepdims=True)
  dyn_d = dyn.astype(dtype)
  dwn1_ref[:] += _cmm(hn, dyn_d, ((0,), (0,)))
  dhn = _cmm(dyn_d, wn1_ref[:], ((1,), (1,)))
  dsn = sig_n + xn_d * sig_n * (one - sig_n)
  dxn = dhn * dsn.astype(jnp.float32)
  dbn0_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
  dxn_d = dxn.astype(dtype)
  dwng_ref[:] += _cmm(g, dxn_d, ((0,), (0,)))
  dg = dg + _cmm(dxn_d, wng_ref[:], ((1,), (1,)))
  dwna_ref[:] += _cmm(agg_d, dxn_d, ((0,), (0,)))
  dagg = _cmm(dxn_d, wna_ref[:], ((1,), (1,)))
  # Each slot's z_j = yh_j * es + eo receives the same cotangent dagg.
  deo_ref[:] += 3.0 * jnp.sum(dagg, axis=0, keepdims=True)

  # --- forward pass 2 + backward, one edge slot at a time ---
  dgproj = jnp.zeros_like(gproj)
  for j in range(3):
    oh, en, emb, xd, sig, h, yh, rstd = slot_fwd(j)
    des_ref[:] += jnp.sum(dagg * yh, axis=0, keepdims=True)
    dyh = dagg * es_row
    dy = _ln_bwd(dyh, yh, rstd, ln_stats)
    db1_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dy_d = dy.astype(dtype)
    dw1_ref[:] += _cmm(h, dy_d, ((0,), (0,)))
    dh = _cmm(dy_d, w1_ref[:], ((1,), (1,)))
    ds = sig + xd * sig * (one - sig)
    dx0 = dh * ds.astype(jnp.float32)
    dgproj += dx0
    dx0_d = dx0.astype(dtype)
    if compact:
      dcomp_ref[:] += _cmm(oh, dx0_d, ((0,), (0,)))[None]
    else:
      dgs_ref[j] = dx0.astype(dgs_ref.dtype)
    if edge_matmul:
      db0_ref[:] += jnp.sum(dx0, axis=0, keepdims=True)
      dwe_ref[:] += _cmm(en, dx0_d, ((0,), (0,)))
      den = _cmm(dx0_d, we_ref[:], ((1,), (1,)))
      if embed:
        xe_d, sig_e, hh, en_h, erstd = emb
        dy0 = _ln_bwd(den, en_h, erstd, ln_stats)
        deb1_ref[:] += jnp.sum(dy0, axis=0, keepdims=True)
        dy0_d = dy0.astype(dtype)
        dew1_ref[:] += _cmm(hh, dy0_d, ((0,), (0,)))
        dhh = _cmm(dy0_d, ew1_ref[:], ((1,), (1,)))
        dse = sig_e + xe_d * sig_e * (one - sig_e)
        dxe = dhh * dse.astype(jnp.float32)
        deb0_ref[:] += jnp.sum(dxe, axis=0, keepdims=True)
        dxe_d = dxe.astype(dtype)
        dew0_ref[:] += _cmm(const_ref[j], dxe_d, ((0,), (0,)))
        dconst_ref[j] = _cmm(dxe_d, ew0_ref[:], ((1,), (1,))).astype(
            dconst_ref.dtype)
      else:
        dconst_ref[j] = den.astype(dconst_ref.dtype)
    else:
      dconst_ref[j] = dx0.astype(dconst_ref.dtype)

  dgproj_d = dgproj.astype(dtype)
  dwr_ref[:] += _cmm(g, dgproj_d, ((0,), (0,)))
  dg = dg + _cmm(dgproj_d, wr_ref[:], ((1,), (1,)))
  dgrid_ref[:] = dg.astype(dgrid_ref.dtype)


class FusedMesh2GridDecoder:
  """Callable fused decoder for a fixed mesh2grid edge list.

  Args:
    senders: [3 * num_grid] mesh-node senders, receiver-sorted (3 edges per
      grid node — the geometry compiler's mesh2grid invariant).
    num_grid_nodes: number of grid nodes (receivers).
    num_outputs: true output channel count (padded internally to 128 lanes).
    block_nodes: grid nodes per kernel block.
  """

  def __init__(self, senders: np.ndarray, num_grid_nodes: int,
               num_outputs: int, block_nodes: int = 256,
               interpret: Optional[bool] = None,
               compact_gather: Optional[bool] = None,
               ln_stats: Optional[str] = None,
               fused_backward: bool = True,
               bwd_split: int = 2):
    """fused_backward=True routes the custom VJP through the fused backward
    kernel (_decoder_bwd_kernel); False falls back to XLA autodiff of the
    plain-ops recompute. bwd_split > 1 runs the backward at
    block_nodes/bwd_split grid rows per step (the backward carries ~2× the
    forward's live VMEM plus the f32 weight-grad accumulators)."""
    self.ln_stats = _ln_stats_option(ln_stats)
    if block_nodes % bwd_split:
      raise ValueError("bwd_split must divide block_nodes")
    self.fused_backward = fused_backward
    self.bwd_split = bwd_split
    senders = np.asarray(senders, np.int32)
    if senders.shape[0] != 3 * num_grid_nodes:
      raise ValueError("mesh2grid must have exactly 3 edges per grid node")
    self.num_grid = num_grid_nodes
    self.num_outputs = num_outputs
    self.block_nodes = block_nodes
    self._interpret = interpret
    nb = -(-num_grid_nodes // block_nodes)
    self.num_blocks = nb
    self.padded_grid = nb * block_nodes
    self.out_pad = max(128, -(-num_outputs // 128) * 128)
    # Slot-major senders: senders_slot[j, v] = sender of edge-slot j of grid
    # node v; padding nodes point at mesh node 0 (their outputs are sliced
    # off).
    slot = senders.reshape(num_grid_nodes, 3).T
    self.senders_slot = np.concatenate(
        [slot, np.zeros((3, self.padded_grid - num_grid_nodes), np.int32)],
        axis=1)

    # Compact per-block sender tables: consecutive grid nodes share their
    # containing triangles (≈13 grid nodes per mesh-6 triangle at 0.25°),
    # so a 256-node block references ≤ ~144 distinct mesh senders while the
    # direct gather would fetch 768 rows. Gathering only the unique rows
    # and expanding in-kernel via a bitpacked one-hot on the MXU cuts the
    # gather (measured 45 ms of a 74 ms decode at 0.25°) ~5×.
    bn = block_nodes
    uniq = []
    for i in range(nb):
      blk = self.senders_slot[:, i * bn:(i + 1) * bn].ravel()
      uniq.append(np.unique(blk))
    u_max = max(u.shape[0] for u in uniq)
    u_pad = max(32, -(-u_max // 32) * 32)
    from graphcast_tpu.ops.splash import _pack_mask_bits_rows, mask_row_group
    # Row-packed masks need 32-multiple row blocks (forward: bn rows per
    # edge slot; backward: bn/bwd_split rows sliced at group boundaries).
    rp_ok = (bn % 32 == 0
             and (bn // bwd_split) % mask_row_group(bn) == 0)
    if compact_gather is None:
      # Worth it only with real sender reuse inside blocks.
      compact_gather = u_pad <= 3 * bn // 2 and rp_ok
    elif compact_gather and not rp_ok:
      raise ValueError(
          "compact_gather needs block_nodes % 32 == 0 and bwd_split "
          "sub-blocks aligned to the mask row group "
          f"({mask_row_group(bn)} for block_nodes={bn}; see "
          "splash.mask_row_group)")
    self.compact = bool(compact_gather)
    self.u_pad = u_pad
    if self.compact:
      cid = np.zeros((nb, u_pad), np.int32)
      # Row-packed (words on sublanes, splash._pack_mask_bits_rows): the
      # lane-packed [nb, 3bn, u//32] layout tile-pads its last dim to 128
      # lanes — up to a 32× HBM expansion via an XLA layout copy. Packed
      # per edge slot j so both the forward (bn rows) and the split
      # backward (bn/split rows) slice at group boundaries.
      masks = np.zeros((nb, 3 * (bn // 32), u_pad), np.uint32)
      for i in range(nb):
        u = uniq[i]
        cid[i, :u.shape[0]] = u
        # Edge rows slot-major: row j*bn + v = edge-slot j of local node v.
        rows = self.senders_slot[:, i * bn:(i + 1) * bn].reshape(-1)
        local = np.searchsorted(u, rows)
        onehot = (local[:, None] == np.arange(u_pad)[None, :]).reshape(
            3, bn, u_pad)
        masks[i] = _pack_mask_bits_rows(
            onehot, mask_row_group(bn)).reshape(3 * (bn // 32), u_pad)
      self.compact_ids = cid
      self.compact_masks = masks

  def host_slot_features(self, per_edge: np.ndarray) -> np.ndarray:
    """Numpy [3*num_grid, F] receiver-sorted → [3, padded_grid, F]
    slot-major (for embed-in-kernel raw features in graph_statics)."""
    per_edge = np.asarray(per_edge)
    x = per_edge.reshape(self.num_grid, 3, -1).transpose(1, 0, 2)
    pad = np.zeros((3, self.padded_grid - self.num_grid, x.shape[-1]),
                   x.dtype)
    return np.concatenate([x, pad], axis=1)

  def rearrange_edge_array(self, per_edge):
    """[3*num_grid, ...] receiver-sorted edge array → [3, padded_grid, ...]
    slot-major (jnp ops; run once per rollout for the hoisted const)."""
    x = per_edge.reshape((self.num_grid, 3) + per_edge.shape[1:])
    x = jnp.swapaxes(x, 0, 1)
    pad = [(0, 0), (0, self.padded_grid - self.num_grid)] + [
        (0, 0)] * (per_edge.ndim - 1)
    return jnp.pad(x, pad)

  def host_layout(self):
    """Numpy layout arrays for threading as jit args (graph_statics), so
    the sender indices / bitpacked one-hot masks (tens of MB at 0.25°) do
    not inline into the HLO."""
    out = {"senders": self.senders_slot.reshape(-1)}
    if self.compact:
      out["ids"] = self.compact_ids.reshape(-1)
      out["masks"] = self.compact_masks
    return out

  def __call__(self, grid_lat, mesh_proj, const_slot, weights, layout=None):
    """Runs the fused decoder.

    Args:
      grid_lat: [num_grid, C] grid node latents (activation dtype).
      mesh_proj: [num_mesh, C] mesh latents pre-multiplied by the edge MLP's
        sender rows (Ws).
      const_slot: [3, padded_grid, C] hoisted static edge part
        (embed(edge_feats) @ We + b0), slot-major.
      weights: dict with keys wr, w1, b1, escale, eoffset, wng, wna, bn0,
        wn1, bn1, nscale, noffset, wd0, bd0, wd1, bd1 (f32 or act dtype;
        wd1/bd1 padded to out_pad). Optional we/b0 switch on the in-kernel
        edge matmul (conditioned-embed models).
      layout: optional DEVICE-array dict (see :meth:`host_layout`) passed
        as jit args instead of inline constants.

    Returns:
      [num_grid, num_outputs] decoded outputs (activation dtype).
    """
    return _fused_decode(grid_lat, mesh_proj, const_slot, weights, layout,
                         _DecoderHolder(self), self._interpret)

  # --- implementations ---

  def _forward(self, grid_lat, mesh_proj, const_slot, weights, layout,
               interpret):
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    bn = self.block_nodes
    nb = self.num_blocks
    G, C = grid_lat.shape
    if G != self.num_grid:
      raise ValueError(f"expected {self.num_grid} grid nodes, got {G}")
    dtype = grid_lat.dtype
    co = self.out_pad

    lay = layout or {}
    if self.compact:
      u = self.u_pad
      ids = lay.get("ids")
      if ids is None:
        ids = jnp.asarray(self.compact_ids.reshape(-1))
      maskc = lay.get("masks")
      if maskc is None:
        maskc = jnp.asarray(self.compact_masks)
      comp = mesh_proj[ids].reshape(nb, u, C).astype(dtype)
      gather_specs = [
          pl.BlockSpec((1, 3 * (bn // 32), u), lambda i: (i, 0, 0)),  # maskc
          pl.BlockSpec((1, u, C), lambda i: (i, 0, 0)),             # comp
      ]
      gather_args = [maskc, comp]
    else:
      senders = lay.get("senders")
      if senders is None:
        senders = jnp.asarray(self.senders_slot.reshape(-1))
      gs = mesh_proj[senders].reshape(
          3, self.padded_grid, C).astype(dtype)
      gather_specs = [pl.BlockSpec((3, bn, C), lambda i: (0, i, 0))]  # gs
      gather_args = [gs]
    grid_pad = jnp.pad(grid_lat, ((0, self.padded_grid - G), (0, 0)))

    def row(x):
      return x.reshape(1, -1).astype(dtype)

    w = {k: v for k, v in weights.items()}
    edge_matmul = "we" in w
    embed = "ew0" in w
    if embed and not edge_matmul:
      raise ValueError("embed_in_kernel requires we/b0 (edge_matmul)")
    F = const_slot.shape[-1]
    em_specs = []
    em_args = []
    if embed:
      em_specs += [
          pl.BlockSpec((F, C), lambda i: (0, 0)),            # ew0
          pl.BlockSpec((1, C), lambda i: (0, 0)),            # eb0
          pl.BlockSpec((C, C), lambda i: (0, 0)),            # ew1
          pl.BlockSpec((1, C), lambda i: (0, 0)),            # eb1
      ]
      em_args += [w["ew0"].astype(dtype), w["eb0"].reshape(1, C).astype(dtype),
                  w["ew1"].astype(dtype), w["eb1"].reshape(1, C).astype(dtype)]
    if edge_matmul:
      em_specs += [
          pl.BlockSpec((C, C), lambda i: (0, 0)),            # we
          pl.BlockSpec((1, C), lambda i: (0, 0)),            # b0
      ]
      em_args += [w["we"].astype(dtype), w["b0"].reshape(1, C).astype(dtype)]
    ln_stats = _ln_stats_for(self.ln_stats, C)
    kernel = functools.partial(_decoder_kernel, compact=self.compact, bn=bn,
                               edge_matmul=edge_matmul, embed=embed,
                               ln_stats=ln_stats)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, bn, F), lambda i: (0, i, 0)),   # const / ef
        ] + em_specs + gather_specs + [
            pl.BlockSpec((bn, C), lambda i: (i, 0)),         # grid
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # wr
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # w1
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # b1
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # escale
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # eoffset
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # wng
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # wna
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # bn0
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # wn1
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # bn1
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # nscale
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # noffset
            pl.BlockSpec((C, C), lambda i: (0, 0)),          # wd0
            pl.BlockSpec((1, C), lambda i: (0, 0)),          # bd0
            pl.BlockSpec((C, co), lambda i: (0, 0)),         # wd1
            pl.BlockSpec((1, co), lambda i: (0, 0)),         # bd1
        ],
        out_specs=pl.BlockSpec((bn, co), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((self.padded_grid, co), dtype),
        interpret=interpret,
    )(const_slot.astype(dtype), *em_args, *gather_args,
      grid_pad.astype(dtype),
      w["wr"].astype(dtype), w["w1"].astype(dtype), row(w["b1"]),
      row(w["escale"]), row(w["eoffset"]),
      w["wng"].astype(dtype), w["wna"].astype(dtype), row(w["bn0"]),
      w["wn1"].astype(dtype), row(w["bn1"]),
      row(w["nscale"]), row(w["noffset"]),
      w["wd0"].astype(dtype), row(w["bd0"]),
      w["wd1"].astype(dtype), row(w["bd1"]))
    return out[:G, :self.num_outputs]

  def _backward(self, grid_lat, mesh_proj, const_slot, weights, layout,
                dout, interpret):
    """Fused backward pass (see _decoder_bwd_kernel). Returns
    (dgrid [G, C], dmesh [M, C], dconst [3, padded_grid, F], dweights) with
    weight grads accumulated in f32 and cast back to each weight's dtype.
    The per-block compact sender-table grad (or slot-major dgs) is
    scatter-added into mesh_proj's rows outside the kernel — [nb, u, C]
    rows for the compact path instead of the [3E, C] gather the unfused
    VJP re-materializes."""
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    bn = self.block_nodes
    nb = self.num_blocks
    split = self.bwd_split
    bs = bn // split
    G, C = grid_lat.shape
    M = mesh_proj.shape[0]
    dtype = grid_lat.dtype
    co = self.out_pad
    lay = layout or {}
    w = dict(weights)
    edge_matmul = "we" in w
    embed = "ew0" in w
    F = const_slot.shape[-1]

    def row(x):
      return x.reshape(1, -1).astype(dtype)

    in_specs = [pl.BlockSpec((3, bs, F), lambda i: (0, i, 0))]   # const
    args = [const_slot.astype(dtype)]
    if embed:
      in_specs += [
          pl.BlockSpec((F, C), lambda i: (0, 0)),                # ew0
          pl.BlockSpec((1, C), lambda i: (0, 0)),                # eb0
          pl.BlockSpec((C, C), lambda i: (0, 0)),                # ew1
          pl.BlockSpec((1, C), lambda i: (0, 0)),                # eb1
      ]
      args += [w["ew0"].astype(dtype), row(w["eb0"]),
               w["ew1"].astype(dtype), row(w["eb1"])]
    if edge_matmul:
      in_specs += [
          pl.BlockSpec((C, C), lambda i: (0, 0)),                # we
          pl.BlockSpec((1, C), lambda i: (0, 0)),                # b0
      ]
      args += [w["we"].astype(dtype), row(w["b0"])]
    ids = senders = None
    if self.compact:
      u = self.u_pad
      ids = lay.get("ids")
      if ids is None:
        ids = jnp.asarray(self.compact_ids.reshape(-1))
      maskc = lay.get("masks")
      if maskc is None:
        maskc = jnp.asarray(self.compact_masks)
      # The ROW-packed words of a forward block are slot-major: reshaping
      # to [nb, 3, split, bs//32, u] makes sub-block s of slot j a
      # contiguous [bs//32, u] word block for the split backward grid
      # (legal because bs is a multiple of the pack's row group).
      maskb = maskc.reshape(nb, 3, split, bs // 32, u)
      comp = mesh_proj[ids].reshape(nb, u, C).astype(dtype)
      in_specs += [
          pl.BlockSpec((1, 3, 1, bs // 32, u),
                       lambda i: (i // split, 0, i % split, 0, 0)),
          pl.BlockSpec((1, u, C), lambda i: (i // split, 0, 0)),
      ]
      args += [maskb, comp]
    else:
      senders = lay.get("senders")
      if senders is None:
        senders = jnp.asarray(self.senders_slot.reshape(-1))
      gs = mesh_proj[senders].reshape(3, self.padded_grid, C).astype(dtype)
      in_specs += [pl.BlockSpec((3, bs, C), lambda i: (0, i, 0))]
      args += [gs]

    grid_pad = jnp.pad(grid_lat, ((0, self.padded_grid - G), (0, 0)))
    dout_pad = jnp.pad(dout.astype(dtype),
                       ((0, self.padded_grid - G), (0, co - dout.shape[1])))
    in_specs += [
        pl.BlockSpec((bs, C), lambda i: (i, 0)),                 # grid
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # wr
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # w1
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # b1
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # escale
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # eoffset
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # wng
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # wna
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # bn0
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # wn1
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # bn1
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # nscale
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # noffset
        pl.BlockSpec((C, C), lambda i: (0, 0)),                  # wd0
        pl.BlockSpec((1, C), lambda i: (0, 0)),                  # bd0
        pl.BlockSpec((C, co), lambda i: (0, 0)),                 # wd1
        pl.BlockSpec((bs, co), lambda i: (i, 0)),                # dout
    ]
    args += [grid_pad.astype(dtype),
             w["wr"].astype(dtype), w["w1"].astype(dtype), row(w["b1"]),
             row(w["escale"]), row(w["eoffset"]),
             w["wng"].astype(dtype), w["wna"].astype(dtype), row(w["bn0"]),
             w["wn1"].astype(dtype), row(w["bn1"]),
             row(w["nscale"]), row(w["noffset"]),
             w["wd0"].astype(dtype), row(w["bd0"]),
             w["wd1"].astype(dtype), dout_pad]

    out_specs = [pl.BlockSpec((bs, C), lambda i: (i, 0))]        # dgrid
    out_shape = [jax.ShapeDtypeStruct((self.padded_grid, C), dtype)]
    if self.compact:
      out_specs.append(pl.BlockSpec((1, self.u_pad, C),
                                    lambda i: (i // split, 0, 0)))
      out_shape.append(
          jax.ShapeDtypeStruct((nb, self.u_pad, C), jnp.float32))
    else:
      out_specs.append(pl.BlockSpec((3, bs, C), lambda i: (0, i, 0)))
      out_shape.append(
          jax.ShapeDtypeStruct((3, self.padded_grid, C), dtype))
    out_specs.append(pl.BlockSpec((3, bs, F), lambda i: (0, i, 0)))
    out_shape.append(
        jax.ShapeDtypeStruct((3, self.padded_grid, F), const_slot.dtype))
    wgrads = []          # (weights key, kernel out shape, row?)
    if embed:
      wgrads += [("ew0", (F, C), False), ("eb0", (1, C), True),
                 ("ew1", (C, C), False), ("eb1", (1, C), True)]
    if edge_matmul:
      wgrads += [("we", (C, C), False), ("b0", (1, C), True)]
    wgrads += [
        ("wr", (C, C), False), ("w1", (C, C), False), ("b1", (1, C), True),
        ("escale", (1, C), True), ("eoffset", (1, C), True),
        ("wng", (C, C), False), ("wna", (C, C), False),
        ("bn0", (1, C), True), ("wn1", (C, C), False),
        ("bn1", (1, C), True), ("nscale", (1, C), True),
        ("noffset", (1, C), True), ("wd0", (C, C), False),
        ("bd0", (1, C), True), ("wd1", (C, co), False),
        ("bd1", (1, co), True),
    ]
    for _, shp, _ in wgrads:
      out_specs.append(pl.BlockSpec(shp, lambda i: (0, 0)))
      out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))

    ln_stats = _ln_stats_for(self.ln_stats, C)
    kernel = functools.partial(_decoder_bwd_kernel, compact=self.compact,
                               split=split, edge_matmul=edge_matmul,
                               embed=embed, ln_stats=ln_stats)
    outs = pl.pallas_call(
        kernel,
        grid=(nb * split,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)

    it = iter(outs)
    dgrid = next(it)[:G]
    if self.compact:
      dcomp = next(it)
      dmesh = jnp.zeros((M, C), jnp.float32).at[ids].add(
          dcomp.reshape(nb * self.u_pad, C)).astype(mesh_proj.dtype)
    else:
      dgs = next(it)
      dmesh = jnp.zeros((M, C), jnp.float32).at[senders].add(
          dgs.reshape(-1, C).astype(jnp.float32)).astype(mesh_proj.dtype)
    dconst = next(it)
    dweights = {}
    for key, _, is_row in wgrads:
      val = next(it)
      if is_row:
        val = val[0]
      dweights[key] = val.astype(jnp.asarray(weights[key]).dtype)
    return dgrid, dmesh, dconst, dweights

  def _reference_math(self, grid_lat, mesh_proj, const_slot, weights,
                      layout=None):
    """Same pipeline in plain XLA (VJP recompute + test ground truth)."""
    G, C = grid_lat.shape
    dtype = grid_lat.dtype
    # Round-trip weights through the activation dtype (the kernel receives
    # them cast, per the cast-params-at-use policy), then do f32 math.
    w = {k: jnp.asarray(v).astype(dtype).astype(jnp.float32)
         for k, v in weights.items()}
    senders = (layout or {}).get("senders")
    if senders is None:
      senders = jnp.asarray(self.senders_slot.reshape(-1))
    gs = mesh_proj[senders].reshape(
        3, self.padded_grid, C)[:, :G].astype(jnp.float32)
    const = const_slot[:, :G].astype(jnp.float32)
    g32 = grid_lat.astype(jnp.float32)
    gproj = g32 @ w["wr"]

    def swish(x):
      return _swish(x.astype(dtype))

    agg = jnp.zeros_like(gproj)
    for j in range(3):
      if "ew0" in w:
        x = const[j].astype(dtype).astype(jnp.float32) @ w["ew0"]
        x += w["eb0"][None]
        hh = swish(x)
        y = hh.astype(jnp.float32) @ w["ew1"] + w["eb1"][None]
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        en = ((y - mean) * jax.lax.rsqrt(var + LN_EPS)).astype(dtype)
        x0 = en.astype(jnp.float32) @ w["we"] + w["b0"][None] + gs[j] + gproj
      elif "we" in w:
        x0 = const[j].astype(dtype).astype(jnp.float32) @ w["we"]
        x0 += w["b0"][None] + gs[j] + gproj
      else:
        x0 = const[j] + gs[j] + gproj
      h = swish(x0)
      y = h.astype(jnp.float32) @ w["w1"] + w["b1"][None]
      agg += _ln(y, w["escale"][None], w["eoffset"][None])

    x = g32 @ w["wng"] + agg.astype(dtype).astype(jnp.float32) @ w["wna"]
    x += w["bn0"][None]
    h = swish(x)
    y = h.astype(jnp.float32) @ w["wn1"] + w["bn1"][None]
    upd = _ln(y, w["nscale"][None], w["noffset"][None])
    res = (g32 + upd).astype(dtype)

    x = res.astype(jnp.float32) @ w["wd0"] + w["bd0"][None]
    h = swish(x)
    out = h.astype(jnp.float32) @ w["wd1"] + w["bd1"][None]
    return out.astype(dtype)[:, :self.num_outputs]


class _DecoderHolder:
  """Hashable wrapper for custom_vjp static args."""

  def __init__(self, dec: FusedMesh2GridDecoder):
    self.dec = dec

  def __hash__(self):
    return id(self.dec)

  def __eq__(self, other):
    return isinstance(other, _DecoderHolder) and other.dec is self.dec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_decode(grid_lat, mesh_proj, const_slot, weights, layout, holder,
                  interpret):
  return holder.dec._forward(grid_lat, mesh_proj, const_slot, weights,
                             layout, interpret)


def _fd_fwd(grid_lat, mesh_proj, const_slot, weights, layout, holder,
            interpret):
  out = holder.dec._forward(grid_lat, mesh_proj, const_slot, weights,
                            layout, interpret)
  return out, (grid_lat, mesh_proj, const_slot, weights, layout)


def _fd_bwd(holder, interpret, residuals, g):
  dec = holder.dec
  grid_lat, mesh_proj, const_slot, weights, layout = residuals
  if not dec.fused_backward:
    _, vjp = jax.vjp(
        lambda a, b, c, d: dec._reference_math(a, b, c, d, layout),
        grid_lat, mesh_proj, const_slot, weights)
    return vjp(g) + (None,)
  dgrid, dmesh, dconst, dweights = dec._backward(
      grid_lat, mesh_proj, const_slot, weights, layout, g, interpret)
  return dgrid, dmesh, dconst, dweights, None


_fused_decode.defvjp(_fd_fwd, _fd_bwd)
