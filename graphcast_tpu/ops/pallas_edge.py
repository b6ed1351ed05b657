"""Pallas TPU kernel: one fused message-passing edge step.

The mesh GNN's per-step edge pipeline is stream-bound: at mesh-6 each of the
16 processor steps reads/writes several [327k, 512] arrays (edge latents in,
matmul out, LayerNorm out, residual out, aggregation in), and profiling shows
the step costs ~15 ms while its MXU flops need <3 ms. This kernel performs
the WHOLE edge side of an InteractionNetwork step in one pass over the edges
(reference semantics: typed_graph_net.py:130-184 + the residual and MLP
structure of deep_typed_graph_net.py:212-248, mlp_num_hidden_layers=1,
factored first layer):

    x0  = e @ We + gs + onehotᵀ @ Gr + b0        # first linear (factored)
    y   = LN(swish(x0) @ W1 + b1) * scale + off  # second linear + LayerNorm
    e'  = e + y                                  # edge residual
    agg = onehot @ y                             # per-node-block aggregation

Edges live in the chunk-aligned padded layout of ops.pallas_mp
(BlockedSegmentSum): consecutive chunks belong to the same 256-node block,
so the receiver one-hot fits in VMEM as a bitpacked mask (both orientations)
and the aggregation accumulates in the f32 output window that flushes once
per block. gs (gathered sender projections) and Gr (per-block receiver
projections) are produced outside with one XLA gather / small matmuls.

The custom VJP runs a fused backward kernel by default
(_fused_edge_bwd_kernel): each chunk recomputes its forward pipeline
in-kernel and emits input grads (de, dgs, dGr via the flushed per-block
accumulator) plus f32 parameter-grad accumulators in one HBM pass.
``fused_backward=False`` falls back to XLA autodiff of a plain-ops
recompute — exact but unfused; it is the grad-parity ground truth in
tests/test_pallas_edge.py, not the training default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum
from graphcast_tpu.ops.splash import _unpack_mask_rows, mask_row_group

LN_EPS = 1e-5


def _swish(x):
  """x * sigmoid(x) with explicitly-dtyped constants (jax.nn.sigmoid on
  bf16 trips a Mosaic vector.broadcast verification bug)."""
  one = jnp.asarray(1.0, x.dtype)
  return x * (one / (one + jnp.exp(-x)))


def _ln_stats_option(ln_stats):
  """Resolve/validate an ``ln_stats`` constructor option ($GC_LN_STATS)."""
  if ln_stats is None:
    import os
    ln_stats = os.environ.get("GC_LN_STATS", "vpu")
  if ln_stats not in ("vpu", "mxu", "off"):
    raise ValueError(f"unknown ln_stats {ln_stats!r}")
  return ln_stats


def _ln_stats_for(ln_stats, C):
  """Per-call downgrade: pltpu.repeat lane tiling needs C % 128 == 0."""
  return "vpu" if (ln_stats == "mxu" and C % 128) else ln_stats


def _row_mean(x, mode):
  """Per-row mean of x [R, C] (f32), broadcastable against x.

  mode="vpu": jnp.mean — Mosaic lowers the lane reduction to a shuffle
  tree on the VPU. mode="mxu": contract against a ones [C, 128] matrix on
  the MXU (every output lane holds the row sum) and lane-tile the [R, 128]
  result back to [R, C] with pltpu.repeat — the kernel is VPU-bound, so
  moving the reduction to the (idle) MXU is free.
  """
  C = x.shape[-1]
  if mode == "mxu":
    ones = jnp.ones((C, 128), jnp.float32)
    s = jax.lax.dot_general(x, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return pltpu.repeat(s, C // 128, axis=1) * (1.0 / C)
  return jnp.mean(x, axis=-1, keepdims=True)


def _ln_moments(y, mode):
  """LayerNorm row moments: returns (y - mean, rsqrt(var + eps)).

  mode="off" skips the statistics entirely (identity mean/var) — wrong
  numerics, profiling ceiling only.
  """
  if mode == "off":
    return y, jnp.ones((), jnp.float32)
  yc = y - _row_mean(y, mode)
  var = _row_mean(yc * yc, mode)
  return yc, jax.lax.rsqrt(var + LN_EPS)


def _ln_bwd(dyh, yh, rstd, mode):
  """VJP of yh = (y - mean) * rstd given dyh (grad w.r.t. yh).

  Shared by the edge-step and decoder backward kernels — the LN backward
  formula must not diverge between them.
  """
  if mode == "off":
    return dyh
  m1 = _row_mean(dyh, mode)
  m2 = _row_mean(dyh * yh, mode)
  return rstd * (dyh - m1 - yh * m2)


def _fused_edge_kernel(block_of, first_of, *refs, cs, bn, has_we,
                       write_eout, embed, ln_stats, cs_full):
  c = pl.program_id(0)
  it = iter(refs)
  e_ref = next(it)
  gs_ref = next(it)
  maskt_ref = next(it)
  gr_ref = next(it)
  if embed:
    # e rows are RAW edge features [cs, F]: embed MLP + parameter-free LN
    # run in-kernel (no [E, latent] embedded constant in HBM).
    ew0_ref = next(it)
    eb0_ref = next(it)
    ew1_ref = next(it)
    eb1_ref = next(it)
  if has_we:
    we_ref = next(it)
    b0_ref = next(it)
  w1_ref = next(it)
  b1_ref = next(it)
  scale_ref = next(it)
  off_ref = next(it)
  eout_ref = next(it) if write_eout else None
  agg_ref = next(it)

  @pl.when(first_of[c] == 1)
  def _init():
    agg_ref[:] = jnp.zeros_like(agg_ref)

  e = e_ref[:]                                   # [cs, C] (or [cs, F])
  if embed:
    x = jax.lax.dot_general(
        e, ew0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x += eb0_ref[0][None].astype(jnp.float32)
    hh = _swish(x.astype(gs_ref.dtype))
    y0 = jax.lax.dot_general(
        hh, ew1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y0 += eb1_ref[0][None].astype(jnp.float32)
    eyc, erstd = _ln_moments(y0, ln_stats)
    e = (eyc * erstd).astype(gs_ref.dtype)
  if has_we:
    x0 = jax.lax.dot_general(
        e, we_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
  else:
    # e rows are the hoisted static first-layer part (embed(feats) @ We +
    # b0, precompute_step_statics) — no edge matmul, no extra bias.
    x0 = e.astype(jnp.float32)
  x0 += gs_ref[:].astype(jnp.float32)
  # Receiver-projection broadcast: one-hot(recv)ᵀ @ Gr_block on the MXU.
  onehot_t = _unpack_mask_rows(
      maskt_ref[0], cs, bn, mask_row_group(cs_full)).astype(gr_ref.dtype)
  x0 += jax.lax.dot_general(
      onehot_t, gr_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if has_we:
    x0 += b0_ref[0][None].astype(jnp.float32)

  # Swish in the activation dtype (the XLA path applies activations to the
  # bf16 matmul output too; bf16 halves the VPU cost of the sigmoid, which
  # profiling shows dominates this kernel).
  h = _swish(x0.astype(e.dtype))
  y = jax.lax.dot_general(
      h, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  y += b1_ref[0][None].astype(jnp.float32)

  yc, rstd = _ln_moments(y, ln_stats)
  yn = yc * rstd
  yn = yn * scale_ref[0][None].astype(jnp.float32)
  yn = yn + off_ref[0][None].astype(jnp.float32)

  if write_eout:
    eout_ref[:] = (e.astype(jnp.float32) + yn).astype(eout_ref.dtype)

  # Aggregation reuses the SAME unpacked one-hot, contracting on the edge
  # axis (onehot_tᵀ @ y on the MXU) — the second mask orientation and its
  # in-kernel unpack (the kernel is VPU-bound) are unnecessary.
  agg_ref[:] += jax.lax.dot_general(
      onehot_t, yn.astype(e.dtype), (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)


def _fused_edge_pipelined_kernel(block_of, first_of, *refs, cs, bn, has_we,
                                 write_eout, embed, ln_stats, cs_full, tc):
  """Software-pipelined forward: grid step g runs chunk g-1's TAIL
  (swish → w1 → LayerNorm → residual/aggregation — the VPU-heavy half)
  and chunk g's HEAD (the first factored linear — MXU-heavy) in one kernel
  body with no data dependence between them, so Mosaic can overlap the
  VPU chain against the MXU matmuls that the plain kernel serializes
  behind it (measured 4.68 ms/step vs a ~2.6 ms MXU bound at
  0.25°/mesh-6). Grid is (tc + 1,); the head's intermediates (x0 in the
  activation dtype, the unpacked one-hot, and the post-embed edge rows
  when needed) carry to the next grid step in VMEM scratch. Numerics are
  bit-identical to _fused_edge_kernel: the same ops run in the same
  dtypes, one grid step later."""
  g = pl.program_id(0)
  it = iter(refs)
  e_ref = next(it)
  gs_ref = next(it)
  maskt_ref = next(it)
  gr_ref = next(it)
  if embed:
    ew0_ref = next(it)
    eb0_ref = next(it)
    ew1_ref = next(it)
    eb1_ref = next(it)
  if has_we:
    we_ref = next(it)
    b0_ref = next(it)
  w1_ref = next(it)
  b1_ref = next(it)
  scale_ref = next(it)
  off_ref = next(it)
  eout_ref = next(it) if write_eout else None
  agg_ref = next(it)
  x0_scr = next(it)
  oh_scr = next(it)
  e_scr = next(it) if write_eout else None

  # ---- tail of chunk g-1 (reads last step's scratch) ----
  @pl.when(jnp.logical_and(g > 0, first_of[jnp.maximum(g - 1, 0)] == 1))
  def _init_agg():
    agg_ref[:] = jnp.zeros_like(agg_ref)

  @pl.when(g > 0)
  def _tail():
    xd = x0_scr[:]                                  # [cs, C] act dtype
    h = _swish(xd)
    y = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y += b1_ref[0][None].astype(jnp.float32)
    yc, rstd = _ln_moments(y, ln_stats)
    yn = yc * rstd
    yn = yn * scale_ref[0][None].astype(jnp.float32)
    yn = yn + off_ref[0][None].astype(jnp.float32)
    if write_eout:
      eout_ref[:] = (e_scr[:].astype(jnp.float32) + yn).astype(eout_ref.dtype)
    agg_ref[:] += jax.lax.dot_general(
        oh_scr[:], yn.astype(oh_scr.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  # ---- head of chunk g (writes scratch for the next step) ----
  @pl.when(g < tc)
  def _head():
    e = e_ref[:]
    if embed:
      x = jax.lax.dot_general(
          e, ew0_ref[:], (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
      x += eb0_ref[0][None].astype(jnp.float32)
      hh = _swish(x.astype(gs_ref.dtype))
      y0 = jax.lax.dot_general(
          hh, ew1_ref[:], (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
      y0 += eb1_ref[0][None].astype(jnp.float32)
      eyc, erstd = _ln_moments(y0, ln_stats)
      e = (eyc * erstd).astype(gs_ref.dtype)
    if has_we:
      x0 = jax.lax.dot_general(
          e, we_ref[:], (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
    else:
      x0 = e.astype(jnp.float32)
    x0 += gs_ref[:].astype(jnp.float32)
    onehot_t = _unpack_mask_rows(
        maskt_ref[0], cs, bn, mask_row_group(cs_full)).astype(gr_ref.dtype)
    x0 += jax.lax.dot_general(
        onehot_t, gr_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if has_we:
      x0 += b0_ref[0][None].astype(jnp.float32)
    # Same downcast point as the plain kernel (swish runs in the
    # activation dtype there too) — the scratch carries no extra rounding.
    x0_scr[:] = x0.astype(x0_scr.dtype)
    oh_scr[:] = onehot_t
    if write_eout:
      e_scr[:] = e


def _fused_edge_bwd_kernel(block_of, first_of, *refs, cs, bn, has_we,
                           write_eout, embed, ln_stats, cs_full):
  """Backward of _fused_edge_kernel: recompute the chunk's forward pipeline
  from its inputs, then emit all input/param grads in the same single HBM
  pass. Weight grads accumulate in constant-index f32 output blocks (the TPU
  grid is sequential); dgr flushes per node block exactly like the forward
  aggregation. offset is not an input (it only contributes doff = Σ dyn),
  but b1 is: LayerNorm is over channels, so the per-channel bias does NOT
  cancel out of yh. With ``embed`` the chunk's embed MLP + parameter-free LN
  chain is recomputed and differentiated in-kernel too (dew0/deb0/dew1/deb1
  accumulators; de then holds the raw-feature grads)."""
  c = pl.program_id(0)
  it = iter(refs)
  e_ref = next(it)
  gs_ref = next(it)
  maskt_ref = next(it)
  gr_ref = next(it)
  if embed:
    ew0_ref = next(it)
    eb0_ref = next(it)
    ew1_ref = next(it)
    eb1_ref = next(it)
  if has_we:
    we_ref = next(it)
    b0_ref = next(it)
  w1_ref = next(it)
  b1_ref = next(it)
  scale_ref = next(it)
  deout_ref = next(it) if write_eout else None
  dagg_ref = next(it)
  de_ref = next(it)
  dgs_ref = next(it)
  dgr_ref = next(it)
  if embed:
    dew0_ref = next(it)
    deb0_ref = next(it)
    dew1_ref = next(it)
    deb1_ref = next(it)
  if has_we:
    dwe_ref = next(it)
    db0_ref = next(it)
  dw1_ref = next(it)
  db1_ref = next(it)
  dscale_ref = next(it)
  doff_ref = next(it)

  @pl.when(c == 0)
  def _init_weight_accums():
    if embed:
      dew0_ref[:] = jnp.zeros_like(dew0_ref)
      deb0_ref[:] = jnp.zeros_like(deb0_ref)
      dew1_ref[:] = jnp.zeros_like(dew1_ref)
      deb1_ref[:] = jnp.zeros_like(deb1_ref)
    if has_we:
      dwe_ref[:] = jnp.zeros_like(dwe_ref)
      db0_ref[:] = jnp.zeros_like(db0_ref)
    dw1_ref[:] = jnp.zeros_like(dw1_ref)
    db1_ref[:] = jnp.zeros_like(db1_ref)
    dscale_ref[:] = jnp.zeros_like(dscale_ref)
    doff_ref[:] = jnp.zeros_like(doff_ref)

  @pl.when(first_of[c] == 1)
  def _init_gr():
    dgr_ref[:] = jnp.zeros_like(dgr_ref)

  dtype = gs_ref.dtype
  one = jnp.asarray(1.0, dtype)
  ef = e_ref[:]                                  # [cs, C] (or [cs, F] embed)
  onehot_t = _unpack_mask_rows(
      maskt_ref[0], ef.shape[0], bn, mask_row_group(cs_full))
  oh_d = onehot_t.astype(dtype)

  # --- forward recompute (mirrors _fused_edge_kernel) ---
  if embed:
    xe = jax.lax.dot_general(
        ef, ew0_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xe += eb0_ref[0][None].astype(jnp.float32)
    xe_d = xe.astype(dtype)
    sig_e = one / (one + jnp.exp(-xe_d))
    hh = xe_d * sig_e
    y0 = jax.lax.dot_general(
        hh, ew1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y0 += eb1_ref[0][None].astype(jnp.float32)
    eyc, erstd = _ln_moments(y0, ln_stats)
    en_h = eyc * erstd                           # f32, parameter-free LN
    e = en_h.astype(dtype)
  else:
    e = ef
  if has_we:
    x0 = jax.lax.dot_general(
        e, we_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x0 += b0_ref[0][None].astype(jnp.float32)
  else:
    x0 = e.astype(jnp.float32)
  x0 += gs_ref[:].astype(jnp.float32)
  x0 += jax.lax.dot_general(
      oh_d, gr_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  xd = x0.astype(dtype)
  sig = one / (one + jnp.exp(-xd))
  h = xd * sig
  y = jax.lax.dot_general(
      h, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  y += b1_ref[0][None].astype(jnp.float32)
  yc, rstd = _ln_moments(y, ln_stats)
  yh = yc * rstd

  # --- grads ---
  # d(yn): the aggregation broadcast (agg_b = onehot_tᵀ @ yn ⇒ dyn =
  # onehot_t @ dagg, in f32: the XLA path's segment-sum VJP is an exact
  # gather) plus the edge-residual cotangent.
  dyn = jax.lax.dot_general(
      onehot_t.astype(jnp.float32), dagg_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if write_eout:
    dyn += deout_ref[:].astype(jnp.float32)
  dscale_ref[:] += jnp.sum(dyn * yh, axis=0, keepdims=True)
  doff_ref[:] += jnp.sum(dyn, axis=0, keepdims=True)
  dyh = dyn * scale_ref[0][None].astype(jnp.float32)
  dy = _ln_bwd(dyh, yh, rstd, ln_stats)
  db1_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
  dyd = dy.astype(dtype)
  dw1_ref[:] += jax.lax.dot_general(
      h, dyd, (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  dh = jax.lax.dot_general(
      dyd, w1_ref[:], (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  # swish'(x) = σ(x)·(1 + x·(1−σ(x)))
  ds = sig + xd * sig * (one - sig)
  dx0 = dh * ds.astype(jnp.float32)
  dxd = dx0.astype(dtype)
  dgs_ref[:] = dxd.astype(dgs_ref.dtype)
  dgr_ref[:] += jax.lax.dot_general(
      oh_d, dxd, (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if has_we:
    dwe_ref[:] += jax.lax.dot_general(
        e, dxd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.sum(dx0, axis=0, keepdims=True)
    de = jax.lax.dot_general(
        dxd, we_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
  else:
    de = dx0
  if write_eout:
    de = de + deout_ref[:].astype(jnp.float32)
  if embed:
    # Backward through the in-kernel embed chain: de is the grad w.r.t. the
    # embedded latent en = LN₀(hh @ Ew1 + eb1); LN₀ is parameter-free.
    dy0 = _ln_bwd(de, en_h, erstd, ln_stats)
    deb1_ref[:] += jnp.sum(dy0, axis=0, keepdims=True)
    dy0d = dy0.astype(dtype)
    dew1_ref[:] += jax.lax.dot_general(
        hh, dy0d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhh = jax.lax.dot_general(
        dy0d, ew1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dse = sig_e + xe_d * sig_e * (one - sig_e)
    dxe = dhh * dse.astype(jnp.float32)
    dxed = dxe.astype(dtype)
    dew0_ref[:] += jax.lax.dot_general(
        ef, dxed, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    deb0_ref[:] += jnp.sum(dxe, axis=0, keepdims=True)
    de = jax.lax.dot_general(
        dxed, ew0_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
  de_ref[:] = de.astype(de_ref.dtype)


class FusedEdgeStep:
  """Callable fused edge-update+aggregate for a fixed padded edge layout.

  Built on a padded-input BlockedSegmentSum's layout (block-major chunks).
  ``__call__(params, e_pad, nodes)`` runs one full edge step and returns
  (e_out_pad, agg[num_nodes, C]).
  """

  def __init__(self, summer: BlockedSegmentSum,
               interpret: Optional[bool] = None,
               include_edge_matmul: bool = True,
               write_edges: bool = True,
               fused_backward: bool = True,
               bwd_split: int = 1,
               ln_stats: Optional[str] = None,
               pipelined: Optional[bool] = None):
    """include_edge_matmul=False: the edge input rows are the hoisted static
    first-layer part (embed(edge_feats) @ We + b0) — skip the We matmul and
    bias. write_edges=False: no updated-edge-latent output (the grid2mesh
    encoder never reuses its edge latents; only the aggregation matters).
    Both default True = the mesh-processor step.

    fused_backward=True runs the custom VJP through the fused backward
    kernel (_fused_edge_bwd_kernel) instead of an unfused XLA recompute
    (embed mode included: the embed MLP + parameter-free LN chain is
    differentiated in-kernel). bwd_split > 1 runs the backward at
    chunk_edges/bwd_split rows per grid step (it carries ~2× the forward's
    live VMEM; split if the 16 MB scoped limit trips).

    ln_stats selects how the LayerNorm row statistics are computed inside
    the kernels: "vpu" (jnp.mean lane reductions), "mxu" (ones-matmul on
    the MXU, see _row_mean), or "off" (skip the stats — profiling ceiling
    only, wrong numerics). Default: $GC_LN_STATS or "vpu".

    pipelined runs the FORWARD through the software-pipelined kernel
    (_fused_edge_pipelined_kernel: chunk g-1's VPU-heavy tail interleaved
    with chunk g's MXU-heavy head; numerics identical). Measured on TPU
    v5e (round 4): NO speedup — mesh-kernel piece 4.48 (plain) vs 4.53 ms
    (pipelined), north star 8.671 vs 8.907 s — the core's single
    instruction stream already hides MXU latency behind dependent VPU
    work, and the extra VMEM scratch costs more than the interleave buys.
    Default: $GC_PIPELINED_EDGE, off. Kept as a measured-dead lever with
    tests. The backward is unchanged."""
    if pipelined is None:
      from graphcast_tpu.env_flags import env_flag
      pipelined = env_flag("GC_PIPELINED_EDGE")
    self.pipelined = bool(pipelined)
    self.ln_stats = _ln_stats_option(ln_stats)
    if not summer.padded_input:
      raise ValueError("FusedEdgeStep needs a padded-input BlockedSegmentSum")
    self._summer = summer
    self._interpret = interpret
    self.include_edge_matmul = include_edge_matmul
    self.write_edges = write_edges
    self.fused_backward = fused_backward
    self.bwd_split = bwd_split
    bn = summer.block_nodes
    cs = summer.chunk_edges
    if cs % 32 or bn % 32:
      raise ValueError("block sizes must be multiples of 32 for bitpacking")
    if cs % bwd_split or (cs // bwd_split) % mask_row_group(cs):
      raise ValueError(
          "bwd_split must divide chunk_edges into multiples of the mask "
          f"row group ({mask_row_group(cs)} for chunk_edges={cs}; see "
          "splash.mask_row_group)")
    tc = summer.total_chunks
    nb = summer.num_node_blocks
    if (summer.num_chunks == 0).any():
      raise ValueError(
          "every node block needs at least one edge chunk (a block with no "
          "incoming edges would leave its aggregation output unwritten)")

    # Chunk → node block map (layout is block-major: chunks of a block are
    # consecutive; agg output flushes on block change).
    chunk_base = summer.chunk_base           # [nb]
    block_of = summer.block_of_chunk()
    first_of = np.zeros(tc, np.int32)
    first_of[chunk_base[chunk_base < tc]] = 1
    first_of[0] = 1
    self.block_of = block_of
    self.first_of = first_of
    # Scalar maps for the (possibly split) backward grid: sub-chunk i of
    # chunk c keeps c's block; only c's FIRST sub-chunk may init dgr.
    self.bwd_block_of = np.repeat(block_of, bwd_split).astype(np.int32)
    fob = np.zeros(tc * bwd_split, np.int32)
    fob[np.arange(tc) * bwd_split] = first_of
    self.bwd_first_of = fob

    # Per-chunk one-hot membership masks, bitpacked in both orientations
    # (shared with the plain aggregation kernel).
    self.mask, self.mask_t = summer.onehot_masks()

    # Padded-layout receiver rows into the [nb*bn] block-padded node space
    # (padding slots → nb*bn, out of range ⇒ dropped). Used by the VJP.
    rloc = summer.receivers_layout.reshape(tc, cs).astype(np.int64)
    node_base = summer.node_base[block_of].astype(np.int64)  # [tc]
    local = rloc - node_base[:, None]                        # pad → huge
    glob = local + (block_of.astype(np.int64) * bn)[:, None]
    glob = np.where((local >= 0) & (local < bn), glob, nb * bn)
    self.glob_recv_rows = glob.reshape(-1).astype(np.int32)

  @property
  def summer(self) -> BlockedSegmentSum:
    return self._summer

  def pad_nodes(self, x):
    """[num_nodes, C] → [nb*bn, C] zero-padded (blocks are contiguous node
    ranges, so row v of the padded array is node v for v < num_nodes; with
    the summer's ``node_order``, row p is node node_order[p])."""
    s = self._summer
    if s.node_order is not None:
      x = jnp.take(x, jnp.asarray(s.node_order), axis=0)
    total = s.num_node_blocks * s.block_nodes
    return jnp.pad(x, ((0, total - x.shape[0]), (0, 0)))

  def host_masks(self):
    """(mask, mask_t) numpy arrays for threading as jit args (e.g. via the
    model's graph_statics) so they do not inline as HLO constants."""
    return self.mask, self.mask_t

  def __call__(self, e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset,
               masks=None, embed_weights=None):
    """One fused edge step.

    Args:
      e_pad: [L, C] edge latents in padded layout (activation dtype). With
        ``include_edge_matmul=False`` these rows are the hoisted static
        first-layer part instead (embed(feats) @ We + b0).
      gs: [L, C] sender projections gathered to edges.
      gr_pad: [nb*bn, C] receiver projections, block-padded nodes.
      we: [C, C] edge part of the first linear layer; b0: [C]. Pass None
        with ``include_edge_matmul=False``.
      w1: [C, C] second linear layer; b1: [C].
      scale/offset: [C] LayerNorm affine params.
      masks: optional (mask, mask_t) DEVICE arrays (see :meth:`host_masks`)
        — pass as jit args so the bitpacked masks (tens of MB at 0.25°) do
        not inline into the HLO. Default: inline constants.
      embed_weights: optional (ew0, eb0, ew1, eb1) — run the edge-embed MLP
        + parameter-free LN in-kernel on RAW features (e_pad then holds
        [L, F] features), so the [E, latent] embedded constant never
        occupies HBM. Requires include_edge_matmul.

    Returns:
      (e_out [L, C] = e + y, agg [num_nodes, C] f32 sums of y), or just
      agg with ``write_edges=False``.
    """
    if not self.include_edge_matmul:
      we = jnp.zeros((0,)) if we is None else we
      b0 = jnp.zeros((0,)) if b0 is None else b0
    if embed_weights is not None and not self.include_edge_matmul:
      raise ValueError("embed_in_kernel requires include_edge_matmul")
    out = _fused_edge_step(e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset,
                           masks, embed_weights, _StepHolder(self),
                           self._interpret)
    if self._summer.node_order is not None:
      # agg rows are layout positions; map back to node ids (outside the
      # custom VJP so autodiff threads the permutation).
      pos = jnp.asarray(self._summer.node_pos)
      if self.write_edges:
        eout, agg = out
        return eout, jnp.take(agg, pos, axis=0)
      return jnp.take(out, pos, axis=0)
    return out

  # --- implementations ---

  def _forward(self, e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset,
               masks, embed_weights, interpret):
    s = self._summer
    cs, bn = s.chunk_edges, s.block_nodes
    tc, nb = s.total_chunks, s.num_node_blocks
    L, F = e_pad.shape
    C = gs.shape[-1]
    if L != s.layout_length:
      raise ValueError(f"expected {s.layout_length} padded rows, got {L}")
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    dtype = gs.dtype

    def row(x):  # [C] params → [1, C] blocks
      return x.reshape(1, C)

    ln_stats = _ln_stats_for(self.ln_stats, C)
    pipe = self.pipelined
    if pipe:
      kernel = functools.partial(
          _fused_edge_pipelined_kernel, cs=cs, bn=bn, cs_full=cs, tc=tc,
          has_we=self.include_edge_matmul, write_eout=self.write_edges,
          embed=embed_weights is not None, ln_stats=ln_stats)
      # Head stage (inputs) reads chunk g, tail stage (outputs) writes
      # chunk g-1; one trailing grid step drains the pipeline.
      hi = lambda c: jnp.minimum(c, tc - 1)       # noqa: E731
      ti = lambda c: jnp.maximum(c - 1, 0)        # noqa: E731
    else:
      kernel = functools.partial(
          _fused_edge_kernel, cs=cs, bn=bn, cs_full=cs,
          has_we=self.include_edge_matmul, write_eout=self.write_edges,
          embed=embed_weights is not None, ln_stats=ln_stats)
      hi = ti = lambda c: c                       # noqa: E731
    in_specs = [
        pl.BlockSpec((cs, F), lambda c, bo, fo: (hi(c), 0)),   # e / ef
        pl.BlockSpec((cs, C), lambda c, bo, fo: (hi(c), 0)),   # gs
        pl.BlockSpec((1, cs // 32, bn),
                     lambda c, bo, fo: (hi(c), 0, 0)),         # maskt
        pl.BlockSpec((bn, C), lambda c, bo, fo: (bo[hi(c)], 0)),  # gr
    ]
    # Only the [cs, bn] orientation is needed: the aggregation contracts it
    # transposed on the MXU (the (mask, mask_t) tuple interface is kept for
    # the graph_statics plumbing shared with BlockedSegmentSum).
    mask_t = masks[1] if masks is not None else jnp.asarray(self.mask_t)
    args = [e_pad.astype(dtype), gs.astype(dtype), mask_t,
            gr_pad.astype(dtype)]
    if embed_weights is not None:
      ew0, eb0, ew1, eb1 = embed_weights
      in_specs += [
          pl.BlockSpec((F, C), lambda c, bo, fo: (0, 0)),      # ew0
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # eb0
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # ew1
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # eb1
      ]
      args += [ew0.astype(dtype), row(eb0), ew1.astype(dtype), row(eb1)]
    if self.include_edge_matmul:
      in_specs += [
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # we
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # b0
      ]
      args += [we.astype(dtype), row(b0)]
    in_specs += [
        pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),        # w1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # b1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # scale
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # off
    ]
    args += [w1.astype(dtype), row(b1), row(scale), row(offset)]
    out_specs = []
    out_shape = []
    if self.write_edges:
      out_specs.append(pl.BlockSpec((cs, C), lambda c, bo, fo: (ti(c), 0)))
      out_shape.append(jax.ShapeDtypeStruct((L, C), dtype))
    out_specs.append(
        pl.BlockSpec((bn, C), lambda c, bo, fo: (bo[ti(c)], 0)))
    out_shape.append(jax.ShapeDtypeStruct((nb * bn, C), jnp.float32))
    scratch_shapes = []
    if pipe:
      scratch_shapes = [pltpu.VMEM((cs, C), dtype),   # x0 (act dtype)
                        pltpu.VMEM((cs, bn), dtype)]  # unpacked one-hot
      if self.write_edges:
        scratch_shapes.append(pltpu.VMEM((cs, C), dtype))  # post-embed e

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tc + 1,) if pipe else (tc,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(jnp.asarray(self.block_of), jnp.asarray(self.first_of), *args)
    if self.write_edges:
      eout, agg = outs
      return eout, agg[:s.num_nodes]
    (agg,) = outs
    return agg[:s.num_nodes]

  def _backward(self, e_pad, gs, gr_pad, we, b0, w1, b1, scale, d_eout,
                d_agg, masks, embed_weights, interpret):
    """Fused backward pass (see _fused_edge_bwd_kernel). Returns
    (de, dgs, dgr, dwe, db0, dw1, db1, dscale, doff[, dembed]) with
    dgr/weight grads in f32; de/dgs in the activation dtype. With
    ``embed_weights`` the dembed tail is (dew0, deb0, dew1, deb1) and de
    holds the (normally discarded) raw-feature grads."""
    s = self._summer
    cs, bn = s.chunk_edges, s.block_nodes
    tc, nb = s.total_chunks, s.num_node_blocks
    L, F = e_pad.shape
    C = gs.shape[-1]
    if interpret is None:
      interpret = jax.default_backend() != "tpu"
    dtype = gs.dtype
    embed = embed_weights is not None
    split = self.bwd_split
    csb = cs // split
    tcb = tc * split

    mask_t = masks[1] if masks is not None else jnp.asarray(self.mask_t)
    maskt_b = mask_t.reshape(tcb, csb // 32, bn)
    d_agg_pad = jnp.pad(
        d_agg.astype(jnp.float32), ((0, nb * bn - d_agg.shape[0]), (0, 0)))

    ln_stats = _ln_stats_for(self.ln_stats, C)
    kernel = functools.partial(
        _fused_edge_bwd_kernel, cs=csb, bn=bn, cs_full=cs,
        has_we=self.include_edge_matmul, write_eout=self.write_edges,
        embed=embed, ln_stats=ln_stats)
    in_specs = [
        pl.BlockSpec((csb, F), lambda c, bo, fo: (c, 0)),      # e / ef
        pl.BlockSpec((csb, C), lambda c, bo, fo: (c, 0)),      # gs
        pl.BlockSpec((1, csb // 32, bn),
                     lambda c, bo, fo: (c, 0, 0)),             # maskt
        pl.BlockSpec((bn, C), lambda c, bo, fo: (bo[c], 0)),   # gr
    ]
    args = [e_pad.astype(dtype), gs.astype(dtype), maskt_b,
            gr_pad.astype(dtype)]

    def row(x):
      return x.reshape(1, C)

    if embed:
      ew0, eb0, ew1, eb1 = embed_weights
      in_specs += [
          pl.BlockSpec((F, C), lambda c, bo, fo: (0, 0)),      # ew0
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # eb0
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # ew1
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # eb1
      ]
      args += [ew0.astype(dtype), row(eb0), ew1.astype(dtype), row(eb1)]
    if self.include_edge_matmul:
      in_specs += [
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # we
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # b0
      ]
      args += [we.astype(dtype), row(b0)]
    in_specs += [
        pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),        # w1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # b1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # scale
    ]
    args += [w1.astype(dtype), row(b1), row(scale)]
    if self.write_edges:
      in_specs.append(pl.BlockSpec((csb, C), lambda c, bo, fo: (c, 0)))
      args.append(d_eout)
    in_specs.append(pl.BlockSpec((bn, C), lambda c, bo, fo: (bo[c], 0)))
    args.append(d_agg_pad)

    out_specs = [
        pl.BlockSpec((csb, F), lambda c, bo, fo: (c, 0)),      # de
        pl.BlockSpec((csb, C), lambda c, bo, fo: (c, 0)),      # dgs
        pl.BlockSpec((bn, C), lambda c, bo, fo: (bo[c], 0)),   # dgr
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, F), e_pad.dtype),
        jax.ShapeDtypeStruct((L, C), gs.dtype),
        jax.ShapeDtypeStruct((nb * bn, C), jnp.float32),
    ]
    if embed:
      out_specs += [
          pl.BlockSpec((F, C), lambda c, bo, fo: (0, 0)),      # dew0
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # deb0
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # dew1
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # deb1
      ]
      out_shape += [jax.ShapeDtypeStruct((F, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32),
                    jax.ShapeDtypeStruct((C, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32)]
    if self.include_edge_matmul:
      out_specs += [
          pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),      # dwe
          pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),      # db0
      ]
      out_shape += [jax.ShapeDtypeStruct((C, C), jnp.float32),
                    jax.ShapeDtypeStruct((1, C), jnp.float32)]
    out_specs += [
        pl.BlockSpec((C, C), lambda c, bo, fo: (0, 0)),        # dw1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # db1
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # dscale
        pl.BlockSpec((1, C), lambda c, bo, fo: (0, 0)),        # doff
    ]
    out_shape += [jax.ShapeDtypeStruct((C, C), jnp.float32)] + [
        jax.ShapeDtypeStruct((1, C), jnp.float32)] * 3

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tcb,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(jnp.asarray(self.bwd_block_of), jnp.asarray(self.bwd_first_of), *args)
    it = iter(outs)
    de, dgs, dgr = next(it), next(it), next(it)
    dembed = None
    if embed:
      dembed = (next(it), next(it), next(it), next(it))
    dwe = next(it) if self.include_edge_matmul else None
    db0 = next(it) if self.include_edge_matmul else None
    dw1, db1, dscale, doff = next(it), next(it), next(it), next(it)
    return de, dgs, dgr, dwe, db0, dw1, db1, dscale, doff, dembed

  def _reference_math(self, e_pad, gs, gr_pad, we, b0, w1, b1, scale,
                      offset, embed_weights=None):
    """The same pipeline in plain XLA (used by the VJP; also the ground
    truth in tests)."""
    s = self._summer
    dtype = gs.dtype
    glob = jnp.asarray(self.glob_recv_rows)
    zero = jnp.zeros((1, gr_pad.shape[-1]), gr_pad.dtype)
    gr_rows = jnp.concatenate([gr_pad, zero], axis=0)[
        jnp.minimum(glob, gr_pad.shape[0])]
    if embed_weights is not None:
      ew0, eb0, ew1, eb1 = embed_weights
      x = (e_pad.astype(dtype).astype(jnp.float32)
           @ ew0.astype(dtype).astype(jnp.float32)
           + eb0.astype(dtype).astype(jnp.float32)[None])
      hh = _swish(x.astype(dtype))
      y0 = (hh.astype(jnp.float32) @ ew1.astype(dtype).astype(jnp.float32)
            + eb1.astype(dtype).astype(jnp.float32)[None])
      emean = jnp.mean(y0, axis=-1, keepdims=True)
      evar = jnp.mean(jnp.square(y0 - emean), axis=-1, keepdims=True)
      e_pad = ((y0 - emean) * jax.lax.rsqrt(evar + LN_EPS)).astype(dtype)
    if self.include_edge_matmul:
      x0 = (e_pad.astype(jnp.float32) @ we.astype(jnp.float32)
            + gs.astype(jnp.float32) + gr_rows.astype(jnp.float32)
            + b0.astype(jnp.float32)[None])
    else:
      x0 = (e_pad.astype(jnp.float32) + gs.astype(jnp.float32)
            + gr_rows.astype(jnp.float32))
    h = _swish(x0.astype(dtype))
    y = h.astype(jnp.float32) @ w1.astype(jnp.float32)
    y = y + b1.astype(jnp.float32)[None]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    yn = (y - mean) * jax.lax.rsqrt(var + LN_EPS)
    yn = yn * scale.astype(jnp.float32)[None]
    yn = yn + offset.astype(jnp.float32)[None]
    agg = jax.ops.segment_sum(
        yn.astype(dtype).astype(jnp.float32), glob,
        num_segments=s.num_node_blocks * s.block_nodes + 1)
    if not self.write_edges:
      return agg[:s.num_nodes]
    eout = (e_pad.astype(jnp.float32) + yn).astype(dtype)
    return eout, agg[:s.num_nodes]


class _StepHolder:
  """Hashable wrapper for custom_vjp static args."""

  def __init__(self, step: FusedEdgeStep):
    self.step = step

  def __hash__(self):
    return id(self.step)

  def __eq__(self, other):
    return isinstance(other, _StepHolder) and other.step is self.step


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _fused_edge_step(e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset,
                     masks, embed_weights, holder, interpret):
  return holder.step._forward(e_pad, gs, gr_pad, we, b0, w1, b1, scale,
                              offset, masks, embed_weights, interpret)


def _fes_fwd(e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset, masks,
             embed_weights, holder, interpret):
  out = holder.step._forward(e_pad, gs, gr_pad, we, b0, w1, b1, scale,
                             offset, masks, embed_weights, interpret)
  # masks ride in the residuals so the backward kernel's bitpacked mask
  # arrives as a jit arg, not an HLO constant (rig rule 8).
  return out, (e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset, masks,
               embed_weights)


def _fes_bwd(holder, interpret, residuals, grads):
  step = holder.step
  (e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset, masks,
   embed_weights) = residuals
  if not step.fused_backward:
    # Exact backward via XLA autodiff of the reference math (recompute) —
    # the opt-out fallback.
    _, vjp = jax.vjp(
        lambda *args: step._reference_math(*args),
        e_pad, gs, gr_pad, we, b0, w1, b1, scale, offset, embed_weights)
    g = vjp(grads)
    # Cotangent order must match the primal args: ..., masks (int arrays →
    # None), embed_weights.
    return g[:9] + (None, g[9])

  if step.write_edges:
    d_eout, d_agg = grads
  else:
    d_eout, d_agg = None, grads
  de, dgs, dgr, dwe, db0, dw1, db1, dscale, doff, dembed = step._backward(
      e_pad, gs, gr_pad, we, b0, w1, b1, scale, d_eout, d_agg, masks,
      embed_weights, interpret)
  has_we = step.include_edge_matmul
  if dembed is not None:
    ew0, eb0, ew1, eb1 = embed_weights
    dembed = (dembed[0].astype(ew0.dtype), dembed[1][0].astype(eb0.dtype),
              dembed[2].astype(ew1.dtype), dembed[3][0].astype(eb1.dtype))
  return (de.astype(e_pad.dtype), dgs.astype(gs.dtype),
          dgr.astype(gr_pad.dtype),
          dwe.astype(we.dtype) if has_we else jnp.zeros_like(we),
          db0[0].astype(b0.dtype) if has_we else jnp.zeros_like(b0),
          dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
          dscale[0].astype(scale.dtype), doff[0].astype(offset.dtype),
          None, dembed)


_fused_edge_step.defvjp(_fes_fwd, _fes_bwd)
