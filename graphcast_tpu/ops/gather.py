"""Grouped two-stage row gather for big-table sender gathers.

TPU row gathers cost per-ROW with the per-row cost scaling with TABLE size
(~17.5 ns/row from a 1.06 GB table vs ~4.5 ns/row below ~42 MB —
tools/profile_gather.py). The g2m sender gather pulls 1.62M rows from the
[1.04M, 512] bf16 grid projection every step (~29 ms, the encoder's
largest piece), but the senders arrive in consecutive runs (mean ~7,
lat-major grid order): the SAME rows are covered by only ~14% as many
8-row GROUPS (tools/analyze_g2m_senders.py). This module gathers whole
groups from the big table (few, wide rows) and expands edge slots from the
small per-superchunk result (many, cheap rows).

Exactness: row ``senders[e]`` is group ``senders[e] // group`` at offset
``senders[e] % group`` — the expansion reproduces the direct gather bit
for bit (same rows, no arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.geometry.chunking import group_senders_2d


def layout_sender_groups(senders_layout: np.ndarray, group: int = 8,
                         superchunk_edges: int = 65536):
  """Host-side: group plan for a flat padded edge layout [L].

  The layout is cut into ceil(L / superchunk_edges) equal superchunks
  (padded with sender 0 — padded slots gather real rows but their values
  are dropped downstream exactly like the direct gather's padding).
  Returns (group_index [S, max_g], local_index [S, Es]).
  """
  senders_layout = np.asarray(senders_layout, np.int64)
  L = senders_layout.shape[0]
  Es = min(superchunk_edges, L)
  S = -(-L // Es)
  pad = S * Es - L
  if pad:
    senders_layout = np.concatenate(
        [senders_layout, np.zeros(pad, np.int64)])
  return group_senders_2d(senders_layout.reshape(S, Es), group)


def gather_rows_grouped(table, group_index, local_index, group: int = 8):
  """table [N, ...] → the rows ``senders`` encoded by (group_index,
  local_index), flattened to [S * Es, ...]. Bit-equal to
  ``table[senders_layout]`` (modulo padding slots, which hold row-0-group
  values in both forms and are dropped downstream).
  """
  n = table.shape[0]
  rest = table.shape[1:]
  n_pad = -(-n // group) * group
  if n_pad != n:
    table = jnp.pad(table, ((0, n_pad - n),) + ((0, 0),) * (table.ndim - 1))
  slabs = table.reshape(n_pad // group, group, *rest)
  S, Es = local_index.shape
  max_g = group_index.shape[1]

  def expand(xs):
    gi, li = xs
    grp = slabs[gi]                                 # [max_g, group, ...]
    return grp.reshape(max_g * group, *rest)[li]    # [Es, ...]

  rows = jax.lax.map(expand, (group_index, local_index))
  return rows.reshape(S * Es, *rest)
