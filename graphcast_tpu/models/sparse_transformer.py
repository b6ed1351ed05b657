"""Sparse transformer over mesh nodes (reference: sparse_transformer.py).

Pre-LN transformer with graph-sparse attention mask = adj^attention_k_hop,
norm-conditioned on the diffusion noise level. Three attention backends
(reference: sparse_transformer.py:144-321):

- "splash_mha": our own Pallas TPU block-sparse flash-attention kernel over
  the RCM-banded mask (graphcast_tpu/ops/splash.py);
- "triblockdiag_mha": banded dense attention computing only the
  diagonal/super/sub blocks after RCM permutation, with a streaming softmax
  over the three blocks — portable XLA;
- "mha": dense O(N²) attention for small meshes.

Softmax/logits always accumulate in float32 regardless of activation dtype
(subsumes the reference's reduce_precision guard,
sparse_transformer_utils.py:24-76, with strictly better numerics).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphcast_tpu.nn import core


@dataclasses.dataclass(frozen=True, eq=True)
class SparseTransformerConfig:
  """Mirrors the reference config (denoiser.py:124-154).

  Field notes:
  - ``block_q/block_kv`` tile the forward splash kernel;
    ``block_q_dkv/block_kv_dkv`` independently tile the backward kernels
    (a second block map is compiled when they differ).
  - ``mask_type`` and the ``*_compute`` sub-tiling fields exist only for
    reference checkpoint-schema compatibility (they are serialized inside
    GenCast CheckPoint bundles): our kernel always compiles the mask to
    block maps with bitpacked partial-block bitmaps — a strict superset of
    the reference's 'lazy' mask protocol — and streams whole kv blocks, so
    these fields have no effect here.
  """
  attention_k_hop: int
  d_model: int
  num_layers: int = 16
  num_heads: int = 4
  attention_type: str = "splash_mha"
  mask_type: str = "lazy"
  # 512×512 tiles + BFS-patch node ordering measured fastest at
  # 0.25°/mesh-6/k-hop-16 (195 ms/16 layers vs 288 ms at the reference's
  # 1024×512 + RCM bands: ~2× fewer covered tiles; the kernel is
  # VPU-softmax-bound so time tracks covered tile elements). Smaller tiles
  # reduce coverage further but lose more to per-step overhead (512×256
  # measured 362 ms).
  block_q: int = 512
  block_kv: int = 512
  block_kv_compute: int = 256
  block_q_dkv: int = 512
  block_kv_dkv: int = 1024
  block_kv_dkv_compute: int = 1024
  ffw_winit_mult: float = 2.0
  ffw_winit_final_mult: float = 0.0
  attn_winit_mult: float = 2.0
  attn_winit_final_mult: float = 0.0
  ffw_hidden: int = 2048
  activation: str = "gelu"
  # Mesh-node ordering used when the owning model builds its artifact:
  # "rcm" (reference-style bands) or "patch" (BFS patches of block_q nodes
  # aligned to the attention tiles — ~2× fewer active splash tiles on big
  # k-hop masks; see geometry.artifact.patch_permutation). Not part of the
  # reference schema; loaders default it when absent from a checkpoint.
  node_ordering: str = "patch"

  @property
  def key_size(self) -> int:
    if self.d_model % self.num_heads:
      raise ValueError("num_heads must divide d_model")
    return self.d_model // self.num_heads

  @property
  def value_size(self) -> int:
    return self.key_size


# ---------------------------------------------------------------------------
# Host-side mask preparation.
# ---------------------------------------------------------------------------


def k_hop_adjacency(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int, k_hop: int) -> sp.csr_matrix:
  """Boolean adjacency^k (with self loops), the attention mask
  (reference: sparse_transformer.py:505 & transformer.py:34-57)."""
  ones = np.ones(senders.shape[0], dtype=bool)
  adj = sp.csr_matrix((ones, (senders, receivers)),
                      shape=(num_nodes, num_nodes))
  adj = adj + sp.identity(num_nodes, dtype=bool, format="csr")
  out = adj.astype(bool)
  for _ in range(k_hop - 1):
    out = ((out @ adj) != 0).astype(bool)
  return out.tocsr()


def mask_bandwidth(mask: sp.csr_matrix) -> int:
  """Max |i−j| over nonzeros (assumes RCM-permuted, near-banded mask)."""
  coo = mask.tocoo()
  if coo.nnz == 0:
    return 0
  return int(np.abs(coo.row.astype(np.int64) - coo.col).max())


def get_mask_block_size(mask: sp.csr_matrix) -> int:
  """Block size such that all mask entries fall within the tri-block
  diagonals (reference: sparse_transformer.py:92-103). bandwidth+1 blocks of
  this size guarantee coverage of the band."""
  return mask_bandwidth(mask) + 1


def build_triblock_masks(mask: sp.csr_matrix, block_size: int
                         ) -> tuple[np.ndarray, int]:
  """Returns ([3, num_blocks, block, block] bool (diag, upper, lower),
  num_padding_nodes).

  Sparse-native: scatters straight from the nonzero coordinates in O(nnz)
  host memory — no [padded, padded] densify (the reference slices per-block
  from the sparse matrix for the same reason, sparse_transformer.py:332-366;
  a dense build is ~1.7 GB at mesh-6 and 27 GB at mesh-7). The tri-block
  band check is a per-coordinate block-offset assertion instead of an
  O(N²) coverage array."""
  n = mask.shape[0]
  padded = int(np.ceil(n / block_size) * block_size)
  num_padding = padded - n
  num_blocks = padded // block_size
  coo = mask.tocoo()
  keep = coo.data.astype(bool)
  rows = coo.row[keep].astype(np.int64)
  cols = coo.col[keep].astype(np.int64)
  qb = rows // block_size
  kb = cols // block_size
  diff = kb - qb
  if diff.size and int(np.abs(diff).max()) > 1:
    raise ValueError("mask has entries outside the tri-block band; "
                     "increase block_size")
  out = np.zeros((3, num_blocks, block_size, block_size), dtype=bool)
  # Band index: 0 = diag (kb == qb), 1 = upper (kb == qb+1), 2 = lower.
  band = np.where(diff == 0, 0, np.where(diff == 1, 1, 2))
  out[band, qb, rows % block_size, cols % block_size] = True
  return out, num_padding


# ---------------------------------------------------------------------------
# Attention backends.
# ---------------------------------------------------------------------------


def _mh_linear(params, x, num_heads, head_size):
  """[..., d] → [..., heads, head_size] projection without bias."""
  out = x @ params["w"].astype(x.dtype)
  return out.reshape(out.shape[:-1] + (num_heads, head_size))


def dense_mha(params, cfg: SparseTransformerConfig, x, mask):
  """O(N²) masked attention; logits/softmax in f32
  (reference: sparse_transformer.py:209-242)."""
  q = _mh_linear(params["mha_proj_q"], x, cfg.num_heads, cfg.key_size)
  k = _mh_linear(params["mha_proj_k"], x, cfg.num_heads, cfg.key_size)
  v = _mh_linear(params["mha_proj_v"], x, cfg.num_heads, cfg.value_size)
  logits = jnp.einsum("bthd,bThd->bhtT", q, k,
                      preferred_element_type=jnp.float32)
  logits = logits * (cfg.key_size ** -0.5)
  logits = jnp.where(mask[None, None], logits, -1e30)
  weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
  out = jnp.einsum("bhtT,bThd->bthd", weights, v)
  out = out.reshape(out.shape[:-2] + (cfg.num_heads * cfg.value_size,))
  lin = core.Linear(cfg.num_heads * cfg.value_size, cfg.d_model)
  return lin.apply(params["mha_final"], out)


def triblockdiag_mha(params, cfg: SparseTransformerConfig, x, masks,
                     num_nodes: int, num_padding: int, block_size: int):
  """Banded attention over (diag, upper, lower) blocks with a streaming
  softmax across the three (reference: sparse_transformer.py:116-189).

  x: [batch, num_nodes, d]; masks: [3, num_blocks, block, block] bool.
  """
  b = x.shape[0]
  x = jnp.pad(x, ((0, 0), (0, num_padding), (0, 0)))
  num_blocks = x.shape[1] // block_size
  xb = x.reshape(b, num_blocks, block_size, x.shape[-1])

  q = _mh_linear(params["mha_proj_q"], xb, cfg.num_heads, cfg.key_size)
  k = _mh_linear(params["mha_proj_k"], xb, cfg.num_heads, cfg.key_size)
  v = _mh_linear(params["mha_proj_v"], xb, cfg.num_heads, cfg.value_size)

  k = jnp.pad(k, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
  v = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

  def qk(queries, keys):
    return jnp.einsum("bnqhd,bnkhd->bnhqk", queries, keys,
                      preferred_element_type=jnp.float32)

  scale = cfg.key_size ** -0.5
  logits_d = qk(q, k[:, 1:-1]) * scale
  logits_u = qk(q, k[:, 2:]) * scale
  logits_l = qk(q, k[:, :-2]) * scale

  m_d, m_u, m_l = masks[0], masks[1], masks[2]
  neg = jnp.float32(-1e30)
  logits_d = jnp.where(m_d[None, :, None], logits_d, neg)
  logits_u = jnp.where(m_u[None, :, None], logits_u, neg)
  logits_l = jnp.where(m_l[None, :, None], logits_l, neg)

  # Streaming softmax over the three block diagonals, in f32.
  m = jnp.maximum(jnp.maximum(
      jax.lax.stop_gradient(logits_d.max(-1, keepdims=True)),
      jax.lax.stop_gradient(logits_u.max(-1, keepdims=True))),
      jax.lax.stop_gradient(logits_l.max(-1, keepdims=True)))
  e_d = jnp.exp(logits_d - m)
  e_u = jnp.exp(logits_u - m)
  e_l = jnp.exp(logits_l - m)
  denom = (e_d.sum(-1, keepdims=True) + e_u.sum(-1, keepdims=True)
           + e_l.sum(-1, keepdims=True))
  w_d = (e_d / denom).astype(x.dtype)
  w_u = (e_u / denom).astype(x.dtype)
  w_l = (e_l / denom).astype(x.dtype)

  def av(weights, values):
    return jnp.einsum("bnhqk,bnkhd->bnqhd", weights, values)

  out = av(w_d, v[:, 1:-1]) + av(w_u, v[:, 2:]) + av(w_l, v[:, :-2])
  out = out.reshape(b, num_blocks * block_size,
                    cfg.num_heads * cfg.value_size)
  lin = core.Linear(cfg.num_heads * cfg.value_size, cfg.d_model)
  out = lin.apply(params["mha_final"], out)
  return out[:, :num_nodes]


# ---------------------------------------------------------------------------
# Transformer blocks.
# ---------------------------------------------------------------------------


def _variance_scaling_stddev(scale: float, fan_in: int) -> float:
  # hk.initializers.VarianceScaling(scale) with truncated_normal divides the
  # stddev by the truncation factor so the sample stddev is sqrt(scale/fan_in)
  # exactly; pre-divide here since core.truncated_normal does not correct.
  return (math.sqrt(max(scale, 1e-30) / max(fan_in, 1))
          / core.TRUNCATED_NORMAL_STDDEV_FACTOR)


class Transformer:
  """Functional transformer over mesh nodes.

  Built from a (host, scipy-sparse) adjacency matrix; prepares the static
  k-hop mask per attention backend once at construction.
  """

  def __init__(self, adjacency: sp.csr_matrix, cfg: SparseTransformerConfig,
               interpret: Optional[bool] = None):
    self.cfg = cfg
    mask = k_hop_adjacency_from_matrix(adjacency, cfg.attention_k_hop)
    self._num_nodes = mask.shape[0]
    self._interpret = interpret
    self._splash_sp = None
    if cfg.attention_type == "mha":
      self._dense_mask = mask.toarray()
    elif cfg.attention_type == "triblockdiag_mha":
      block_size = get_mask_block_size(mask)
      self._block_size = block_size
      self._triblock_masks, self._num_padding = build_triblock_masks(
          mask, block_size)
    elif cfg.attention_type == "splash_mha":
      from graphcast_tpu.ops import splash
      self._splash = splash.BlockSparseAttention.from_mask(
          mask, block_q=cfg.block_q, block_kv=cfg.block_kv,
          block_q_dkv=cfg.block_q_dkv, block_kv_dkv=cfg.block_kv_dkv,
          interpret=interpret)
    else:
      raise ValueError(f"unknown attention_type {cfg.attention_type}")

  # ----- params -----

  def _block_param_specs(self):
    cfg = self.cfg
    qk_out = cfg.num_heads * cfg.key_size
    v_out = cfg.num_heads * cfg.value_size
    attn_std = _variance_scaling_stddev(
        cfg.attn_winit_mult / cfg.num_layers, cfg.d_model)
    attn_final_std = _variance_scaling_stddev(
        cfg.attn_winit_final_mult / cfg.num_layers, v_out)
    ffw_std = _variance_scaling_stddev(
        cfg.ffw_winit_mult / cfg.num_layers, cfg.d_model)
    ffw_final_std = _variance_scaling_stddev(
        cfg.ffw_winit_final_mult / cfg.num_layers, cfg.ffw_hidden)
    return {
        "mha_proj_q": core.Linear(cfg.d_model, qk_out, with_bias=False,
                                  init_stddev=attn_std),
        "mha_proj_k": core.Linear(cfg.d_model, qk_out, with_bias=False,
                                  init_stddev=attn_std),
        "mha_proj_v": core.Linear(cfg.d_model, v_out, with_bias=False,
                                  init_stddev=attn_std),
        "mha_final": core.Linear(v_out, cfg.d_model,
                                 init_stddev=attn_final_std),
        "ffw_up": core.Linear(cfg.d_model, cfg.ffw_hidden,
                              init_stddev=ffw_std),
        "ffw_down": core.Linear(cfg.ffw_hidden, cfg.d_model,
                                init_stddev=ffw_final_std),
    }

  def init(self, key, cond_size: int) -> core.Params:
    cfg = self.cfg
    nc = core.NormConditioning(cond_size, cfg.d_model)
    params = {}
    keys = jax.random.split(key, cfg.num_layers + 1)
    specs = self._block_param_specs()
    for i in range(cfg.num_layers):
      sub = {}
      sub_keys = jax.random.split(keys[i], len(specs) + 2)
      for (name, spec), k in zip(sorted(specs.items()), sub_keys):
        sub[name] = spec.init(k)
      # Two UNSHARED norm-conditioning modules per block (attn and ffw
      # pre-norms). The reference creates LinearNormConditioning twice with
      # the same explicit name inside Block.__call__
      # (sparse_transformer.py:459-477); haiku uniquifies the second to
      # "block_XX_norm_conditioning_1" — verified against dm-haiku in
      # tests/test_reference_parity.py.
      sub["norm_conditioning"] = nc.init(sub_keys[-2])
      sub["norm_conditioning_1"] = nc.init(sub_keys[-1])
      params[f"block_{i:02d}"] = sub
    params["final_norm_conditioning"] = nc.init(keys[-1])
    self._cond_size = cond_size
    return params

  # ----- forward -----

  def enable_sequence_parallel(self, mesh, axis: str):
    """Shards the attention's node axis over ``mesh`` axis ``axis``
    (splash backend only; reference knob q_seq_shards,
    sparse_transformer.py:271-273). Re-thread kernel statics after calling
    this (host_kernel_statics changes to the per-shard maps)."""
    if self.cfg.attention_type != "splash_mha":
      raise ValueError(
          "sequence-parallel attention requires attention_type='splash_mha', "
          f"got {self.cfg.attention_type!r}")
    self._splash_sp = self._splash.sequence_parallel(mesh, axis)

  def host_kernel_statics(self):
    """Attention-kernel index/mask numpy arrays to thread as jit args
    (splash only; dense/triblock masks stay inline)."""
    if self.cfg.attention_type == "splash_mha":
      if self._splash_sp is not None:
        return self._splash_sp.host_statics()
      return self._splash.host_statics()
    return {}

  def _attend(self, params, x, kernel_statics=None):
    cfg = self.cfg
    if cfg.attention_type == "mha":
      return dense_mha(params, cfg, x, jnp.asarray(self._dense_mask))
    if cfg.attention_type == "triblockdiag_mha":
      return triblockdiag_mha(
          params, cfg, x, jnp.asarray(self._triblock_masks),
          num_nodes=self._num_nodes, num_padding=self._num_padding,
          block_size=self._block_size)
    # splash_mha
    q = _mh_linear(params["mha_proj_q"], x, cfg.num_heads, cfg.key_size)
    k = _mh_linear(params["mha_proj_k"], x, cfg.num_heads, cfg.key_size)
    v = _mh_linear(params["mha_proj_v"], x, cfg.num_heads, cfg.value_size)
    attend = self._splash_sp if self._splash_sp is not None else self._splash
    out = attend(q, k, v, scale=cfg.key_size ** -0.5,
                 statics=kernel_statics)
    out = out.reshape(out.shape[:-2] + (cfg.num_heads * cfg.value_size,))
    lin = core.Linear(cfg.num_heads * cfg.value_size, cfg.d_model)
    return lin.apply(params["mha_final"], out)

  def _ffw(self, params, x):
    cfg = self.cfg
    act = core.get_activation(cfg.activation)
    up = core.Linear(cfg.d_model, cfg.ffw_hidden)
    down = core.Linear(cfg.ffw_hidden, cfg.d_model)
    return down.apply(params["ffw_down"],
                      act(up.apply(params["ffw_up"], x)))

  def apply(self, params: core.Params, x, global_norm_conditioning,
            kernel_statics=None):
    """x: [batch, num_nodes, d_model]; conditioning: [batch, cond].
    kernel_statics: optional splash index/mask device arrays (shared by all
    layers; see host_kernel_statics)."""
    cfg = self.cfg
    ln = core.LayerNorm(cfg.d_model, create_scale=False, create_offset=False)
    cond_size = global_norm_conditioning.shape[-1]
    nc = core.NormConditioning(cond_size, cfg.d_model)
    cond = global_norm_conditioning[:, None]  # [batch, 1, cond]

    def block_fn(x, p, ks):
      h = nc.apply(p["norm_conditioning"], ln.apply({}, x), cond)
      x = x + self._attend(p, h, ks)
      h = nc.apply(p["norm_conditioning_1"], ln.apply({}, x), cond)
      return x + self._ffw(p, h)

    # Remat per block: free under pure inference (no grad), and under grad
    # it drops each block's attention/ffw residuals (~0.4 GB/layer at
    # 0.25°/mesh-6) keeping only the [nodes, d_model] block inputs — what
    # fits the GenCast training step on a 16 GB chip.
    block_fn = jax.checkpoint(block_fn)

    blocks = [params[f"block_{i:02d}"] for i in range(cfg.num_layers)]
    if cfg.num_layers > 1:
      # One traced layer, scanned over stacked per-layer params: the blocks
      # are structurally identical, so this compiles ONE attention kernel
      # instance instead of num_layers (the 0.25°/mesh-6 GenCast compile was
      # ~14 min with 32 inline splash instances). The [L, ...] stacks are
      # assembled on device from the unstacked (checkpoint-compatible)
      # param tree each call — a few MB of copies.
      stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
      x, _ = jax.lax.scan(
          lambda h, p: (block_fn(h, p, kernel_statics), None), x, stacked)
    else:
      x = block_fn(x, blocks[0], kernel_statics)

    return nc.apply(params["final_norm_conditioning"], ln.apply({}, x), cond)


def k_hop_adjacency_from_matrix(adjacency: sp.csr_matrix,
                                k_hop: int) -> sp.csr_matrix:
  """adjacency (+I) raised to the k-th boolean power."""
  n = adjacency.shape[0]
  adj = (adjacency + sp.identity(n, dtype=bool, format="csr")).astype(bool)
  out = adj.copy()
  for _ in range(k_hop - 1):
    out = ((out @ adj) != 0).astype(bool)
  return out.tocsr()
