"""GenCast denoiser (reference: graphcast/denoiser.py).

A GraphCast-shaped encode-process-decode architecture specialized for
denoising diffusion:
- the processor is a sparse transformer over the (single, finest,
  RCM-banded) mesh instead of a multi-mesh GNN;
- every LayerNorm is conditioned on an encoding of the diffusion noise
  level (norm conditioning);
- noisy targets enter as additional forcings; the noise-level encoding
  enters as a [batch, channels] input that is split out as the global
  conditioning vector.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu.fields import Field, FieldSet, from_stacked, to_stacked
from graphcast_tpu.geometry import artifact as artifact_lib
from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
from graphcast_tpu.models.transformer import MeshTransformer
from graphcast_tpu.nn import core
from graphcast_tpu.nn.deep_gnn import DeepGraphNet
from graphcast_tpu.nn.typed_graph import (
    Context, EdgeSet, EdgeSetKey, EdgesIndices, NodeSet, TypedGraph)


def fourier_features(values, base_period: float, num_frequencies: int):
  """sin/cos features at integer multiples of 1/base_period
  (reference: model_utils.py:728-757)."""
  freqs = np.arange(1, num_frequencies + 1) / base_period
  angular = jnp.asarray(2 * np.pi * freqs, values.dtype)
  phases = values[..., None] * angular
  return jnp.concatenate([jnp.cos(phases), jnp.sin(phases)], axis=-1)


@dataclasses.dataclass(frozen=True, eq=True)
class NoiseEncoderConfig:
  """Noise-level encoding config (reference: denoiser.py:100-123)."""
  apply_log_first: bool = True
  base_period: float = 16.0
  num_frequencies: int = 32
  output_sizes: tuple[int, ...] = (32, 16)


@dataclasses.dataclass(frozen=True, eq=True)
class DenoiserArchitectureConfig:
  """Reference: denoiser.py:155-196."""
  sparse_transformer_config: SparseTransformerConfig
  mesh_size: int
  latent_size: int = 512
  hidden_layers: int = 1
  radius_query_fraction_edge_length: float = 0.6
  norm_conditioning_features: tuple[str, ...] = ("noise_level_encodings",)
  grid2mesh_aggregate_normalization: Optional[float] = None
  node_output_size: Optional[int] = None


class FourierFeaturesMLP:
  """MLP over (log-)Fourier features of a scalar
  (reference: denoiser.py:41-97). Uniform variance-scaling(2.0) init."""

  def __init__(self, cfg: NoiseEncoderConfig):
    self.cfg = cfg
    sizes = [2 * cfg.num_frequencies] + list(cfg.output_sizes)
    self._layer_sizes = list(zip(sizes[:-1], sizes[1:]))

  @property
  def output_size(self) -> int:
    return self.cfg.output_sizes[-1]

  def init(self, key) -> core.Params:
    params = {}
    keys = jax.random.split(key, len(self._layer_sizes))
    for i, ((fan_in, fan_out), k) in enumerate(zip(self._layer_sizes, keys)):
      limit = math.sqrt(3.0 * 2.0 / fan_in)  # VarianceScaling(2.0, uniform)
      params[f"linear_{i}"] = {
          "w": jax.random.uniform(k, (fan_in, fan_out), jnp.float32,
                                  -limit, limit),
          "b": jnp.zeros((fan_out,), jnp.float32),
      }
    return params

  def apply(self, params: core.Params, values):
    cfg = self.cfg
    if cfg.apply_log_first:
      values = jnp.log(values)
    x = fourier_features(values, cfg.base_period, cfg.num_frequencies)
    for i in range(len(self._layer_sizes)):
      p = params[f"linear_{i}"]
      x = x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
      if i + 1 < len(self._layer_sizes):
        x = jax.nn.gelu(x)
    return x


def _add_batch_second_axis(data, batch_size):
  return jnp.broadcast_to(data[:, None, :],
                          (data.shape[0], batch_size, data.shape[-1]))


class DenoiserArchitecture:
  """Encode (GNN) → process (sparse transformer) → decode (GNN)
  (reference: denoiser.py:248-731)."""

  def __init__(self, cfg: DenoiserArchitectureConfig,
               cache_dir: Optional[str] = None,
               interpret_attention: Optional[bool] = None,
               decode_chunks: int = 1,
               encode_chunks: int = 1,
               fused_aggregation: Optional[bool] = None,
               sequence_parallel: Optional[tuple] = None):
    """decode_chunks / encode_chunks > 1 run the mesh2grid / mesh2grid GNNs
    in sequential chunks (exact math; see models/graphcast.py) — at 0.25°
    this fits the denoiser on a 16 GB chip where the reference needs 32 GB
    HBM (docs/cloud_vm_setup.md:43-44). fused_aggregation (default: on TPU)
    engages the Pallas fused encoder/decoder kernels at batch 1, with the
    norm-conditioning folded into per-eval scale/offset vectors and the
    conditioning-independent part of the edge embeds (the parameter-free-LN
    output) hoisted as a sampler-loop invariant. sequence_parallel, a
    ``(jax.sharding.Mesh, axis_name)`` pair, shards the transformer's
    mesh-node axis over that mesh axis (splash attention only; the
    reference kernel's q_seq_shards knob, sparse_transformer.py:271-273)."""
    self._cfg = cfg
    self._cache_dir = cache_dir
    self._interpret_attention = interpret_attention
    self._decode_chunks = decode_chunks
    self._encode_chunks = encode_chunks
    self._fused_aggregation = fused_aggregation
    self._sequence_parallel = sequence_parallel
    self._artifact: Optional[artifact_lib.GridMeshArtifact] = None
    self._mesh_transformer: Optional[MeshTransformer] = None
    self._g2m_plan = None
    self._g2m_summer = None
    self._g2m_fused = None
    self._g2m_window_plan = None
    self._m2g_decoder = None

    latent = cfg.latent_size
    if cfg.node_output_size is None:
      raise ValueError("node_output_size must be set (by GenCast)")

    self._grid2mesh_gnn = DeepGraphNet(
        node_latent_size={"mesh_nodes": latent, "grid_nodes": latent},
        edge_latent_size={"grid2mesh": latent},
        mlp_hidden_size=latent,
        mlp_num_hidden_layers=cfg.hidden_layers,
        num_message_passing_steps=1,
        use_layer_norm=True,
        use_norm_conditioning=True,
        norm_conditioning_size=None,  # set at init time
        activation="swish",
        f32_aggregation=True,
        aggregate_normalization=cfg.grid2mesh_aggregate_normalization)

    self._mesh2grid_gnn = DeepGraphNet(
        node_output_size={"grid_nodes": cfg.node_output_size},
        embed_nodes=False,
        node_latent_size={"mesh_nodes": latent, "grid_nodes": latent},
        edge_latent_size={"mesh2grid": latent},
        mlp_hidden_size=latent,
        mlp_num_hidden_layers=cfg.hidden_layers,
        num_message_passing_steps=1,
        use_layer_norm=True,
        use_norm_conditioning=True,
        norm_conditioning_size=None,
        activation="swish",
        f32_aggregation=False)

  def _maybe_init(self, inputs: FieldSet, cond_size: int):
    if self._artifact is None:
      coords = inputs.coords
      st_cfg = self._cfg.sparse_transformer_config
      if st_cfg.node_ordering not in ("rcm", "patch"):
        raise ValueError(f"unknown node_ordering {st_cfg.node_ordering!r}")
      self._artifact = artifact_lib.build_artifact(
          grid_lat=coords["lat"],
          grid_lon=coords["lon"],
          mesh_size=self._cfg.mesh_size,
          radius_query_fraction_edge_length=(
              self._cfg.radius_query_fraction_edge_length),
          multimesh=False,
          permute_banded=True,
          banded_patch_size=(st_cfg.block_q
                             if st_cfg.node_ordering == "patch" else None),
          cache_dir=self._cache_dir)
      art = self._artifact
      self._mesh_transformer = MeshTransformer(
          art.mesh.senders, art.mesh.receivers, art.num_mesh_nodes,
          self._cfg.sparse_transformer_config,
          interpret=self._interpret_attention)
      if self._sequence_parallel is not None:
        self._mesh_transformer.enable_sequence_parallel(
            *self._sequence_parallel)
    if self._grid2mesh_gnn.norm_conditioning_size is None:
      self._grid2mesh_gnn.norm_conditioning_size = cond_size
      self._mesh2grid_gnn.norm_conditioning_size = cond_size
    fused = self._fused_aggregation
    if fused is None:
      fused = jax.default_backend() == "tpu"
    if (fused and self._g2m_summer is None and self._m2g_decoder is None
        and self._cfg.hidden_layers == 1):
      from graphcast_tpu.ops.pallas_decoder import FusedMesh2GridDecoder
      from graphcast_tpu.ops.pallas_edge import FusedEdgeStep
      from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum
      try:
        # Latitude-banded g2m layout for the windowed sender gather (see
        # models/graphcast.py). The node_order is INTERNAL to the summer's
        # layout, so it composes with the processor's banded-PATCH mesh
        # ordering (which splash needs for its attention tiles): patch
        # blobs are spatially coherent but their z-then-lon seed sweep
        # still spans ~5.2× the grid in sender windows at 0.25°, while
        # lat-banded positions give ~1.3× (round-5 host probes).
        g2m_order = None
        from graphcast_tpu.env_flags import env_flag
        from graphcast_tpu.ops.window_gather import MIN_TABLE_ROWS
        if (env_flag("GC_G2M_WINDOWED", default=True)
            and self._artifact.num_grid_nodes >= MIN_TABLE_ROWS):
          art = self._artifact
          g2m_order = np.lexsort(
              (art.mesh_nodes_lon, -art.mesh_nodes_lat)).astype(np.int32)
        self._g2m_summer = BlockedSegmentSum(
            self._artifact.grid2mesh.receivers,
            self._artifact.num_mesh_nodes,
            block_nodes=256, chunk_edges=512, padded_input=True,
            node_order=g2m_order)
        self._g2m_fused = FusedEdgeStep(
            self._g2m_summer, include_edge_matmul=True, write_edges=False)
        self._grid2mesh_gnn.edge_aggregators = {"grid2mesh": self._g2m_summer}
        self._g2m_window_plan = None
        if g2m_order is not None:
          from graphcast_tpu.ops.window_gather import plan_windowed_gather
          s = self._g2m_summer
          se = max(512, -(-s.layout_length // 32 // 512) * 512)
          self._g2m_window_plan = plan_windowed_gather(
              s.pad_edges(self._artifact.grid2mesh.senders),
              s.layout_index < s.num_edges,
              self._artifact.num_grid_nodes, superchunk_edges=se)
      except ValueError:
        self._g2m_summer = None
        self._g2m_fused = None
        self._g2m_window_plan = None
        self._grid2mesh_gnn.edge_aggregators = None
      self._m2g_decoder = FusedMesh2GridDecoder(
          self._artifact.mesh2grid.senders, self._artifact.num_grid_nodes,
          self._cfg.node_output_size)
    if (self._g2m_plan is None and self._encode_chunks > 1
        and self._g2m_summer is None):
      from graphcast_tpu.geometry import chunking
      self._g2m_plan = chunking.plan_balanced_node_chunks(
          self._artifact.grid2mesh.receivers, self._artifact.num_mesh_nodes,
          self._encode_chunks)

  # --- graphs (same assembly pattern as GraphCast) ---

  def _host_statics(self) -> dict:
    """Artifact statics with the grid2mesh edge set in the balanced
    node-chunk layout when chunked encoding is active (see
    models/graphcast.py:_host_statics)."""
    statics = self._artifact.graph_statics()
    if self._g2m_summer is not None:
      s = self._g2m_summer
      statics["g2m_senders"] = s.pad_edges(statics["g2m_senders"])
      statics["g2m_receivers"] = s.padded_receivers
      statics["g2m_edge_features"] = s.pad_edges(
          statics["g2m_edge_features"])
      # Kernel masks as statics (jit args, not HLO constants) — see
      # models/graphcast.py:_host_statics.
      statics["g2m_agg_mask"], statics["g2m_agg_mask_t"] = (
          s.onehot_masks())
      if self._g2m_window_plan is not None:
        # Windowed two-stage sender gather — see models/graphcast.py.
        for k, v in self._g2m_window_plan.statics().items():
          statics[f"g2m_win_{k}"] = v
    elif self._g2m_plan is not None:
      plan = self._g2m_plan
      statics["g2m_senders"] = plan.pad_edge_array(statics["g2m_senders"])
      statics["g2m_receivers"] = plan.pad_edge_array(
          statics["g2m_receivers"])
      statics["g2m_edge_features"] = plan.pad_edge_array(
          statics["g2m_edge_features"])
      statics["g2m_local_receivers"] = plan.local_receivers
      statics["g2m_node_gather"] = plan.node_gather
    if self._m2g_decoder is not None:
      for k, v in self._m2g_decoder.host_layout().items():
        statics[f"m2g_dec_{k}"] = v
      statics["m2g_dec_ef_slot"] = self._m2g_decoder.host_slot_features(
          statics["m2g_edge_features"])
    if (self._mesh_transformer is not None
        and self._cfg.sparse_transformer_config.attention_type
        == "splash_mha"):
      for k, v in self._mesh_transformer.host_kernel_statics().items():
        statics[f"splash_{k}"] = v
    return statics

  def _statics(self, params) -> dict:
    if isinstance(params, dict) and "graph_statics" in params:
      return params["graph_statics"]
    return {k: jnp.asarray(v) for k, v in self._host_statics().items()}

  def _grid2mesh_graph(self, statics, grid_node_features) -> TypedGraph:
    art = self._artifact
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype
    grid_struct = _add_batch_second_axis(
        statics["grid_node_features"].astype(dtype), batch)
    mesh_struct = _add_batch_second_axis(
        statics["mesh_node_features"].astype(dtype), batch)
    dummy = jnp.zeros((art.num_mesh_nodes,) + grid_node_features.shape[1:],
                      dtype)
    return TypedGraph(
        context=Context(features=()),
        nodes={
            "grid_nodes": NodeSet(
                art.num_grid_nodes,
                jnp.concatenate([grid_node_features, grid_struct], axis=-1)),
            "mesh_nodes": NodeSet(
                art.num_mesh_nodes,
                jnp.concatenate([dummy, mesh_struct], axis=-1)),
        },
        edges={EdgeSetKey("grid2mesh", ("grid_nodes", "mesh_nodes")): EdgeSet(
            indices=EdgesIndices(statics["g2m_senders"],
                                 statics["g2m_receivers"]),
            features=_add_batch_second_axis(
                statics["g2m_edge_features"].astype(dtype), batch))})

  def _mesh2grid_graph(self, statics, latent_mesh_nodes, latent_grid_nodes
                       ) -> TypedGraph:
    art = self._artifact
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype
    return TypedGraph(
        context=Context(features=()),
        nodes={
            "grid_nodes": NodeSet(art.num_grid_nodes, latent_grid_nodes),
            "mesh_nodes": NodeSet(art.num_mesh_nodes, latent_mesh_nodes),
        },
        edges={EdgeSetKey("mesh2grid", ("mesh_nodes", "grid_nodes")): EdgeSet(
            indices=EdgesIndices(statics["m2g_senders"],
                                 statics["m2g_receivers"]),
            features=_add_batch_second_axis(
                statics["m2g_edge_features"].astype(dtype), batch))})

  # --- features ---

  def _split_features_and_conditioning(self, inputs: FieldSet,
                                       forcings: FieldSet):
    """Reference: denoiser.py:754-791."""
    cond_names = list(self._cfg.norm_conditioning_features)
    cond_fs = inputs.select([n for n in cond_names if n in inputs])
    inputs = inputs.drop(cond_names)
    if len(cond_fs):
      for name in cond_fs.var_names:
        if {"lat", "lon"} & set(cond_fs[name].dims):
          raise ValueError("lat/lon conditioning features unsupported")
      global_norm_conditioning = to_stacked(cond_fs, preserved_dims=("batch",))
    else:
      global_norm_conditioning = None

    stacked = jnp.concatenate(
        [to_stacked(inputs), to_stacked(forcings)], axis=-1)
    stacked = jnp.transpose(stacked, (1, 2, 0, 3))
    grid_node_features = stacked.reshape((-1,) + stacked.shape[2:])
    return grid_node_features, global_norm_conditioning

  def _outputs_to_prediction(self, grid_node_outputs, targets_template):
    art = self._artifact
    grid_shape = (art.grid_lat.shape[0], art.grid_lon.shape[0])
    data = grid_node_outputs.reshape(grid_shape + grid_node_outputs.shape[1:])
    data = jnp.transpose(data, (2, 0, 1, 3))
    return from_stacked(data, targets_template)

  # --- init / apply ---

  def init(self, rng, inputs: FieldSet, targets_template: FieldSet,
           forcings: FieldSet) -> core.Params:
    # Abstract (shape-only) template graphs: init does no device compute.
    gnf, cond = jax.eval_shape(
        self._split_features_and_conditioning, inputs, forcings)
    self._maybe_init(inputs, cond.shape[-1])
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {}
    statics = self._host_statics()
    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)
    g2m = jax.eval_shape(self._grid2mesh_graph, abstract_statics,
                         jax.ShapeDtypeStruct(gnf.shape, gnf.dtype))
    params["grid2mesh_gnn"] = self._grid2mesh_gnn.init(k1, g2m)
    params["mesh_transformer"] = self._mesh_transformer.init(
        k2, cond.shape[-1])
    batch = gnf.shape[1]
    latent = self._cfg.latent_size
    mesh_l = jax.ShapeDtypeStruct(
        (self._artifact.num_mesh_nodes, batch, latent), gnf.dtype)
    grid_l = jax.ShapeDtypeStruct(
        (self._artifact.num_grid_nodes, batch, latent), gnf.dtype)
    params["mesh2grid_gnn"] = self._mesh2grid_gnn.init(
        k3, jax.eval_shape(self._mesh2grid_graph, abstract_statics, mesh_l,
                           grid_l))
    params["graph_statics"] = statics
    return params


  @staticmethod
  def _choose_chunks(total: int, requested: int) -> int:
    k = min(requested, total)
    while total % k:
      k -= 1
    return k

  def _run_grid2mesh_chunked(self, params, statics, grid_node_features,
                             cond):
    """Chunked grid2mesh encode with norm conditioning (exact math; see
    models/graphcast.py:_run_grid2mesh_chunked for the scheme)."""
    art = self._artifact
    gnn = self._grid2mesh_gnn
    p = params["grid2mesh_gnn"]
    latent = self._cfg.latent_size
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype
    gnc = cond[None]  # broadcast over the node/edge axis

    grid_struct = _add_batch_second_axis(
        statics["grid_node_features"].astype(dtype), batch)
    mesh_struct = _add_batch_second_axis(
        statics["mesh_node_features"].astype(dtype), batch)
    dummy = jnp.zeros((art.num_mesh_nodes,) + grid_node_features.shape[1:],
                      dtype)
    grid_in = jnp.concatenate([grid_node_features, grid_struct], axis=-1)
    mesh_in = jnp.concatenate([dummy, mesh_struct], axis=-1)

    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)
    specs = gnn._specs(jax.eval_shape(
        self._grid2mesh_graph, abstract_statics,
        jax.ShapeDtypeStruct(grid_node_features.shape, dtype)))

    grid_emb = specs["encoder_nodes_grid_nodes"].apply(
        p["encoder_nodes_grid_nodes"], grid_in, global_norm_conditioning=gnc)
    mesh_emb = specs["encoder_nodes_mesh_nodes"].apply(
        p["encoder_nodes_mesh_nodes"], mesh_in, global_norm_conditioning=gnc)

    pe_spec = specs["processor_0_edges_grid2mesh"]
    pe = p["processor_0_edges_grid2mesh"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)
    we, ws, wr = w0[:latent], w0[latent:2 * latent], w0[2 * latent:]
    grid_proj = grid_emb @ ws
    mesh_proj = mesh_emb @ wr

    plan = self._g2m_plan
    k, max_e, max_n = plan.num_chunks, plan.max_edges, plan.max_nodes
    e_feats = statics["g2m_edge_features"].astype(dtype).reshape(k, max_e, -1)
    senders = statics["g2m_senders"].reshape(k, max_e)
    receivers = statics["g2m_receivers"].reshape(k, max_e)
    local_recv = statics["g2m_local_receivers"].reshape(k, max_e)

    ee_spec = specs["encoder_edges_grid2mesh"]
    pee = p["encoder_edges_grid2mesh"]
    from graphcast_tpu.nn.core import get_activation
    activation = get_activation(gnn.activation)
    mlp_layers = pe_spec._mlp._layers()

    def encode_chunk(xs):
      e_feat, s_idx, r_idx, r_local = xs
      e_lat = ee_spec.apply(pee, _add_batch_second_axis(e_feat, batch),
                            global_norm_conditioning=gnc)
      x = e_lat @ we + grid_proj[s_idx] + mesh_proj[r_idx] + b0
      for i in range(1, len(mlp_layers)):
        x = activation(x)
        x = mlp_layers[i].apply(pe["mlp"][f"linear_{i}"], x)
      x = pe_spec._norm(pe, x, gnc)
      # Chunk-local f32 aggregation; padding slots (r_local == max_n) drop.
      return jax.ops.segment_sum(
          x.astype(jnp.float32), r_local, num_segments=max_n,
          indices_are_sorted=True)

    aggs = jax.lax.map(jax.checkpoint(encode_chunk),
                       (e_feats, senders, receivers, local_recv))
    agg = aggs.reshape(k * max_n, batch, latent)[statics["g2m_node_gather"]]
    if gnn.aggregate_normalization:
      agg = agg / gnn.aggregate_normalization
    agg = agg.astype(dtype)

    mesh_upd = specs["processor_0_nodes_mesh_nodes"].apply(
        p["processor_0_nodes_mesh_nodes"], mesh_emb, agg,
        global_norm_conditioning=gnc)
    grid_upd = specs["processor_0_nodes_grid_nodes"].apply(
        p["processor_0_nodes_grid_nodes"], grid_emb,
        global_norm_conditioning=gnc)
    return mesh_emb + mesh_upd, grid_emb + grid_upd

  def _run_mesh2grid_chunked(self, params, statics, latent_mesh_nodes,
                             latent_grid_nodes, cond):
    """Chunked mesh2grid decode with norm conditioning (exact math; see
    models/graphcast.py:_run_mesh2grid_chunked for the scheme)."""
    art = self._artifact
    gnn = self._mesh2grid_gnn
    p = params["mesh2grid_gnn"]
    g_total = art.num_grid_nodes
    k = self._choose_chunks(g_total, self._decode_chunks)
    gc = g_total // k
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype
    latent = self._cfg.latent_size
    gnc = cond[None]

    mesh_l = jax.ShapeDtypeStruct((art.num_mesh_nodes, batch, latent), dtype)
    grid_l = jax.ShapeDtypeStruct((gc, batch, latent), dtype)
    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)
    specs = gnn._specs(jax.eval_shape(
        self._mesh2grid_graph, abstract_statics, mesh_l, grid_l))
    embed_spec = specs["encoder_edges_mesh2grid"]
    proc_e_spec = specs["processor_0_edges_mesh2grid"]
    proc_n_spec = specs["processor_0_nodes_grid_nodes"]
    dec_spec = specs["decoder_nodes_grid_nodes"]

    e_feats = statics["m2g_edge_features"].astype(dtype).reshape(
        k, 3 * gc, -1)
    senders = statics["m2g_senders"].reshape(k, 3 * gc)
    receivers_local = jnp.repeat(jnp.arange(gc, dtype=jnp.int32), 3)

    def decode_chunk(args):
      # Grid latents sliced from the closure, not passed as reshaped xs —
      # see models/graphcast.py:_run_mesh2grid_chunked (training memory).
      idx, e_feat, senders_chunk = args
      grid_chunk = jax.lax.dynamic_slice_in_dim(
          latent_grid_nodes, idx * gc, gc)
      e_feat_b = _add_batch_second_axis(e_feat, batch)
      e_lat = embed_spec.apply(p["encoder_edges_mesh2grid"], e_feat_b,
                               global_norm_conditioning=gnc)
      e_upd = proc_e_spec.apply_factored_edge_update(
          p["processor_0_edges_mesh2grid"], e_lat,
          latent_mesh_nodes, grid_chunk, senders_chunk, receivers_local,
          global_norm_conditioning=gnc)
      agg = e_upd.reshape(gc, 3, batch, latent).sum(axis=1)
      n_upd = proc_n_spec.apply(
          p["processor_0_nodes_grid_nodes"], grid_chunk, agg,
          global_norm_conditioning=gnc)
      n_res = grid_chunk + n_upd
      return dec_spec.apply(p["decoder_nodes_grid_nodes"], n_res)

    out = jax.lax.map(jax.checkpoint(decode_chunk),
                      (jnp.arange(k, dtype=jnp.int32), e_feats, senders))
    return out.reshape(g_total, batch, -1)

  # --- fused Pallas paths (batch 1; conditioning folded into vectors) ---

  @staticmethod
  def _nc_vectors(p_mlp, cond, dtype):
    """Conditioned-LayerNorm (scale, offset) vectors for batch-1 cond
    [1, K]: NormConditioning maps cond → (scale−1, offset)
    (nn/core.py:NormConditioning)."""
    nc = p_mlp["norm_conditioning"]
    co = cond.astype(dtype) @ nc["w"].astype(dtype) + nc["b"].astype(dtype)
    c = co.shape[-1] // 2
    return co[0, :c] + 1.0, co[0, c:]

  def _run_grid2mesh_fused(self, params, statics, grid_node_features, cond):
    """Conditioned grid2mesh encode via the aggregation-only FusedEdgeStep
    (see models/graphcast.py:_run_grid2mesh_fused; here the edge matmul
    stays in-kernel with conditioning-scaled We')."""
    art = self._artifact
    gnn = self._grid2mesh_gnn
    p = params["grid2mesh_gnn"]
    latent = self._cfg.latent_size
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype
    gnc = cond[None]

    grid_struct = _add_batch_second_axis(
        statics["grid_node_features"].astype(dtype), batch)
    mesh_struct = _add_batch_second_axis(
        statics["mesh_node_features"].astype(dtype), batch)
    dummy = jnp.zeros((art.num_mesh_nodes,) + grid_node_features.shape[1:],
                      dtype)
    grid_in = jnp.concatenate([grid_node_features, grid_struct], axis=-1)
    mesh_in = jnp.concatenate([dummy, mesh_struct], axis=-1)

    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)
    specs = gnn._specs(jax.eval_shape(
        self._grid2mesh_graph, abstract_statics,
        jax.ShapeDtypeStruct(grid_node_features.shape, dtype)))
    grid_emb = specs["encoder_nodes_grid_nodes"].apply(
        p["encoder_nodes_grid_nodes"], grid_in, global_norm_conditioning=gnc)
    mesh_emb = specs["encoder_nodes_mesh_nodes"].apply(
        p["encoder_nodes_mesh_nodes"], mesh_in, global_norm_conditioning=gnc)

    pe = p["processor_0_edges_grid2mesh"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)
    we, ws, wr = w0[:latent], w0[latent:2 * latent], w0[2 * latent:]

    s_e, o_e = self._nc_vectors(p["encoder_edges_grid2mesh"], cond, dtype)
    we_eff = s_e[:, None] * we
    b0_eff = o_e @ we + b0
    s1, o1 = self._nc_vectors(pe, cond, dtype)
    pee = p["encoder_edges_grid2mesh"]["mlp"]

    from graphcast_tpu.models.graphcast import _agg_masks
    if (self._g2m_window_plan is not None
        and statics.get("g2m_win_base") is not None):
      # Windowed two-stage gather — see models/graphcast.py and
      # ops/window_gather.py (exact: same rows either way).
      gs = self._g2m_window_plan(
          grid_emb[:, 0] @ ws, statics["g2m_win_base"],
          statics["g2m_win_local"])
    else:
      gs = (grid_emb[:, 0] @ ws)[statics["g2m_senders"]]
    gr_pad = self._g2m_fused.pad_nodes(mesh_emb[:, 0] @ wr)
    # Raw edge features go straight into the kernel; the embed MLP +
    # parameter-free LN run per chunk in VMEM, so no [1.6M, latent]
    # embedded-edge constant occupies HBM (it OOMed the 16 GB chip when
    # hoisted at 0.25°).
    agg = self._g2m_fused(
        statics["g2m_edge_features"], gs, gr_pad, we_eff, b0_eff,
        pe["mlp"]["linear_1"]["w"], pe["mlp"]["linear_1"]["b"], s1, o1,
        masks=_agg_masks(statics, "g2m"),
        embed_weights=(pee["linear_0"]["w"], pee["linear_0"]["b"],
                       pee["linear_1"]["w"], pee["linear_1"]["b"]))
    if gnn.aggregate_normalization:
      agg = agg / gnn.aggregate_normalization
    agg = agg.astype(dtype)[:, None]

    mesh_upd = specs["processor_0_nodes_mesh_nodes"].apply(
        p["processor_0_nodes_mesh_nodes"], mesh_emb, agg,
        global_norm_conditioning=gnc)
    grid_upd = specs["processor_0_nodes_grid_nodes"].apply(
        p["processor_0_nodes_grid_nodes"], grid_emb,
        global_norm_conditioning=gnc)
    return mesh_emb + mesh_upd, grid_emb + grid_upd

  def _run_mesh2grid_fused(self, params, statics, latent_mesh_nodes,
                           latent_grid_nodes, cond):
    """Conditioned mesh2grid decode via FusedMesh2GridDecoder
    (see models/graphcast.py:_run_mesh2grid_fused)."""
    art = self._artifact
    gnn = self._mesh2grid_gnn
    p = params["mesh2grid_gnn"]
    latent = self._cfg.latent_size
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype
    dec = self._m2g_decoder

    mesh_l = jax.ShapeDtypeStruct((art.num_mesh_nodes, batch, latent), dtype)
    grid_l = jax.ShapeDtypeStruct((art.num_grid_nodes, batch, latent), dtype)
    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)
    specs = gnn._specs(jax.eval_shape(
        self._mesh2grid_graph, abstract_statics, mesh_l, grid_l))

    pe = p["processor_0_edges_mesh2grid"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)
    we, ws, wr = w0[:latent], w0[latent:2 * latent], w0[2 * latent:]

    const_slot = statics["m2g_dec_ef_slot"]
    s_e, o_e = self._nc_vectors(p["encoder_edges_mesh2grid"], cond, dtype)
    es, eo = self._nc_vectors(pe, cond, dtype)
    pn = p["processor_0_nodes_grid_nodes"]
    wn0 = pn["mlp"]["linear_0"]["w"]
    ns, no = self._nc_vectors(pn, cond, dtype)
    pd = p["decoder_nodes_grid_nodes"]
    wd1 = pd["mlp"]["linear_1"]["w"]
    bd1 = pd["mlp"]["linear_1"]["b"]
    pee = p["encoder_edges_mesh2grid"]["mlp"]
    weights = {
        "ew0": pee["linear_0"]["w"], "eb0": pee["linear_0"]["b"],
        "ew1": pee["linear_1"]["w"], "eb1": pee["linear_1"]["b"],
        "we": s_e[:, None] * we,
        "b0": o_e @ we + b0,
        "wr": wr,
        "w1": pe["mlp"]["linear_1"]["w"],
        "b1": pe["mlp"]["linear_1"]["b"],
        "escale": es, "eoffset": eo,
        "wng": wn0[:latent], "wna": wn0[latent:],
        "bn0": pn["mlp"]["linear_0"]["b"],
        "wn1": pn["mlp"]["linear_1"]["w"],
        "bn1": pn["mlp"]["linear_1"]["b"],
        "nscale": ns, "noffset": no,
        "wd0": pd["mlp"]["linear_0"]["w"],
        "bd0": pd["mlp"]["linear_0"]["b"],
        "wd1": jnp.pad(wd1, ((0, 0), (0, dec.out_pad - wd1.shape[1]))),
        "bd1": jnp.pad(bd1, (0, dec.out_pad - bd1.shape[0])),
    }
    from graphcast_tpu.models.graphcast import _dec_layout
    mesh_proj = latent_mesh_nodes[:, 0] @ ws
    out = dec(latent_grid_nodes[:, 0], mesh_proj, const_slot, weights,
              layout=_dec_layout(statics))
    return out[:, None, :]

  def apply(self, params: core.Params, inputs: FieldSet,
            targets_template: FieldSet, forcings: FieldSet) -> FieldSet:
    grid_node_features, cond = self._split_features_and_conditioning(
        inputs, forcings)
    self._maybe_init(inputs, cond.shape[-1])

    statics = self._statics(params)
    batch1 = grid_node_features.shape[1] == 1 and cond is not None
    with jax.named_scope("grid2mesh_gnn"):
      if self._g2m_fused is not None and batch1:
        latent_mesh_nodes, latent_grid_nodes = self._run_grid2mesh_fused(
            params, statics, grid_node_features, cond)
      elif self._encode_chunks > 1 and self._g2m_plan is not None:
        latent_mesh_nodes, latent_grid_nodes = self._run_grid2mesh_chunked(
            params, statics, grid_node_features, cond)
      else:
        from graphcast_tpu.models.graphcast import _agg_masks
        g2m_out = self._grid2mesh_gnn.apply(
            params["grid2mesh_gnn"],
            self._grid2mesh_graph(statics, grid_node_features),
            global_norm_conditioning=cond,
            kernel_statics={"grid2mesh": _agg_masks(statics, "g2m")})
        latent_mesh_nodes = g2m_out.nodes["mesh_nodes"].features
        latent_grid_nodes = g2m_out.nodes["grid_nodes"].features

    with jax.named_scope("mesh_transformer"):
      splash_statics = {k[len("splash_"):]: v for k, v in statics.items()
                        if k.startswith("splash_")}
      updated_mesh = self._mesh_transformer.apply(
          params["mesh_transformer"], latent_mesh_nodes, cond,
          kernel_statics=splash_statics or None)

    with jax.named_scope("mesh2grid_gnn"):
      if self._m2g_decoder is not None and batch1:
        output_grid_nodes = self._run_mesh2grid_fused(
            params, statics, updated_mesh, latent_grid_nodes, cond)
      elif self._decode_chunks > 1:
        output_grid_nodes = self._run_mesh2grid_chunked(
            params, statics, updated_mesh, latent_grid_nodes, cond)
      else:
        m2g_out = self._mesh2grid_gnn.apply(
            params["mesh2grid_gnn"],
            self._mesh2grid_graph(statics, updated_mesh, latent_grid_nodes),
            global_norm_conditioning=cond)
        output_grid_nodes = m2g_out.nodes["grid_nodes"].features
    return self._outputs_to_prediction(output_grid_nodes, targets_template)


class Denoiser:
  """Adds noise-level encodings and noisy-target forcings around the
  architecture (reference: denoiser.py:197-246)."""

  def __init__(self, noise_encoder_config: Optional[NoiseEncoderConfig],
               architecture_config: DenoiserArchitectureConfig,
               cache_dir: Optional[str] = None,
               interpret_attention: Optional[bool] = None,
               decode_chunks: int = 1,
               encode_chunks: int = 1,
               fused_aggregation: Optional[bool] = None,
               sequence_parallel: Optional[tuple] = None):
    self._architecture = DenoiserArchitecture(
        architecture_config, cache_dir=cache_dir,
        interpret_attention=interpret_attention,
        decode_chunks=decode_chunks, encode_chunks=encode_chunks,
        fused_aggregation=fused_aggregation,
        sequence_parallel=sequence_parallel)
    self._noise_encoder = FourierFeaturesMLP(
        noise_encoder_config or NoiseEncoderConfig())

  def _assemble(self, params, inputs: FieldSet, noisy_targets: FieldSet,
                noise_levels, forcings: Optional[FieldSet]):
    if noise_levels.ndim != 1:
      raise ValueError("noise_levels expected to be shape (batch,)")
    if forcings is None or not len(forcings):
      forcings = noisy_targets
    else:
      forcings = FieldSet.merge([forcings, noisy_targets])
    encodings = self._noise_encoder.apply(
        params["noise_encoder"],
        noise_levels.astype(noisy_targets.dtype() or jnp.float32))
    inputs = FieldSet.merge([inputs, FieldSet({
        "noise_level_encodings": Field(
            encodings, ("batch", "noise_level_encoding_channels"))})])
    return inputs, forcings

  def init(self, rng, inputs, noisy_targets, noise_levels, forcings=None):
    k1, k2 = jax.random.split(rng)
    params = {"noise_encoder": self._noise_encoder.init(k1)}
    all_inputs, all_forcings = self._assemble(
        params, inputs, noisy_targets, noise_levels, forcings)
    params["architecture"] = self._architecture.init(
        k2, all_inputs, noisy_targets, all_forcings)
    return params

  def apply(self, params, inputs: FieldSet, noisy_targets: FieldSet,
            noise_levels, forcings: Optional[FieldSet] = None) -> FieldSet:
    all_inputs, all_forcings = self._assemble(
        params, inputs, noisy_targets, noise_levels, forcings)
    return self._architecture.apply(
        params["architecture"], all_inputs, noisy_targets, all_forcings)
