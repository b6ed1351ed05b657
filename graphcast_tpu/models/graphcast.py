"""GraphCast: deterministic encode-process-decode GNN predictor.

Native re-implementation of the reference model (graphcast.py:213-796),
TPU-first: the three graphs (grid2mesh / multi-mesh / mesh2grid) are compiled
once by the geometry compiler (graphcast_tpu/geometry/artifact.py) into
static, receiver-sorted edge lists and structural features that live in HBM
as constants of the jitted step; all per-step compute is three DeepGraphNet
applications over [nodes, batch, channels] arrays.

Stages (reference call stack: graphcast.py:357-388):
  1. FieldSets → grid node features [num_grid_nodes, batch, C]
  2. grid2mesh GNN (1 step, f32 aggregation): grid + mesh latents
  3. multi-mesh GNN (gnn_msg_steps steps): updated mesh latents
  4. mesh2grid GNN (1 step): per-grid-node outputs
  5. outputs → FieldSet via the targets template
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphcast_tpu import losses
from graphcast_tpu.fields import FieldSet, from_stacked, to_stacked
from graphcast_tpu.geometry import artifact as artifact_lib
from graphcast_tpu.models import configs
from graphcast_tpu.models.base import Predictor
from graphcast_tpu.nn.deep_gnn import DeepGraphNet
from graphcast_tpu.nn.typed_graph import (
    Context, EdgeSet, EdgeSetKey, EdgesIndices, NodeSet, TypedGraph)


def _add_batch_second_axis(data, batch_size):
  """[n, f] → [n, batch, f] (reference: graphcast.py:785-789)."""
  return jnp.broadcast_to(data[:, None, :],
                          (data.shape[0], batch_size, data.shape[-1]))


def _agg_masks(statics, prefix):
  """(mask, mask_t) aggregation-kernel masks from graph statics, or None
  when absent (older statics → inline-constant fallback)."""
  m = statics.get(f"{prefix}_agg_mask")
  mt = statics.get(f"{prefix}_agg_mask_t")
  return (m, mt) if m is not None and mt is not None else None


def _dec_layout(statics):
  """Fused-decoder layout arrays from graph statics (m2g_dec_* keys)."""
  lay = {k[len("m2g_dec_"):]: v for k, v in statics.items()
         if k.startswith("m2g_dec_")}
  return lay or None


class GraphCast(Predictor):
  """The GraphCast one-step predictor."""

  def __init__(self, model_config: configs.ModelConfig,
               task_config: configs.TaskConfig,
               cache_dir: Optional[str] = None,
               decode_chunks: int = 1,
               encode_chunks: int = 1,
               fused_aggregation: Optional[bool] = None,
               remat_processor: bool = False):
    """decode_chunks > 1 runs the mesh2grid decoder in sequential chunks of
    grid nodes (exactly equivalent math), bounding peak HBM: at 0.25° the
    decoder's 3.1M-edge buffers dominate memory, and chunking lets the full
    0.25°/37-level model run on a 16 GB chip (the reference needs 32 GB,
    docs/cloud_vm_setup.md:44).

    fused_aggregation: None (auto: on TPU), True (all Pallas fast paths),
    False (XLA paths only), "processor" — fused kernels for the 16-step
    mesh processor ONLY, keeping the chunked encode/decode — or "encoder"
    — fused processor + fused grid2mesh encode with the CHUNKED decoder.
    "processor" is the 0.25° training config: the processor's fused
    forward+backward kernels compose with the √N remat, while the chunked
    encode/decode remains the path whose remat fits the 0.25° backward in
    16 GB. "encoder" exists for memory probes: the fully-fused decoder's
    backward stacks ~33 GB of per-block residuals at 0.25° (round-5
    memdump), so training with the fused encoder requires chunking the
    decoder."""
    self._mc = model_config
    self._tc = task_config
    self._cache_dir = cache_dir
    self._decode_chunks = decode_chunks
    self._encode_chunks = encode_chunks
    self._fused_aggregation = fused_aggregation
    self._artifact: Optional[artifact_lib.GridMeshArtifact] = None
    self._mesh_summer = None
    self._g2m_plan = None
    self._m2g_decoder = None

    latent = model_config.latent_size
    num_outputs = configs.num_output_channels(task_config)

    # Encoder: one message-passing step, f32 aggregation, swish
    # (reference: graphcast.py:261-277).
    self._grid2mesh_gnn = DeepGraphNet(
        node_latent_size={"mesh_nodes": latent, "grid_nodes": latent},
        edge_latent_size={"grid2mesh": latent},
        mlp_hidden_size=latent,
        mlp_num_hidden_layers=model_config.hidden_layers,
        num_message_passing_steps=1,
        use_layer_norm=True,
        activation="swish",
        f32_aggregation=True)

    # Processor over the multi-mesh (reference: graphcast.py:280-293).
    self._mesh_gnn = DeepGraphNet(
        embed_nodes=False,
        node_latent_size={"mesh_nodes": latent},
        edge_latent_size={"mesh": latent},
        mlp_hidden_size=latent,
        mlp_num_hidden_layers=model_config.hidden_layers,
        num_message_passing_steps=model_config.gnn_msg_steps,
        use_layer_norm=True,
        activation="swish",
        f32_aggregation=False,
        remat_steps=remat_processor)

    # Decoder (reference: graphcast.py:304-321).
    self._mesh2grid_gnn = DeepGraphNet(
        node_output_size={"grid_nodes": num_outputs},
        embed_nodes=False,
        node_latent_size={"mesh_nodes": latent, "grid_nodes": latent},
        edge_latent_size={"mesh2grid": latent},
        mlp_hidden_size=latent,
        mlp_num_hidden_layers=model_config.hidden_layers,
        num_message_passing_steps=1,
        use_layer_norm=True,
        activation="swish",
        f32_aggregation=False)

  # ----- static graph assembly -----

  def _maybe_init(self, inputs: FieldSet):
    if self._artifact is not None:
      return
    coords = inputs.coords
    self._artifact = artifact_lib.build_artifact(
        grid_lat=coords["lat"],
        grid_lon=coords["lon"],
        mesh_size=self._mc.mesh_size,
        radius_query_fraction_edge_length=(
            self._mc.radius_query_fraction_edge_length),
        mesh2grid_edge_normalization_factor=(
            self._mc.mesh2grid_edge_normalization_factor),
        multimesh=True,
        cache_dir=self._cache_dir)
    fused = self._fused_aggregation
    if fused is None:
      fused = jax.default_backend() == "tpu"
    self._mesh_summer = None
    if fused:
      # One-hot MXU aggregation for the multi-mesh hot loop (16 scatter-adds
      # per step otherwise dominate: ~26 GB/s effective on segment_sum).
      # The mesh edge set is baked into the kernel's chunk-aligned padded
      # layout host-side (see _host_statics), so the repeated aggregations
      # run with ZERO runtime re-layout — the padding overhead is only the
      # ~15-25% extra edge-MLP rows, which are MXU-bound and cheap.
      from graphcast_tpu.ops.pallas_edge import FusedEdgeStep
      from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum
      art = self._artifact
      # cs=512/bn=256 measured best at mesh-6 on v5e: expansion 1.006 and
      # 7.2 ms/MP-step for the fused kernel (vs 14.8 unfused; cs=1024
      # overflows the 16 MB VMEM scoped-allocation limit).
      self._mesh_summer = BlockedSegmentSum(
          art.mesh.receivers, art.num_mesh_nodes,
          block_nodes=256, chunk_edges=512, padded_input=True)
      self._mesh_gnn.edge_aggregators = {"mesh": self._mesh_summer}
      # Fully-fused processor step (edge MLP + LN + residual + aggregation
      # in one HBM pass) for the batch-1 inference path; batch > 1 falls
      # back to the padded aggregation kernel above.
      self._mesh_gnn.fused_edge_steps = {
          "mesh": FusedEdgeStep(self._mesh_summer)}
      # (grid2mesh/mesh2grid aggregations happen once per step and are
      # handled by the chunked encode/decode paths instead.)
    fused_full = fused and fused != "processor"
    self._g2m_summer = None
    self._g2m_fused = None
    self._g2m_window_plan = None
    if (fused_full and self._mc.hidden_layers == 1
        and self._grid2mesh_gnn.activation == "swish"):
      # Aggregation-only fused edge step for the grid2mesh encoder (batch-1
      # fast path): the encoder's edge latents are consumed solely by the
      # one aggregation into mesh nodes, so the kernel computes the edge MLP
      # + LayerNorm and accumulates straight into per-mesh-block f32
      # aggregates — never writing [1.6M, latent] edge latents to HBM.
      from graphcast_tpu.ops.pallas_edge import FusedEdgeStep
      from graphcast_tpu.ops.pallas_mp import BlockedSegmentSum
      try:
        # Latitude-banded node positions for the g2m layout: refinement-
        # order mesh ids scatter each receiver block's senders across ~0.8×
        # of the lat-major grid table (round-5 analyze_g2m_senders), which
        # forces the flat 17.3 ns/row big-table gather. Banded positions
        # confine each superchunk's senders to a narrow window so the
        # two-stage windowed gather applies (ops/window_gather.py). The
        # permutation is internal to the summer: outputs come back in
        # original mesh-id order.
        g2m_order = None
        from graphcast_tpu.env_flags import env_flag
        from graphcast_tpu.ops.window_gather import MIN_TABLE_ROWS
        if (env_flag("GC_G2M_WINDOWED", default=True)
            and self._artifact.num_grid_nodes >= MIN_TABLE_ROWS):
          art = self._artifact
          g2m_order = np.lexsort(
              (art.mesh_nodes_lon, -art.mesh_nodes_lat)).astype(np.int32)
        self._g2m_summer = BlockedSegmentSum(
            self._artifact.grid2mesh.receivers, self._artifact.num_mesh_nodes,
            block_nodes=256, chunk_edges=512, padded_input=True,
            node_order=g2m_order)
        self._g2m_fused = FusedEdgeStep(
            self._g2m_summer, include_edge_matmul=False, write_edges=False)
        self._g2m_window_plan = None
        if g2m_order is not None:
          from graphcast_tpu.ops.window_gather import plan_windowed_gather
          s = self._g2m_summer
          se = max(512, -(-s.layout_length // 32 // 512) * 512)
          self._g2m_window_plan = plan_windowed_gather(
              s.pad_edges(self._artifact.grid2mesh.senders),
              s.layout_index < s.num_edges,
              self._artifact.num_grid_nodes, superchunk_edges=se)
        # Batch > 1 falls back to the general GNN path, whose aggregation
        # runs through the same kernel layout.
        self._grid2mesh_gnn.edge_aggregators = {"grid2mesh": self._g2m_summer}
      except ValueError:
        # e.g. a mesh-node block with no incoming grid2mesh edges (tiny
        # grids) — keep the chunked/general paths.
        self._g2m_summer = None
        self._g2m_fused = None
        self._g2m_window_plan = None
        self._grid2mesh_gnn.edge_aggregators = None
    self._m2g_decoder = None
    if (fused_full and fused != "encoder" and self._mc.hidden_layers == 1
        and self._mesh2grid_gnn.activation == "swish"):
      # Fully-fused mesh2grid decoder (batch-1 inference fast path): edge
      # MLP + LN + 3-edge aggregation + node MLP + residual + output MLP in
      # one Pallas pass per grid-node block. Chunked path remains the
      # fallback (batch > 1 / no hoisted const).
      from graphcast_tpu.ops.pallas_decoder import FusedMesh2GridDecoder
      self._m2g_decoder = FusedMesh2GridDecoder(
          self._artifact.mesh2grid.senders, self._artifact.num_grid_nodes,
          configs.num_output_channels(self._tc))
    self._g2m_plan = None
    if self._encode_chunks > 1 and self._g2m_summer is None:
      # The fused encoder's padded layout replaces the balanced-chunk
      # layout (the two re-layouts are mutually exclusive in the statics).
      from graphcast_tpu.geometry import chunking
      self._g2m_plan = chunking.plan_balanced_node_chunks(
          self._artifact.grid2mesh.receivers, self._artifact.num_mesh_nodes,
          self._encode_chunks)

  def _host_statics(self) -> dict:
    """Artifact statics, re-laid out for the fast paths:

    - mesh edge set in the fused kernel's padded chunk-aligned order when
      fused aggregation is active;
    - grid2mesh edge set in the balanced node-chunk layout when chunked
      encoding is active (plus local receivers / node-gather indices).
    """
    statics = self._artifact.graph_statics()
    if self._mesh_summer is not None:
      s = self._mesh_summer
      statics["mesh_senders"] = s.pad_edges(statics["mesh_senders"])
      statics["mesh_receivers"] = s.padded_receivers
      statics["mesh_edge_features"] = s.pad_edges(
          statics["mesh_edge_features"])
      # Kernel masks as statics (jit args): at 0.25° the bitpacked one-hot
      # masks total hundreds of MB across the three edge sets — inlined as
      # HLO constants they overflow the remote compile service's request
      # limit (HTTP 413) and bloat every compile.
      statics["mesh_agg_mask"], statics["mesh_agg_mask_t"] = (
          s.onehot_masks())
    if self._g2m_summer is not None:
      statics["g2m_agg_mask"], statics["g2m_agg_mask_t"] = (
          self._g2m_summer.onehot_masks())
    if self._m2g_decoder is not None:
      for k, v in self._m2g_decoder.host_layout().items():
        statics[f"m2g_dec_{k}"] = v
    if self._g2m_summer is not None:
      s = self._g2m_summer
      statics["g2m_senders"] = s.pad_edges(statics["g2m_senders"])
      statics["g2m_receivers"] = s.padded_receivers
      statics["g2m_edge_features"] = s.pad_edges(
          statics["g2m_edge_features"])
      if self._g2m_window_plan is not None:
        # Windowed two-stage sender gather (ops/window_gather.py): the
        # banded layout confines each superchunk's senders to a narrow
        # grid window — slice it, gather window-locally at small-table
        # pricing (~8.6 vs 17.3 ns/row, round-5 probe). The round-4
        # grouped-gather alternative (8-row group fetches) was A/B'd
        # clean in round 5 — north star 9.378 vs 8.672 s — and removed:
        # per-row cost scales with table size, and grouped expansion
        # fetches ~2× the rows from the BIG table.
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
    return statics

  def _statics(self, params) -> dict:
    """Graph data threaded as jit arguments when present in params
    (see GridMeshArtifact.graph_statics), else closure constants."""
    if isinstance(params, dict) and "graph_statics" in params:
      return params["graph_statics"]
    return {k: jnp.asarray(v) for k, v in self._host_statics().items()}

  def _grid2mesh_graph(self, statics, grid_node_features) -> TypedGraph:
    """Assembles the grid2mesh TypedGraph; grid nodes carry
    [input features ++ structural], mesh nodes [zeros ++ structural]
    (reference: graphcast.py:609-663)."""
    art = self._artifact
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype
    grid_struct = _add_batch_second_axis(
        statics["grid_node_features"].astype(dtype), batch)
    mesh_struct = _add_batch_second_axis(
        statics["mesh_node_features"].astype(dtype), batch)
    dummy_mesh_feats = jnp.zeros(
        (art.num_mesh_nodes,) + grid_node_features.shape[1:], dtype)
    grid_feats = jnp.concatenate([grid_node_features, grid_struct], axis=-1)
    mesh_feats = jnp.concatenate([dummy_mesh_feats, mesh_struct], axis=-1)
    edge_feats = _add_batch_second_axis(
        statics["g2m_edge_features"].astype(dtype), batch)
    return TypedGraph(
        context=Context(features=()),
        nodes={
            "grid_nodes": NodeSet(art.num_grid_nodes, grid_feats),
            "mesh_nodes": NodeSet(art.num_mesh_nodes, mesh_feats),
        },
        edges={EdgeSetKey("grid2mesh", ("grid_nodes", "mesh_nodes")): EdgeSet(
            indices=EdgesIndices(statics["g2m_senders"],
                                 statics["g2m_receivers"]),
            features=edge_feats)})

  def _mesh_graph(self, statics, latent_mesh_nodes) -> TypedGraph:
    """Multi-mesh processor graph (reference: graphcast.py:665-699)."""
    art = self._artifact
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype
    edge_feats = _add_batch_second_axis(
        statics["mesh_edge_features"].astype(dtype), batch)
    return TypedGraph(
        context=Context(features=()),
        nodes={"mesh_nodes": NodeSet(art.num_mesh_nodes, latent_mesh_nodes)},
        edges={EdgeSetKey("mesh", ("mesh_nodes", "mesh_nodes")): EdgeSet(
            indices=EdgesIndices(statics["mesh_senders"],
                                 statics["mesh_receivers"]),
            features=edge_feats)})

  def _mesh2grid_graph(self, statics, latent_mesh_nodes, latent_grid_nodes
                       ) -> TypedGraph:
    """Decoder graph (reference: graphcast.py:701-738)."""
    art = self._artifact
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype
    edge_feats = _add_batch_second_axis(
        statics["m2g_edge_features"].astype(dtype), batch)
    return TypedGraph(
        context=Context(features=()),
        nodes={
            "grid_nodes": NodeSet(art.num_grid_nodes, latent_grid_nodes),
            "mesh_nodes": NodeSet(art.num_mesh_nodes, latent_mesh_nodes),
        },
        edges={EdgeSetKey("mesh2grid", ("mesh_nodes", "grid_nodes")): EdgeSet(
            indices=EdgesIndices(statics["m2g_senders"],
                                 statics["m2g_receivers"]),
            features=edge_feats)})

  # ----- static edge-latent hoisting (scan-invariant precompute) -----

  def precompute_step_statics(self, params, inputs):
    """Values constant across autoregressive steps, computed ONCE before
    the rollout scan: the encoder/decoder edge features are purely
    structural, so their edge-embed MLP output — already multiplied into
    the processor edge MLP's first layer (+bias) — never changes. Hoisting
    it saves two [E, 512] matmul passes per edge set per step at the cost
    of persisting [E, 512] latents in HBM (~5 GB at 0.25°, fits alongside
    the 16 GB working set)."""
    self._maybe_init(inputs)
    batch = inputs.sizes.get("batch", 1)
    fused_decode = self._m2g_decoder is not None and batch == 1
    fused_encode = self._g2m_fused is not None and batch == 1
    if (self._encode_chunks <= 1 and self._decode_chunks <= 1
        and not fused_decode and not fused_encode):
      return {}
    statics = self._statics(params)
    dtype = inputs[inputs.var_names[0]].data.dtype
    if not jnp.issubdtype(dtype, jnp.floating):
      dtype = jnp.float32
    out = {}
    if fused_encode:
      out["g2m_const"] = self._static_edge_const(
          params["grid2mesh_gnn"], self._grid2mesh_gnn,
          statics["g2m_edge_features"], max(self._encode_chunks, 8), dtype)
    elif self._encode_chunks > 1 and self._g2m_plan is not None:
      out["g2m_const"] = self._static_edge_const(
          params["grid2mesh_gnn"], self._grid2mesh_gnn,
          statics["g2m_edge_features"], self._g2m_plan.num_chunks, dtype)
    if fused_decode:
      k = self._choose_chunks(self._artifact.num_grid_nodes,
                              max(self._decode_chunks, 8))
      const = self._static_edge_const(
          params["mesh2grid_gnn"], self._mesh2grid_gnn,
          statics["m2g_edge_features"], k, dtype)
      out["m2g_const_slot"] = self._m2g_decoder.rearrange_edge_array(
          const[:, 0])
    elif self._decode_chunks > 1:
      k = self._choose_chunks(self._artifact.num_grid_nodes,
                              self._decode_chunks)
      out["m2g_const"] = self._static_edge_const(
          params["mesh2grid_gnn"], self._mesh2grid_gnn,
          statics["m2g_edge_features"], k, dtype)
    return {"static_edge_latents": out} if out else {}

  def _static_edge_const(self, p, gnn, edge_features, num_chunks, dtype):
    """embed(edge_feats) @ We + b0 for one edge set, chunked: the static
    part of the factored processor edge update. [E_padded, 1, latent]."""
    latent = self._mc.latent_size
    edge_name = next(iter(gnn.edge_latent_size))
    e_feats = edge_features.astype(dtype)
    total = e_feats.shape[0]
    k = self._choose_chunks(total, num_chunks)
    e_feats = e_feats.reshape(k, total // k, -1)
    ee_spec = gnn._mlp_with_norm(e_feats.shape[-1], latent)
    pe = p[f"processor_0_edges_{edge_name}"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    we = w0[:latent]
    b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)

    def chunk_fn(e_feat):
      e_lat = ee_spec.apply(p[f"encoder_edges_{edge_name}"],
                            _add_batch_second_axis(e_feat, 1))
      return e_lat @ we + b0

    return jax.lax.map(chunk_fn, e_feats).reshape(total, 1, latent)

  # ----- chunked grid2mesh encode (memory-bounded, exact math) -----

  def _run_grid2mesh_chunked(self, params, statics, grid_node_features,
                             const=None):
    """The grid2mesh GNN evaluated in sequential balanced node chunks.

    The encoder's edge latents are only consumed by the single aggregation
    into mesh nodes (the edge set is not reused downstream), so each chunk
    can embed → update → aggregate and be freed: peak memory scales with
    E/num_chunks instead of E (~1.6M edges at 0.25°).

    Chunks are node-aligned with balanced edge counts (geometry/chunking.py):
    each chunk's receivers are local to its node range, so the aggregation is
    a small [max_nodes, B, C] sorted segment-sum per chunk instead of k
    scatter-adds into a full [num_mesh, B, C] f32 accumulator (round-1's
    hottest op: 57 ms standalone at 0.25°); the per-chunk outputs are
    reassembled with one gather. Exactly matches the general path (f32
    aggregation within chunks; chunk boundaries never split a node).
    """
    art = self._artifact
    gnn = self._grid2mesh_gnn
    p = params["grid2mesh_gnn"]
    latent = self._mc.latent_size
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype

    # Node features (with structural concat), embedded in full — these are
    # needed as outputs anyway.
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
        p["encoder_nodes_grid_nodes"], grid_in)
    mesh_emb = specs["encoder_nodes_mesh_nodes"].apply(
        p["encoder_nodes_mesh_nodes"], mesh_in)

    # Pre-project node contributions of the edge MLP's first layer once per
    # node (the factored-edge-update trick, done outside the chunk loop).
    pe_spec = specs["processor_0_edges_grid2mesh"]
    pe = p["processor_0_edges_grid2mesh"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)
    we, ws, wr = w0[:latent], w0[latent:2 * latent], w0[2 * latent:]
    grid_proj = grid_emb @ ws    # [num_grid, B, latent]
    mesh_proj = mesh_emb @ wr    # [num_mesh, B, latent]

    plan = self._g2m_plan
    k, max_e, max_n = plan.num_chunks, plan.max_edges, plan.max_nodes
    senders = statics["g2m_senders"].reshape(k, max_e)
    receivers = statics["g2m_receivers"].reshape(k, max_e)
    local_recv = statics["g2m_local_receivers"].reshape(k, max_e)

    ee_spec = specs["encoder_edges_grid2mesh"]
    pee = p["encoder_edges_grid2mesh"]
    from graphcast_tpu.nn.core import get_activation
    activation = get_activation(gnn.activation)
    mlp_layers = pe_spec._mlp._layers()

    if const is not None:
      # Hoisted static part: embed(e_feats) @ We + b0, precomputed once per
      # rollout (precompute_step_statics).
      first_layer = const.astype(dtype).reshape(k, max_e, 1, -1)
    else:
      first_layer = None
      e_feats = statics["g2m_edge_features"].astype(dtype).reshape(
          k, max_e, -1)

    def encode_chunk(xs):
      if first_layer is not None:
        c_chunk, s_idx, r_idx, r_local = xs
        x = c_chunk + grid_proj[s_idx] + mesh_proj[r_idx]
      else:
        e_feat, s_idx, r_idx, r_local = xs
        e_lat = ee_spec.apply(pee, _add_batch_second_axis(e_feat, batch))
        # Factored first layer of the processor edge MLP.
        x = e_lat @ we + grid_proj[s_idx] + mesh_proj[r_idx] + b0
      for i in range(1, len(mlp_layers)):
        x = activation(x)
        x = mlp_layers[i].apply(pe["mlp"][f"linear_{i}"], x)
      x = pe_spec._norm(pe, x, None)
      # Chunk-local f32 aggregation (g2m uses f32_aggregation); padding
      # slots carry r_local == max_n and are dropped.
      return jax.ops.segment_sum(
          x.astype(jnp.float32), r_local, num_segments=max_n,
          indices_are_sorted=True)

    lead = first_layer if first_layer is not None else e_feats
    # Remat per chunk: without this, lax.map saves every chunk's edge
    # intermediates as residuals and the 0.25° backward needs >100 GB.
    aggs = jax.lax.map(jax.checkpoint(encode_chunk),
                       (lead, senders, receivers,
                        local_recv))  # [k, max_n, B, latent]
    agg = aggs.reshape(k * max_n, batch, latent)[statics["g2m_node_gather"]]
    if gnn.aggregate_normalization:
      agg = agg / gnn.aggregate_normalization
    agg = agg.astype(dtype)

    # Node updates + residuals (reference: deep_typed_graph_net.py:373-394).
    mesh_upd = specs["processor_0_nodes_mesh_nodes"].apply(
        p["processor_0_nodes_mesh_nodes"], mesh_emb, agg)
    grid_upd = specs["processor_0_nodes_grid_nodes"].apply(
        p["processor_0_nodes_grid_nodes"], grid_emb)
    return mesh_emb + mesh_upd, grid_emb + grid_upd

  # ----- chunked mesh2grid decode (memory-bounded, exact math) -----

  @staticmethod
  def _choose_chunks(total: int, requested: int) -> int:
    """Largest divisor of `total` that is ≤ requested (≥ 1)."""
    k = min(requested, total)
    while total % k:
      k -= 1
    return k

  def _run_mesh2grid_chunked(self, params, statics, latent_mesh_nodes,
                             latent_grid_nodes, const=None):
    """The mesh2grid GNN evaluated in sequential grid-node chunks.

    Exploits two static properties: the decoder has exactly 3 edges per grid
    node (triangle containment, grid_mesh_connectivity.py:104) and edges are
    receiver-sorted, so each chunk of grid nodes owns one contiguous edge
    range and the aggregation is a reshape-sum. Peak memory scales with
    E/num_chunks instead of E.

    With ``const`` (hoisted static edge latents, precompute_step_statics),
    the embed MLP and first-layer edge matmul are skipped and the mesh
    projection is computed once outside the chunk loop.
    """
    art = self._artifact
    gnn = self._mesh2grid_gnn
    p = params["mesh2grid_gnn"]
    g_total = art.num_grid_nodes
    k = self._choose_chunks(g_total, self._decode_chunks)
    gc = g_total // k
    batch = latent_mesh_nodes.shape[1]
    dtype = latent_mesh_nodes.dtype

    # Specs via an abstract template graph (static shapes only).
    latent = self._mc.latent_size
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

    senders = statics["m2g_senders"].reshape(k, 3 * gc)
    receivers_local = jnp.repeat(
        jnp.arange(gc, dtype=jnp.int32), 3)

    pe = p["processor_0_edges_mesh2grid"]
    from graphcast_tpu.nn.core import get_activation
    activation = get_activation(gnn.activation)
    mlp_layers = proc_e_spec._mlp._layers()
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    ws, wr = w0[latent:2 * latent], w0[2 * latent:]
    # Sender (mesh) projection of the factored first layer, once for all
    # chunks instead of once per chunk.
    mesh_proj = latent_mesh_nodes @ ws

    if const is not None:
      lead = const.astype(dtype).reshape(k, 3 * gc, 1, -1)
    else:
      lead = statics["m2g_edge_features"].astype(dtype).reshape(
          k, 3 * gc, -1)

    def decode_chunk(args):
      # The grid latents are sliced from the closed-over full array rather
      # than passed as reshaped lax.map xs: as xs they materialize a
      # layout-copy of the whole [num_grid, B, latent] array per remat
      # instance (≈1 GB × several at 0.25°, part of the 73 GB that kept
      # 2-step AR training off a 16 GB chip); as a closure the backward
      # references the one shared array.
      idx, lead_chunk, senders_chunk = args
      grid_chunk = jax.lax.dynamic_slice_in_dim(
          latent_grid_nodes, idx * gc, gc)
      if const is not None:
        x = lead_chunk + mesh_proj[senders_chunk] + (
            grid_chunk @ wr)[receivers_local]
      else:
        e_feat_b = _add_batch_second_axis(lead_chunk, batch)
        e_lat = embed_spec.apply(p["encoder_edges_mesh2grid"], e_feat_b)
        we = w0[:latent]
        b0 = pe["mlp"]["linear_0"]["b"].astype(dtype)
        x = (e_lat @ we + mesh_proj[senders_chunk]
             + (grid_chunk @ wr)[receivers_local] + b0)
      for i in range(1, len(mlp_layers)):
        x = activation(x)
        x = mlp_layers[i].apply(pe["mlp"][f"linear_{i}"], x)
      e_upd = proc_e_spec._norm(pe, x, None)
      # Exactly 3 receiver-sorted edges per grid node: aggregation is a
      # reshape-sum (replaces the scatter-add entirely).
      agg = e_upd.reshape(gc, 3, batch, latent).sum(axis=1)
      n_upd = proc_n_spec.apply(
          p["processor_0_nodes_grid_nodes"], grid_chunk, agg)
      n_res = grid_chunk + n_upd
      return dec_spec.apply(p["decoder_nodes_grid_nodes"], n_res)

    # Remat per chunk (see _run_grid2mesh_chunked).
    out = jax.lax.map(jax.checkpoint(decode_chunk),
                      (jnp.arange(k, dtype=jnp.int32), lead, senders))
    return out.reshape(g_total, batch, -1)

  # ----- fully-fused grid2mesh encode (Pallas, batch-1 fast path) -----

  def _run_grid2mesh_fused(self, params, statics, grid_node_features, const):
    """grid2mesh via the aggregation-only FusedEdgeStep: edge MLP + LN +
    f32 aggregation in one Pallas pass over the padded edge layout, no
    [1.6M, latent] edge intermediates in HBM. ``const`` is the hoisted
    static first-layer part ([L, 1, latent], padded layout)."""
    art = self._artifact
    gnn = self._grid2mesh_gnn
    p = params["grid2mesh_gnn"]
    latent = self._mc.latent_size
    batch = grid_node_features.shape[1]
    dtype = grid_node_features.dtype

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
        p["encoder_nodes_grid_nodes"], grid_in)
    mesh_emb = specs["encoder_nodes_mesh_nodes"].apply(
        p["encoder_nodes_mesh_nodes"], mesh_in)

    pe = p["processor_0_edges_grid2mesh"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    ws, wr = w0[latent:2 * latent], w0[2 * latent:]
    if (self._g2m_window_plan is not None
        and statics.get("g2m_win_base") is not None):
      # Windowed two-stage gather: slice each superchunk's narrow sender
      # window out of the big table, gather window-locally at small-table
      # pricing (ops/window_gather.py; ~8.6 vs 17.3 ns/row at 0.25°).
      gs = self._g2m_window_plan(
          grid_emb[:, 0] @ ws, statics["g2m_win_base"],
          statics["g2m_win_local"])
    else:
      gs = (grid_emb[:, 0] @ ws)[statics["g2m_senders"]]
    gr_pad = self._g2m_fused.pad_nodes(mesh_emb[:, 0] @ wr)
    agg = self._g2m_fused(
        const[:, 0].astype(dtype), gs, gr_pad, None, None,
        pe["mlp"]["linear_1"]["w"], pe["mlp"]["linear_1"]["b"],
        pe["layer_norm"]["scale"], pe["layer_norm"]["offset"],
        masks=_agg_masks(statics, "g2m"))
    if gnn.aggregate_normalization:
      agg = agg / gnn.aggregate_normalization
    agg = agg.astype(dtype)[:, None]

    mesh_upd = specs["processor_0_nodes_mesh_nodes"].apply(
        p["processor_0_nodes_mesh_nodes"], mesh_emb, agg)
    grid_upd = specs["processor_0_nodes_grid_nodes"].apply(
        p["processor_0_nodes_grid_nodes"], grid_emb)
    return mesh_emb + mesh_upd, grid_emb + grid_upd

  # ----- fully-fused mesh2grid decode (Pallas, batch-1 fast path) -----

  def _run_mesh2grid_fused(self, params, statics, latent_mesh_nodes,
                           latent_grid_nodes, const_slot):
    """The whole decoder in one Pallas pass per grid-node block
    (ops.pallas_decoder.FusedMesh2GridDecoder); writes only the final
    [num_grid, num_outputs] array instead of streaming [3.1M, latent]
    intermediates through HBM. Exact same math as the chunked path modulo
    f32-vs-bf16 aggregation of the three per-node messages."""
    p = params["mesh2grid_gnn"]
    latent = self._mc.latent_size
    dtype = latent_mesh_nodes.dtype
    dec = self._m2g_decoder
    pe = p["processor_0_edges_mesh2grid"]
    w0 = pe["mlp"]["linear_0"]["w"]
    mesh_proj = latent_mesh_nodes[:, 0] @ w0[latent:2 * latent].astype(dtype)
    pn = p["processor_0_nodes_grid_nodes"]
    wn0 = pn["mlp"]["linear_0"]["w"]
    pd = p["decoder_nodes_grid_nodes"]
    wd1 = pd["mlp"]["linear_1"]["w"]
    bd1 = pd["mlp"]["linear_1"]["b"]
    weights = {
        "wr": w0[2 * latent:],
        "w1": pe["mlp"]["linear_1"]["w"],
        "b1": pe["mlp"]["linear_1"]["b"],
        "escale": pe["layer_norm"]["scale"],
        "eoffset": pe["layer_norm"]["offset"],
        "wng": wn0[:latent],
        "wna": wn0[latent:],
        "bn0": pn["mlp"]["linear_0"]["b"],
        "wn1": pn["mlp"]["linear_1"]["w"],
        "bn1": pn["mlp"]["linear_1"]["b"],
        "nscale": pn["layer_norm"]["scale"],
        "noffset": pn["layer_norm"]["offset"],
        "wd0": pd["mlp"]["linear_0"]["w"],
        "bd0": pd["mlp"]["linear_0"]["b"],
        "wd1": jnp.pad(wd1, ((0, 0), (0, dec.out_pad - wd1.shape[1]))),
        "bd1": jnp.pad(bd1, (0, dec.out_pad - bd1.shape[0])),
    }
    out = dec(latent_grid_nodes[:, 0], mesh_proj, const_slot, weights,
              layout=_dec_layout(statics))
    return out[:, None, :]

  # ----- feature packing -----

  def _inputs_to_grid_node_features(self, inputs: FieldSet,
                                    forcings: FieldSet):
    """FieldSets → [num_grid_nodes, batch, C]
    (reference: graphcast.py:739-758)."""
    stacked_inputs = to_stacked(inputs)      # [batch, lat, lon, C_in]
    stacked_forcings = to_stacked(forcings)  # [batch, lat, lon, C_f]
    stacked = jnp.concatenate([stacked_inputs, stacked_forcings], axis=-1)
    # → [lat, lon, batch, C] → [lat*lon, batch, C]
    stacked = jnp.transpose(stacked, (1, 2, 0, 3))
    return stacked.reshape((-1,) + stacked.shape[2:])

  def _grid_node_outputs_to_prediction(self, grid_node_outputs,
                                       targets_template: FieldSet) -> FieldSet:
    """[num_grid_nodes, batch, out] → FieldSet
    (reference: graphcast.py:760-783)."""
    art = self._artifact
    grid_shape = (art.grid_lat.shape[0], art.grid_lon.shape[0])
    data = grid_node_outputs.reshape(grid_shape + grid_node_outputs.shape[1:])
    data = jnp.transpose(data, (2, 0, 1, 3))  # [batch, lat, lon, out]
    return from_stacked(data, targets_template)

  # ----- Predictor API -----

  def init(self, rng, inputs, targets_template, forcings, **kwargs):
    # Build the template graphs abstractly (shapes only) so init does no
    # device compute — important when the model state is huge (0.25°).
    self._maybe_init(inputs)
    gnf = jax.eval_shape(self._inputs_to_grid_node_features, inputs, forcings)
    k1, k2, k3 = jax.random.split(rng, 3)
    latent = self._mc.latent_size
    batch = gnf.shape[1]
    dtype = gnf.dtype

    statics = self._host_statics()
    abstract_statics = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), statics)

    g2m = jax.eval_shape(self._grid2mesh_graph, abstract_statics,
                         jax.ShapeDtypeStruct(gnf.shape, dtype))
    params = {"grid2mesh_gnn": self._grid2mesh_gnn.init(k1, g2m)}
    mesh_l = jax.ShapeDtypeStruct(
        (self._artifact.num_mesh_nodes, batch, latent), dtype)
    grid_l = jax.ShapeDtypeStruct(
        (self._artifact.num_grid_nodes, batch, latent), dtype)
    params["mesh_gnn"] = self._mesh_gnn.init(
        k2, jax.eval_shape(self._mesh_graph, abstract_statics, mesh_l))
    params["mesh2grid_gnn"] = self._mesh2grid_gnn.init(
        k3, jax.eval_shape(self._mesh2grid_graph, abstract_statics, mesh_l,
                           grid_l))
    params["graph_statics"] = statics
    return params

  def attach_graph_statics(self, params, inputs: FieldSet):
    """Adds the graph-statics entry to params loaded from a reference
    checkpoint (which stores only learned parameters)."""
    self._maybe_init(inputs)
    return {**params, "graph_statics": self._host_statics()}

  def __call__(self, params, rng, inputs, targets_template, forcings,
               static_edge_latents=None, **kwargs):
    del rng  # deterministic
    self._maybe_init(inputs)
    grid_node_features = self._inputs_to_grid_node_features(inputs, forcings)

    statics = self._statics(params)
    sel = static_edge_latents or {}

    # Encode (grid2mesh).
    with jax.named_scope("grid2mesh_gnn"):
      if (self._g2m_fused is not None
          and grid_node_features.shape[1] == 1):
        const = sel.get("g2m_const")
        if const is None:
          const = self._static_edge_const(
              params["grid2mesh_gnn"], self._grid2mesh_gnn,
              statics["g2m_edge_features"], max(self._encode_chunks, 8),
              grid_node_features.dtype)
        latent_mesh_nodes, latent_grid_nodes = self._run_grid2mesh_fused(
            params, statics, grid_node_features, const)
      elif self._encode_chunks > 1 and self._g2m_plan is not None:
        # Stage-level remat: under grad, drop the encoder's grid-node-sized
        # internals (grid_in concat, grid_emb, grid_proj ≈ 3 GB at 0.25°)
        # while the processor/decoder backwards run; the encoder forward is
        # recomputed once when its own backward starts. Identity under pure
        # inference.
        def _encode(p, gnf):
          return self._run_grid2mesh_chunked(
              p, statics, gnf, const=sel.get("g2m_const"))
        latent_mesh_nodes, latent_grid_nodes = jax.checkpoint(_encode)(
            params, grid_node_features)
      else:
        g2m_out = self._grid2mesh_gnn.apply(
            params["grid2mesh_gnn"],
            self._grid2mesh_graph(statics, grid_node_features),
            kernel_statics={"grid2mesh": _agg_masks(statics, "g2m")})
        latent_mesh_nodes = g2m_out.nodes["mesh_nodes"].features
        latent_grid_nodes = g2m_out.nodes["grid_nodes"].features

    # Process (multi-mesh).
    with jax.named_scope("mesh_gnn"):
      mesh_out = self._mesh_gnn.apply(
          params["mesh_gnn"], self._mesh_graph(statics, latent_mesh_nodes),
          kernel_statics={"mesh": _agg_masks(statics, "mesh")})
    updated_latent_mesh_nodes = mesh_out.nodes["mesh_nodes"].features

    # Decode (mesh2grid).
    with jax.named_scope("mesh2grid_gnn"):
      if (self._m2g_decoder is not None
          and updated_latent_mesh_nodes.shape[1] == 1):
        const_slot = sel.get("m2g_const_slot")
        if const_slot is None:
          k = self._choose_chunks(self._artifact.num_grid_nodes,
                                  max(self._decode_chunks, 8))
          const = self._static_edge_const(
              params["mesh2grid_gnn"], self._mesh2grid_gnn,
              statics["m2g_edge_features"], k,
              updated_latent_mesh_nodes.dtype)
          const_slot = self._m2g_decoder.rearrange_edge_array(const[:, 0])
        output_grid_nodes = self._run_mesh2grid_fused(
            params, statics, updated_latent_mesh_nodes, latent_grid_nodes,
            const_slot)
      elif self._decode_chunks > 1:
        output_grid_nodes = self._run_mesh2grid_chunked(
            params, statics, updated_latent_mesh_nodes, latent_grid_nodes,
            const=sel.get("m2g_const"))
      else:
        m2g_out = self._mesh2grid_gnn.apply(
            params["mesh2grid_gnn"],
            self._mesh2grid_graph(statics, updated_latent_mesh_nodes,
                                  latent_grid_nodes))
        output_grid_nodes = m2g_out.nodes["grid_nodes"].features

    return self._grid_node_outputs_to_prediction(
        output_grid_nodes, targets_template)

  def loss_and_predictions(self, params, rng, inputs, targets, forcings,
                           **kwargs):
    predictions = self(params, rng, inputs, targets, forcings, **kwargs)
    weights = {k: v for k, v in configs.GRAPHCAST_LOSS_WEIGHTS.items()
               if k in targets.var_names}
    loss = losses.weighted_mse_per_level(
        predictions, targets, per_variable_weights=weights)
    return loss, predictions

  def loss(self, params, rng, inputs, targets, forcings, **kwargs):
    loss, _ = self.loss_and_predictions(params, rng, inputs, targets,
                                        forcings, **kwargs)
    return loss
