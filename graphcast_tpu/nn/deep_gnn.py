"""Deep typed-graph GNN (reference: graphcast/deep_typed_graph_net.py:53-461).

Encoder (per-type MLP+LayerNorm embed) → N unshared InteractionNetwork steps
× M shared repetitions, with node+edge residuals → per-type decoder MLPs.

Functional: ``init(key, graph_template) -> params``;
``apply(params, graph, global_norm_conditioning=None) -> TypedGraph``.

Param names follow the reference's Haiku module naming scheme
(encoder_*/processor_{i}_*/decoder_*) to keep a straightforward mapping for
checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from graphcast_tpu.nn import core
from graphcast_tpu.nn import message_passing as mp
from graphcast_tpu.nn.typed_graph import TypedGraph
from graphcast_tpu.ops import segment


@dataclasses.dataclass
class DeepGraphNet:
  """Config for the deep typed-graph network.

  Attributes mirror the reference's DeepTypedGraphNet
  (deep_typed_graph_net.py:105-180); see there for semantics.
  """
  node_latent_size: Mapping[str, int]
  edge_latent_size: Mapping[str, int]
  mlp_hidden_size: int
  mlp_num_hidden_layers: int
  num_message_passing_steps: int
  num_processor_repetitions: int = 1
  embed_nodes: bool = True
  embed_edges: bool = True
  node_output_size: Optional[Mapping[str, int]] = None
  edge_output_size: Optional[Mapping[str, int]] = None
  include_sent_messages_in_node_update: bool = False
  use_layer_norm: bool = True
  use_norm_conditioning: bool = False
  norm_conditioning_size: Optional[int] = None
  activation: str = "relu"
  f32_aggregation: bool = False
  aggregate_normalization: Optional[float] = None
  # Factor the processor edge-MLP first layer: project per node then gather
  # (exactly equivalent algebra, fewer FLOPs; see
  # core.MLPWithNorm.apply_factored_edge_update).
  factored_edge_updates: bool = True
  # Optional per-edge-set fused receiver aggregators (e.g.
  # ops.pallas_mp.BlockedSegmentSum); falls back to segment_sum when absent
  # or when shapes don't fit the kernel (batch > 1).
  edge_aggregators: Optional[Mapping[str, object]] = None
  # Rematerialize each processor step under grad (jax.checkpoint): the
  # backward recomputes a step's edge/node MLP intermediates from the step
  # inputs instead of saving them (~1.5 GB/step at 0.25°/mesh-6 × 16 steps
  # unsaved). Enable for training big configs; free for inference.
  remat_steps: bool = False
  # Optional per-edge-set fully-fused processor steps
  # (ops.pallas_edge.FusedEdgeStep): the entire edge-MLP + LayerNorm +
  # residual + aggregation in one Pallas pass. Engages only for
  # single-node-set/single-edge-set graphs with batch == 1,
  # mlp_num_hidden_layers == 1, layer norm on and norm conditioning off
  # (the GraphCast mesh processor); otherwise the general path runs.
  fused_edge_steps: Optional[Mapping[str, object]] = None

  # ----- spec construction (all static) -----

  def _mlp_with_norm(self, in_size: int, out_size: int) -> core.MLPWithNorm:
    return core.MLPWithNorm(
        in_size=in_size,
        hidden_size=self.mlp_hidden_size,
        num_hidden_layers=self.mlp_num_hidden_layers,
        out_size=out_size,
        activation=self.activation,
        use_layer_norm=self.use_layer_norm,
        use_norm_conditioning=self.use_norm_conditioning,
        norm_conditioning_size=self.norm_conditioning_size)

  def _plain_mlp(self, in_size: int, out_size: int) -> core.MLPWithNorm:
    # Decoder MLPs have no layer norm (reference:
    # deep_typed_graph_net.py:316-321 uses build_mlp for the decoder).
    return core.MLPWithNorm(
        in_size=in_size,
        hidden_size=self.mlp_hidden_size,
        num_hidden_layers=self.mlp_num_hidden_layers,
        out_size=out_size,
        activation=self.activation,
        use_layer_norm=False,
        use_norm_conditioning=False)

  def _specs(self, graph: TypedGraph) -> dict[str, core.MLPWithNorm]:
    """Builds {param_name: MLPWithNorm} from the (static) graph shapes."""
    node_in = {name: ns.features.shape[-1] for name, ns in graph.nodes.items()}
    edge_in = {key.name: es.features.shape[-1]
               for key, es in graph.edges.items()}
    context_size = 0
    if isinstance(graph.context.features, (jnp.ndarray,)) or (
        hasattr(graph.context.features, "shape")):
      context_size = graph.context.features.shape[-1]

    sender_of = {k.name: k.node_sets[0] for k in graph.edges}
    receiver_of = {k.name: k.node_sets[1] for k in graph.edges}
    edge_order = [k.name for k in graph.edges]

    specs: dict[str, core.MLPWithNorm] = {}

    # Encoder.
    if self.embed_edges:
      for name, latent in self.edge_latent_size.items():
        specs[f"encoder_edges_{name}"] = self._mlp_with_norm(
            edge_in[name], latent)
    if self.embed_nodes:
      for name, latent in self.node_latent_size.items():
        specs[f"encoder_nodes_{name}"] = self._mlp_with_norm(
            node_in[name] + context_size, latent)

    def node_latent(name):
      if name in self.node_latent_size:
        return self.node_latent_size[name]
      # Not embedded: latent size is whatever came in.
      return node_in[name]

    # Processor steps.
    for i in range(self.num_message_passing_steps):
      for name, latent in self.edge_latent_size.items():
        in_size = (latent + node_latent(sender_of[name])
                   + node_latent(receiver_of[name]))
        specs[f"processor_{i}_edges_{name}"] = self._mlp_with_norm(
            in_size, latent)
      for name, latent in self.node_latent_size.items():
        in_size = latent
        if self.include_sent_messages_in_node_update:
          in_size += sum(self.edge_latent_size[e] for e in edge_order
                         if sender_of[e] == name)
        in_size += sum(self.edge_latent_size[e] for e in edge_order
                       if receiver_of[e] == name)
        specs[f"processor_{i}_nodes_{name}"] = self._mlp_with_norm(
            in_size, latent)

    # Decoder.
    if self.edge_output_size:
      for name, out in self.edge_output_size.items():
        specs[f"decoder_edges_{name}"] = self._plain_mlp(
            self.edge_latent_size[name], out)
    if self.node_output_size:
      for name, out in self.node_output_size.items():
        specs[f"decoder_nodes_{name}"] = self._plain_mlp(
            self.node_latent_size[name], out)
    return specs

  # ----- init / apply -----

  def init(self, key, graph_template: TypedGraph) -> core.Params:
    specs = self._specs(graph_template)
    keys = jax.random.split(key, len(specs))
    return {name: spec.init(k)
            for (name, spec), k in zip(sorted(specs.items()), keys)}

  def apply(self, params: core.Params, graph: TypedGraph,
            global_norm_conditioning=None, kernel_statics=None) -> TypedGraph:
    """kernel_statics: optional {edge_set_name: (mask, mask_t)} device
    arrays for the fused aggregation kernels (threaded from the model's
    graph_statics so the bitpacked masks are jit args, not HLO
    constants)."""
    if self.use_norm_conditioning and global_norm_conditioning is None:
      raise ValueError("global_norm_conditioning required")
    if not self.use_norm_conditioning and global_norm_conditioning is not None:
      raise ValueError("global_norm_conditioning passed but not enabled")
    specs = self._specs(graph)

    gnc = global_norm_conditioning
    if gnc is not None and gnc.ndim == 2:
      # [batch, cond] -> broadcast over the node/edge axis.
      gnc = gnc[None]

    def fn(name):
      spec = specs[name]
      p = params[name]
      if spec.use_norm_conditioning:  # decoder MLPs are plain, skip there
        return lambda *xs: spec.apply(p, *xs, global_norm_conditioning=gnc)
      return lambda *xs: spec.apply(p, *xs)

    # 1. Broadcast-concat context features onto every node set, if present
    # (reference: deep_typed_graph_net.py:333-350).
    context = graph.context.features
    if hasattr(context, "shape") and context.size:
      new_nodes = {}
      for name, node_set in graph.nodes.items():
        feats = node_set.features
        ctx = jnp.broadcast_to(context[None],
                               feats.shape[:-1] + context.shape[-1:])
        new_nodes[name] = node_set._replace(
            features=jnp.concatenate([feats, ctx.astype(feats.dtype)], axis=-1))
      graph = graph._replace(
          nodes=new_nodes, context=graph.context._replace(features=()))

    # 2. Embed.
    graph = mp.apply_graph_map_features(
        graph,
        embed_edge_fn={n: fn(f"encoder_edges_{n}")
                       for n in self.edge_latent_size} if self.embed_edges
        else None,
        embed_node_fn={n: fn(f"encoder_nodes_{n}")
                       for n in self.node_latent_size} if self.embed_nodes
        else None)

    # 3. Process with residuals (reference: deep_typed_graph_net.py:373-394).
    def aggregate(data, receivers, num_nodes, edge_set_name=None,
                  indices_are_sorted=True):
      # Fused kernels assume the receiver-sorted edge layout; only engage on
      # the sorted (receiver) aggregation path. Batches are handled by the
      # kernel (flattened into channels).
      fused = (self.edge_aggregators or {}).get(
          edge_set_name if indices_are_sorted else None)
      if fused is not None and data.ndim == 3:
        ks = (kernel_statics or {}).get(edge_set_name)
        out = fused(data, ks)  # f32 accumulation inside the kernel
        if self.aggregate_normalization is not None:
          out = out / self.aggregate_normalization
        return out
      return segment.aggregate_edges_for_nodes(
          data, receivers, num_nodes,
          f32_aggregation=self.f32_aggregation,
          normalization=self.aggregate_normalization,
          indices_are_sorted=indices_are_sorted)

    def factored_fn(name):
      spec = specs[name]
      p = params[name]
      if spec.use_norm_conditioning:
        return lambda *xs: spec.apply_factored_edge_update(
            p, *xs, global_norm_conditioning=gnc)
      return lambda *xs: spec.apply_factored_edge_update(p, *xs)

    edge_fn_builder = factored_fn if self.factored_edge_updates else fn
    fused_step = self._fused_step_target(graph)

    def one_step(graph, i):
      if fused_step is not None:
        return self._apply_fused_step(params, graph, i, specs, fused_step,
                                      kernel_statics)
      prev = graph
      graph = mp.apply_graph_network(
          graph,
          update_edge_fn={n: edge_fn_builder(f"processor_{i}_edges_{n}")
                          for n in self.edge_latent_size},
          update_node_fn={n: fn(f"processor_{i}_nodes_{n}")
                          for n in self.node_latent_size},
          aggregate_edges_for_nodes_fn=aggregate,
          include_sent_messages_in_node_update=(
              self.include_sent_messages_in_node_update),
          factored_edge_fns=self.factored_edge_updates)
      return graph._replace(
          nodes={k: ns._replace(
              features=prev.nodes[k].features + ns.features)
                 for k, ns in graph.nodes.items()},
          edges={k: es._replace(
              features=prev.edges[k].features + es.features)
                 for k, es in graph.edges.items()})

    if self.remat_steps:
      # Two-level (√N-blocked) checkpointing: only every B-th step boundary
      # is saved (B ≈ √num_steps); the backward replays a block (with
      # per-step inner remat) before differentiating it. At 0.25°/mesh-6
      # this keeps ~4 instead of 16 [330k, 512] boundary tensors resident.
      inner = jax.checkpoint(one_step, static_argnums=(1,))
      block = max(1, int(round(self.num_message_passing_steps ** 0.5)))

      def block_fn(graph, i0, n):
        for j in range(n):
          graph = inner(graph, i0 + j)
        return graph

      block_fn = jax.checkpoint(block_fn, static_argnums=(1, 2))
      from jax.ad_checkpoint import checkpoint_name
      total = (self.num_processor_repetitions
               * self.num_message_passing_steps)
      done = 0
      for _ in range(self.num_processor_repetitions):
        i = 0
        while i < self.num_message_passing_steps:
          n = min(block, self.num_message_passing_steps - i)
          graph = block_fn(graph, i, n)
          done += n
          if done < total:
            # Name the inter-block boundaries so an ENCLOSING checkpoint
            # may offload them (policy save_and_offload_only_these_names
            # with "mp_block_carry", e.g. Autoregressive's
            # loss_offload_processor_carries): the saved [E, C] boundary
            # latents are ~364 MB each at 0.25°/mesh-6 and dominate the
            # per-AR-step backward transient. A no-op under default
            # policies; the final output is left unnamed (it flows to the
            # decoder immediately — offloading it would round-trip host
            # memory for nothing).
            graph = graph._replace(
                nodes={k: ns._replace(features=checkpoint_name(
                    ns.features, "mp_block_carry"))
                       for k, ns in graph.nodes.items()},
                edges={k: es._replace(features=checkpoint_name(
                    es.features, "mp_block_carry"))
                       for k, es in graph.edges.items()})
          i += n
    else:
      for _ in range(self.num_processor_repetitions):
        for i in range(self.num_message_passing_steps):
          graph = one_step(graph, i)

    # 4. Decode.
    graph = mp.apply_graph_map_features(
        graph,
        embed_edge_fn={n: fn(f"decoder_edges_{n}")
                       for n in (self.edge_output_size or {})} or None,
        embed_node_fn={n: fn(f"decoder_nodes_{n}")
                       for n in (self.node_output_size or {})} or None)
    return graph

  # ----- fully-fused processor step (Pallas fast path) -----

  def _fused_step_target(self, graph: TypedGraph):
    """Returns (edge_key, fused_step) when the Pallas fused processor step
    applies to this graph/config, else None."""
    fes = self.fused_edge_steps or {}
    if (not fes or len(graph.edges) != 1 or len(graph.nodes) != 1
        or self.use_norm_conditioning or not self.use_layer_norm
        or self.mlp_num_hidden_layers != 1
        or self.include_sent_messages_in_node_update):
      return None
    key = next(iter(graph.edges))
    step = fes.get(key.name)
    if step is None:
      return None
    node_feats = graph.nodes[key.node_sets[0]].features
    if node_feats.ndim != 3 or node_feats.shape[1] != 1:
      return None  # batch > 1 → general path
    if graph.edges[key].features.shape[0] != step.summer.layout_length:
      return None  # edge set not in this step's padded layout
    return key, step

  def _apply_fused_step(self, params, graph: TypedGraph, i: int, specs,
                        target, kernel_statics=None) -> TypedGraph:
    """One processor step via ops.pallas_edge.FusedEdgeStep: edge MLP +
    LayerNorm + edge residual + aggregation in one kernel; node update and
    residuals outside (cheap: num_nodes rows)."""
    key, step = target
    name = key.name
    node_name = key.node_sets[0]
    e3 = graph.edges[key].features        # [L, 1, C]
    x3 = graph.nodes[node_name].features  # [n, 1, C]
    e = e3[:, 0]
    x = x3[:, 0]
    dtype = e.dtype

    pe = params[f"processor_{i}_edges_{name}"]
    w0 = pe["mlp"]["linear_0"]["w"].astype(dtype)
    le = e.shape[-1]
    ln = x.shape[-1]
    we, ws, wr = w0[:le], w0[le:le + ln], w0[le + ln:]
    senders = graph.edges[key].indices.senders
    gs = (x @ ws)[senders]
    gr_pad = step.pad_nodes(x @ wr)
    e_new, agg = step(
        e, gs, gr_pad, we, pe["mlp"]["linear_0"]["b"],
        pe["mlp"]["linear_1"]["w"], pe["mlp"]["linear_1"]["b"],
        pe["layer_norm"]["scale"], pe["layer_norm"]["offset"],
        masks=(kernel_statics or {}).get(name))
    if self.aggregate_normalization is not None:
      agg = agg / self.aggregate_normalization
    agg = agg.astype(dtype)

    node_spec = specs[f"processor_{i}_nodes_{node_name}"]
    n_upd = node_spec.apply(params[f"processor_{i}_nodes_{node_name}"],
                            x3, agg[:, None])
    return graph._replace(
        nodes={node_name: graph.nodes[node_name]._replace(
            features=x3 + n_upd)},
        edges={key: graph.edges[key]._replace(features=e_new[:, None])})
