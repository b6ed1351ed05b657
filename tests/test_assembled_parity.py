"""Assembled-model forward parity against the reference's own model classes.

The module-level parity suite (tests/test_reference_parity.py) proves every
PIECE matches — DeepTypedGraphNet, Transformer, MeshTransformer, Fourier MLP,
geometry, channel stacking, serializers, naming. This file proves the
ASSEMBLY matches: the reference's own `GraphCast` internal chain
(graphcast.py:357-416 — input packing -> `_run_grid2mesh_gnn` with
zero-padded mesh inputs -> `_run_mesh_gnn` multi-mesh processor ->
`_run_mesh2grid_gnn` -> outputs) and the GenCast `_DenoiserArchitecture`
chain (denoiser.py:396-451, with global norm conditioning threaded into all
three stages) are run under REAL dm-haiku on weights shared through
compat/haiku_checkpoint, and must equal our models' full `__call__`
end-to-end (minus the xarray boundary, which is env-blocked: xarray is not
installable here).

Technique: the reference's `graphcast.py`/`denoiser.py` import cleanly once
`trimesh` (unavailable) and the xarray-facing helpers (`predictor_base`,
`losses`, `xarray_jax`) are stubbed — none of their functionality is used by
the internal chain we drive. The graph *structures* are initialized exactly
as the reference's `_init_{grid2mesh,mesh,mesh2grid}_graph`
(graphcast.py:467-607) except the trimesh-backed connectivity queries
(`radius_query_indices` / `in_mesh_triangle_indices`), whose edge lists are
injected from our geometry compiler, mapped into the reference's mesh-vertex
numbering through the position bijection (vertex ORDER differs by
construction; the GNN is mesh-permutation-equivariant and each side's
features/edges are self-consistent, so grid outputs must still agree).
Spatial edge/node features are computed by each side's own code — feature
divergence fails this test.
"""

import functools
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphcast_tpu.compat import haiku_checkpoint
from graphcast_tpu.fields import FieldSet
from graphcast_tpu.models import configs

REFERENCE_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# Reference model import (stubbed xarray boundary).
# ---------------------------------------------------------------------------


@functools.lru_cache()
def ref_models():
  """Imports the reference's graphcast.py + denoiser.py with the xarray
  boundary stubbed out (everything the 3-GNN chains touch is real)."""
  from tests import fake_xarray
  fake_xarray.install_if_missing()
  from tests.test_reference_parity import _install_jraph_shim
  _install_jraph_shim()
  if "trimesh" not in sys.modules:
    # grid_mesh_connectivity imports trimesh at module level but only calls
    # it inside the two connectivity queries we bypass.
    sys.modules["trimesh"] = types.ModuleType("trimesh")
  if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

  import graphcast as _pkg  # the reference package __init__ is empty

  if "graphcast.predictor_base" not in sys.modules:
    pb = types.ModuleType("graphcast.predictor_base")

    class _Predictor:  # graphcast.GraphCast's abstract base; methods unused
      pass

    pb.Predictor = _Predictor
    pb.LossAndDiagnostics = object
    sys.modules["graphcast.predictor_base"] = pb
    _pkg.predictor_base = pb
  # Functional xarray_jax shim backed by fake xarray (round 5): the wrapper-
  # stack parity tests run the reference's OWN normalization / casting /
  # autoregressive / losses / sampler code, which need working unwrap /
  # DataArray plus pytree-registered fake-xarray containers.
  fake_xarray.install_reference_xarray_jax()

  import haiku as hk
  from graphcast import denoiser as ref_denoiser
  from graphcast import graphcast as ref_graphcast
  from graphcast import losses as ref_losses
  from graphcast import model_utils as ref_model_utils
  from graphcast import typed_graph as ref_tg
  return types.SimpleNamespace(
      hk=hk, gc=ref_graphcast, dn=ref_denoiser, mu=ref_model_utils,
      tg=ref_tg, losses=ref_losses)


def _vertex_perm(our_vertices, ref_vertices):
  """perm[our_idx] = ref_idx (bijection asserted)."""
  from scipy.spatial import cKDTree
  dist, perm = cKDTree(ref_vertices.astype(np.float64)).query(
      our_vertices.astype(np.float64))
  assert len(set(perm.tolist())) == len(perm), "not a bijection"
  assert dist.max() < 1e-6, f"vertex positions diverge: {dist.max()}"
  return perm.astype(np.int32)


def _ref_bipartite_graph(r, name, senders_latlon, receivers_latlon,
                         senders, receivers, n_send, n_recv,
                         send_name, recv_name,
                         edge_normalization_factor,
                         spatial_features_kwargs):
  """Replicates the reference's `_init_grid2mesh_graph` /
  `_init_mesh2grid_graph` bodies (graphcast.py:467-517, 559-607) with the
  trimesh connectivity replaced by injected edge indices."""
  (senders_node_features, receivers_node_features, edge_features
   ) = r.mu.get_bipartite_graph_spatial_features(
       senders_node_lat=senders_latlon[0],
       senders_node_lon=senders_latlon[1],
       receivers_node_lat=receivers_latlon[0],
       receivers_node_lon=receivers_latlon[1],
       senders=senders,
       receivers=receivers,
       edge_normalization_factor=edge_normalization_factor,
       **spatial_features_kwargs)
  send_set = r.tg.NodeSet(n_node=np.array([n_send]),
                          features=senders_node_features)
  recv_set = r.tg.NodeSet(n_node=np.array([n_recv]),
                          features=receivers_node_features)
  edge_set = r.tg.EdgeSet(
      n_edge=np.array([len(senders)]),
      indices=r.tg.EdgesIndices(senders=senders, receivers=receivers),
      features=edge_features)
  return r.tg.TypedGraph(
      context=r.tg.Context(n_graph=np.array([1]), features=()),
      nodes={send_name: send_set, recv_name: recv_set},
      edges={r.tg.EdgeSetKey(name, (send_name, recv_name)): edge_set})


def build_ref_graphcast(r, art, grid_lat, grid_lon, ref_mc, ref_tc):
  """Constructs the reference GraphCast and initializes its graph
  structures exactly as _maybe_init (graphcast.py:427-439) except the two
  trimesh-backed edge queries, injected in reference vertex numbering.
  Shared by the assembled-forward and wrapper-stack parity suites."""
  model = r.gc.GraphCast(ref_mc, ref_tc)
  model._init_mesh_properties()
  model._init_grid_properties(grid_lat=grid_lat, grid_lon=grid_lon)
  # The mesh (processor) graph is fully self-contained upstream code.
  model._mesh_graph_structure = model._init_mesh_graph()
  perm = _vertex_perm(art.mesh_vertices,
                      model._finest_mesh.vertices)
  model._grid2mesh_graph_structure = _ref_bipartite_graph(
      r, "grid2mesh",
      (model._grid_nodes_lat, model._grid_nodes_lon),
      (model._mesh_nodes_lat, model._mesh_nodes_lon),
      senders=art.grid2mesh.senders,
      receivers=perm[art.grid2mesh.receivers],
      n_send=model._num_grid_nodes, n_recv=model._num_mesh_nodes,
      send_name="grid_nodes", recv_name="mesh_nodes",
      edge_normalization_factor=None,
      spatial_features_kwargs=model._spatial_features_kwargs)
  model._mesh2grid_graph_structure = _ref_bipartite_graph(
      r, "mesh2grid",
      (model._mesh_nodes_lat, model._mesh_nodes_lon),
      (model._grid_nodes_lat, model._grid_nodes_lon),
      senders=perm[art.mesh2grid.senders],
      receivers=art.mesh2grid.receivers,
      n_send=model._num_mesh_nodes, n_recv=model._num_grid_nodes,
      send_name="mesh_nodes", recv_name="grid_nodes",
      edge_normalization_factor=(
          model._mesh2grid_edge_normalization_factor),
      spatial_features_kwargs=model._spatial_features_kwargs)
  model._initialized = True
  return model


# ---------------------------------------------------------------------------
# GraphCast: reference _run_grid2mesh_gnn -> _run_mesh_gnn ->
# _run_mesh2grid_gnn vs our GraphCast.__call__.
# ---------------------------------------------------------------------------

TINY_TASK = configs.TaskConfig(
    input_variables=(
        "2m_temperature", "temperature", "toa_incident_solar_radiation",
        "land_sea_mask"),
    target_variables=("2m_temperature", "temperature"),
    forcing_variables=("toa_incident_solar_radiation",),
    pressure_levels=(500, 850),
    input_duration="12h",
)
TINY_MODEL = configs.ModelConfig(
    resolution=30.0, mesh_size=2, latent_size=16, gnn_msg_steps=3,
    hidden_layers=1, radius_query_fraction_edge_length=0.6)


def _pred_to_grid_nodes(preds: FieldSet):
  """FieldSet prediction -> [num_grid_nodes, batch, C] node-major stacked
  array (the exact inverse of GraphCast._grid_node_outputs_to_prediction)."""
  from graphcast_tpu.fields import to_stacked
  stacked = to_stacked(preds)  # [batch, lat, lon, C]
  stacked = jnp.transpose(stacked, (1, 2, 0, 3))
  return stacked.reshape((-1,) + stacked.shape[2:])


def test_graphcast_assembled_forward_matches_reference():
  r = ref_models()
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models.graphcast import GraphCast

  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2, num_target_times=1)

  ours = GraphCast(TINY_MODEL, TINY_TASK, cache_dir="")
  ours._maybe_init(inputs)
  art = ours._artifact
  grid_lat = np.asarray(inputs.coords["lat"], np.float32)
  grid_lon = np.asarray(inputs.coords["lon"], np.float32)

  ref_mc = r.gc.ModelConfig(
      resolution=TINY_MODEL.resolution, mesh_size=TINY_MODEL.mesh_size,
      latent_size=TINY_MODEL.latent_size,
      gnn_msg_steps=TINY_MODEL.gnn_msg_steps,
      hidden_layers=TINY_MODEL.hidden_layers,
      radius_query_fraction_edge_length=(
          TINY_MODEL.radius_query_fraction_edge_length))
  ref_tc = r.gc.TaskConfig(
      input_variables=TINY_TASK.input_variables,
      target_variables=TINY_TASK.target_variables,
      forcing_variables=TINY_TASK.forcing_variables,
      pressure_levels=TINY_TASK.pressure_levels,
      input_duration=TINY_TASK.input_duration)

  def make_ref_model():
    return build_ref_graphcast(r, art, grid_lat, grid_lon, ref_mc, ref_tc)

  def ref_fwd(grid_node_features):
    model = make_ref_model()
    latent_mesh, latent_grid = model._run_grid2mesh_gnn(grid_node_features)
    updated_mesh = model._run_mesh_gnn(latent_mesh)
    return model._run_mesh2grid_gnn(updated_mesh, latent_grid)

  gnf = ours._inputs_to_grid_node_features(inputs, forcings)
  gnf = np.asarray(gnf, np.float32)

  transformed = r.hk.transform(ref_fwd)
  haiku_params = transformed.init(jax.random.PRNGKey(7), gnf)

  # Naming: the reference's assembled-model haiku keyset is exactly what our
  # converter emits for our param tree (so full checkpoints cross-load).
  native = haiku_checkpoint.haiku_params_to_native(
      {k: dict(v) for k, v in haiku_params.items()})
  back = haiku_checkpoint.native_params_to_haiku(native)
  assert set(back) == set(dict(haiku_params)), (
      set(back) ^ set(dict(haiku_params)))

  our_init = ours.init(jax.random.PRNGKey(0), inputs, targets, forcings)
  our_keys = {k for k in our_init if k != "graph_statics"}
  assert set(native) == our_keys

  ref_out = transformed.apply(haiku_params, jax.random.PRNGKey(0), gnf)

  params = ours.attach_graph_statics(native, inputs)
  preds = ours(params, jax.random.PRNGKey(0), inputs, targets, forcings)
  our_out = _pred_to_grid_nodes(preds)

  assert our_out.shape == ref_out.shape
  # Non-vacuity: a wiring bug that zeroes a stage must not pass on ~0 data.
  assert float(jnp.abs(jnp.asarray(ref_out)).mean()) > 1e-3
  np.testing.assert_allclose(
      np.asarray(our_out), np.asarray(ref_out), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# GenCast denoiser: reference _DenoiserArchitecture chain (with the Fourier
# noise encoder feeding global norm conditioning into all three stages,
# denoiser.py:396-451) vs our Denoiser.apply.
# ---------------------------------------------------------------------------


def test_denoiser_assembled_forward_matches_reference():
  r = ref_models()
  import dataclasses as _dc

  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import sparse_transformer as our_st
  from graphcast_tpu.models.denoiser import (
      Denoiser, DenoiserArchitectureConfig, NoiseEncoderConfig)

  num_outputs = configs.num_output_channels(TINY_TASK)
  st_kwargs = dict(attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
                   attention_type="mha", ffw_hidden=32)
  our_cfg = DenoiserArchitectureConfig(
      sparse_transformer_config=our_st.SparseTransformerConfig(
          block_q=64, block_kv=64, **st_kwargs),
      mesh_size=2, latent_size=16, hidden_layers=1,
      node_output_size=num_outputs)
  noise_kwargs = dict(num_frequencies=8, output_sizes=(16, 8))

  ours = Denoiser(NoiseEncoderConfig(**noise_kwargs), our_cfg, cache_dir="",
                  interpret_attention=True)

  inputs, targets, forcings = synthetic.make_example_batch(
      TINY_TASK, resolution=30.0, batch=2, num_target_times=1,
      time_step_hours=12)
  rng = jax.random.PRNGKey(3)
  noise_levels = jnp.asarray([0.4, 1.7], jnp.float32)
  # Noisy targets stand in for the sampler's current iterate.
  noisy_targets = FieldSet(
      {n: targets[n] for n in targets.var_names}, coords=targets.coords)

  our_params = ours.init(rng, inputs, noisy_targets, noise_levels, forcings)
  arch = ours._architecture
  art = arch._artifact
  grid_lat = np.asarray(inputs.coords["lat"], np.float32)
  grid_lon = np.asarray(inputs.coords["lon"], np.float32)

  ref_arch_cfg = r.dn.DenoiserArchitectureConfig(
      sparse_transformer_config=r.dn.SparseTransformerConfig(
          mask_type="lazy", block_q=64, block_kv=64, **st_kwargs),
      mesh_size=our_cfg.mesh_size, latent_size=our_cfg.latent_size,
      hidden_layers=our_cfg.hidden_layers,
      radius_query_fraction_edge_length=(
          our_cfg.radius_query_fraction_edge_length),
      norm_conditioning_features=("noise_level_encodings",),
      node_output_size=num_outputs)

  def ref_fwd(grid_node_features, noise_levels):
    model = r.dn._DenoiserArchitecture(
        denoiser_architecture_config=ref_arch_cfg)
    model._init_mesh_properties()
    model._init_grid_properties(grid_lat=grid_lat, grid_lon=grid_lon)
    # The denoiser's mesh graph (and its attention mask) is self-contained:
    # the reference RCM-permutes its mesh, we BFS/RCM-permute ours; each
    # side's edges/features/mask are consistent in its own numbering.
    model._mesh_graph_structure = model._init_mesh_graph()
    perm = _vertex_perm(art.mesh_vertices, model._mesh.vertices)
    model._grid2mesh_graph_structure = _ref_bipartite_graph(
        r, "grid2mesh",
        (model._grid_nodes_lat, model._grid_nodes_lon),
        (model._mesh_nodes_lat, model._mesh_nodes_lon),
        senders=art.grid2mesh.senders,
        receivers=perm[art.grid2mesh.receivers],
        n_send=model._num_grid_nodes, n_recv=model._num_mesh_nodes,
        send_name="grid_nodes", recv_name="mesh_nodes",
        edge_normalization_factor=None,
        spatial_features_kwargs=model._spatial_features_kwargs)
    model._mesh2grid_graph_structure = _ref_bipartite_graph(
        r, "mesh2grid",
        (model._mesh_nodes_lat, model._mesh_nodes_lon),
        (model._grid_nodes_lat, model._grid_nodes_lon),
        senders=perm[art.mesh2grid.senders],
        receivers=art.mesh2grid.receivers,
        n_send=model._num_mesh_nodes, n_recv=model._num_grid_nodes,
        send_name="mesh_nodes", recv_name="grid_nodes",
        edge_normalization_factor=None,
        spatial_features_kwargs=model._spatial_features_kwargs)
    model._initialized = True
    # Denoiser.__call__ (denoiser.py:221-246): Fourier-encode noise levels;
    # they ride as global norm conditioning through all three stages.
    encodings = r.dn.FourierFeaturesMLP(**_dc.asdict(
        r.dn.NoiseEncoderConfig(**noise_kwargs)))(noise_levels)
    latent_mesh, latent_grid = model._run_grid2mesh_gnn(
        grid_node_features, encodings)
    updated_mesh = model._run_mesh_gnn(latent_mesh, encodings)
    return model._run_mesh2grid_gnn(updated_mesh, latent_grid, encodings)

  # The reference packs noisy targets as extra forcings
  # (denoiser.py:227-228); replicate its input assembly from our pinned
  # stacking (dataset_to_stacked parity is machine-checked separately).
  # With no conditioning variables present in `inputs`, the split returns
  # exactly the stacked grid features the real path computes after dropping
  # noise_level_encodings.
  all_forcings = FieldSet.merge([forcings, noisy_targets])
  gnf, none_cond = arch._split_features_and_conditioning(inputs, all_forcings)
  assert none_cond is None
  gnf = np.asarray(gnf, np.float32)

  transformed = r.hk.transform(ref_fwd)
  haiku_params = transformed.init(
      jax.random.PRNGKey(11), gnf, np.asarray(noise_levels))

  native = haiku_checkpoint.gencast_haiku_params_to_native(
      {k: dict(v) for k, v in haiku_params.items()})
  back = haiku_checkpoint.native_gencast_params_to_haiku(native)
  assert set(back) == set(dict(haiku_params)), (
      set(back) ^ set(dict(haiku_params)))
  # Same flat keyset as our own init (naming parity at full-denoiser scope).
  ours_haiku = haiku_checkpoint.native_gencast_params_to_haiku(our_params)
  assert set(ours_haiku) == set(dict(haiku_params)), (
      set(ours_haiku) ^ set(dict(haiku_params)))

  ref_out = transformed.apply(
      haiku_params, jax.random.PRNGKey(0), gnf, np.asarray(noise_levels))

  # No "graph_statics" entry: DenoiserArchitecture._statics falls back to
  # host statics (exactly what attach does for GraphCast).
  preds = ours.apply(native, inputs, noisy_targets, noise_levels, forcings)
  our_out = _pred_to_grid_nodes(preds)

  assert our_out.shape == ref_out.shape
  assert float(jnp.abs(jnp.asarray(ref_out)).mean()) > 1e-3
  np.testing.assert_allclose(
      np.asarray(our_out), np.asarray(ref_out), rtol=2e-4, atol=2e-5)
