"""Geometry tests, modeled on the reference's analytic invariants
(icosahedral_mesh_test.py, grid_mesh_connectivity_test.py) plus stronger
non-smoke containment checks."""

import numpy as np
import pytest

from graphcast_tpu.geometry import artifact, connectivity, features
from graphcast_tpu.geometry import icosahedron as ico


def mesh_spec(splits):
  """Closed-form vertex/face/edge counts for a split icosahedron."""
  num_faces = 20 * 4 ** splits
  num_edges_undirected = 30 * 4 ** splits
  num_vertices = num_edges_undirected + 2 - num_faces  # Euler
  return num_vertices, num_faces, num_edges_undirected


@pytest.mark.parametrize("splits", [0, 1, 2, 3])
def test_hierarchy_counts_and_unit_norm(splits):
  meshes = ico.get_mesh_hierarchy(splits)
  assert len(meshes) == splits + 1
  for level, mesh in enumerate(meshes):
    v, f, _ = mesh_spec(level)
    assert mesh.vertices.shape == (v, 3)
    assert mesh.faces.shape == (f, 3)
    np.testing.assert_allclose(
        np.linalg.norm(mesh.vertices, axis=-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("splits", [0, 1, 2])
def test_faces_oriented_outward(splits):
  mesh = ico.get_mesh_hierarchy(splits)[-1]
  v = mesh.vertices[mesh.faces]
  normals = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
  centroids = v.mean(axis=1)
  assert (np.einsum("fd,fd->f", normals, centroids) > 0).all()


def test_vertices_are_prefix_across_levels():
  meshes = ico.get_mesh_hierarchy(3)
  for coarse, fine in zip(meshes[:-1], meshes[1:]):
    np.testing.assert_allclose(
        fine.vertices[:coarse.vertices.shape[0]], coarse.vertices, atol=1e-6)


def test_merge_meshes_faces_union():
  meshes = ico.get_mesh_hierarchy(2)
  merged = ico.merge_meshes(meshes)
  assert merged.vertices.shape == meshes[-1].vertices.shape
  assert merged.faces.shape[0] == sum(m.faces.shape[0] for m in meshes)


@pytest.mark.parametrize("splits", [0, 1, 2])
def test_faces_to_edges_bidirectional(splits):
  mesh = ico.get_mesh_hierarchy(splits)[-1]
  senders, receivers = ico.faces_to_edges(mesh.faces)
  _, _, und = mesh_spec(splits)
  assert senders.shape[0] == 2 * und
  fwd = set(zip(senders.tolist(), receivers.tolist()))
  assert all((r, s) in fwd for s, r in fwd)
  assert not any(s == r for s, r in fwd)


def test_multimesh_edge_count():
  # Directed edges at mesh-k multimesh: sum_l 60 * 4^l.
  meshes = ico.get_mesh_hierarchy(3)
  merged = ico.merge_meshes(meshes)
  senders, _ = ico.faces_to_edges(merged.faces)
  assert senders.shape[0] == sum(60 * 4 ** l for l in range(4))


def test_lat_lon_conversions_golden():
  # Hand-computed sphere points (like grid_mesh_connectivity_test.py:24-48).
  lat = np.array([90.0, 0.0, 0.0, -90.0])
  lon = np.array([0.0, 0.0, 90.0, 0.0])
  phi, theta = features.lat_lon_deg_to_spherical(lat, lon)
  xyz = np.stack(features.spherical_to_cartesian(phi, theta), axis=-1)
  expected = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, -1]],
                      dtype=float)
  np.testing.assert_allclose(xyz, expected, atol=1e-12)
  lat2, lon2 = features.spherical_to_lat_lon(phi, theta)
  np.testing.assert_allclose(lat2, lat, atol=1e-6)


def test_radius_query_contains_nearest():
  mesh = ico.get_mesh_hierarchy(2)[-1]
  grid_lat = np.linspace(-90, 90, 19)
  grid_lon = np.linspace(0, 342, 20)
  radius = 0.6 * ico.max_edge_length(mesh)
  g, m = connectivity.radius_query_indices(grid_lat, grid_lon, mesh, radius)
  assert g.shape == m.shape
  # Every edge length within radius.
  pos = features.grid_lat_lon_to_node_coordinates(grid_lat, grid_lon)
  d = np.linalg.norm(pos[g] - mesh.vertices[m], axis=-1)
  assert (d <= radius + 1e-6).all()


def test_triangle_containment_exact():
  mesh = ico.get_mesh_hierarchy(2)[-1]
  grid_lat = np.linspace(-90, 90, 13)
  grid_lon = np.linspace(0, 350, 36)
  g, m = connectivity.in_mesh_triangle_indices(grid_lat, grid_lon, mesh)
  n_grid = 13 * 36
  assert g.shape[0] == 3 * n_grid
  assert (np.bincount(g, minlength=n_grid) == 3).all()

  # Verify true containment: each grid point is inside its chosen triangle.
  pos = features.grid_lat_lon_to_node_coordinates(grid_lat, grid_lon)
  pos = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
  tri = m.reshape(n_grid, 3)
  v = mesh.vertices[tri].astype(np.float64)
  for i in (0, 1, 2):
    a = v[:, i]
    b = v[:, (i + 1) % 3]
    margin = np.einsum("pd,pd->p", np.cross(a, b), pos)
    assert (margin >= -1e-7).all()


def test_centroid_test_matches_bruteforce():
  mesh = ico.get_mesh_hierarchy(1)[-1]
  rng = np.random.RandomState(3)
  pts = rng.randn(200, 3)
  pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
  fast = connectivity.containing_triangle_indices(pts, mesh)
  verts = mesh.vertices.astype(np.float64)
  for i in range(0, 200, 17):
    p = pts[i]
    m0 = np.cross(verts[mesh.faces[:, 0]], verts[mesh.faces[:, 1]]) @ p
    m1 = np.cross(verts[mesh.faces[:, 1]], verts[mesh.faces[:, 2]]) @ p
    m2 = np.cross(verts[mesh.faces[:, 2]], verts[mesh.faces[:, 0]]) @ p
    margins = np.minimum(np.minimum(m0, m1), m2)
    assert margins[fast[i]] >= -1e-9


def test_edge_features_in_unit_range():
  mesh = ico.get_mesh_hierarchy(2)[-1]
  senders, receivers = ico.faces_to_edges(mesh.faces)
  phi, theta = features.cartesian_to_spherical(
      mesh.vertices[:, 0], mesh.vertices[:, 1], mesh.vertices[:, 2])
  lat, lon = features.spherical_to_lat_lon(phi, theta)
  node_feats, edge_feats = features.graph_spatial_features(
      lat.astype(np.float32), lon.astype(np.float32), senders, receivers)
  assert node_feats.shape == (mesh.vertices.shape[0], 3)
  assert edge_feats.shape == (senders.shape[0], 4)
  assert np.abs(edge_feats).max() <= 1.0 + 1e-6
  # Symmetric edges: distances in (0, 1], max == 1.
  np.testing.assert_allclose(edge_feats[:, 0].max(), 1.0, atol=1e-6)
  # Receiver-local frame: receiver at lat/lon 0 means displacement x-coord
  # is small for short edges (tangent plane) — just check finite and bounded.
  assert np.isfinite(edge_feats).all()


def test_artifact_build_and_cache(tmp_path):
  grid_lat = np.linspace(-90, 90, 10)
  grid_lon = np.linspace(0, 324, 10)
  art = artifact.build_artifact(grid_lat, grid_lon, mesh_size=1,
                                cache_dir=str(tmp_path))
  assert art.num_grid_nodes == 100
  assert art.num_mesh_nodes == 42
  # receiver-sorted edges
  assert (np.diff(art.grid2mesh.receivers) >= 0).all()
  assert (np.diff(art.mesh.receivers) >= 0).all()
  assert (np.diff(art.mesh2grid.receivers) >= 0).all()
  # mesh2grid: every grid node receives exactly 3 edges
  assert (np.bincount(art.mesh2grid.receivers, minlength=100) == 3).all()

  art2 = artifact.build_artifact(grid_lat, grid_lon, mesh_size=1,
                                 cache_dir=str(tmp_path))
  np.testing.assert_array_equal(art2.mesh.senders, art.mesh.senders)
  np.testing.assert_allclose(art2.grid2mesh.features, art.grid2mesh.features)


def test_rcm_reduces_bandwidth():
  mesh = ico.get_mesh_hierarchy(3)[-1]
  senders, receivers = ico.faces_to_edges(mesh.faces)
  n = mesh.vertices.shape[0]
  perm = artifact.rcm_permutation(senders, receivers, n)
  assert sorted(perm.tolist()) == list(range(n))
  inv = np.empty(n, dtype=np.int64)
  inv[perm] = np.arange(n)
  bw_before = np.abs(senders.astype(int) - receivers.astype(int)).max()
  bw_after = np.abs(inv[senders] - inv[receivers]).max()
  assert bw_after < bw_before


def test_backend_pinned_in_cache_key(tmp_path):
  """Artifacts built by different connectivity backends never share a cache
  entry (ties in triangle containment may differ between backends)."""
  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.geometry import connectivity

  lat = np.linspace(-90, 90, 7)
  lon = np.arange(0, 360, 45.0)
  art = artifact_lib.build_artifact(
      lat, lon, mesh_size=1, cache_dir=str(tmp_path), backend="numpy")
  files_numpy = set(p.name for p in tmp_path.iterdir())
  assert len(files_numpy) == 1

  # Same config again: served from cache, no new entry, same content.
  art2 = artifact_lib.build_artifact(
      lat, lon, mesh_size=1, cache_dir=str(tmp_path), backend="numpy")
  assert set(p.name for p in tmp_path.iterdir()) == files_numpy
  np.testing.assert_array_equal(art.mesh2grid.senders, art2.mesh2grid.senders)

  from graphcast_tpu.native import build as native
  if native.have_native():
    artifact_lib.build_artifact(
        lat, lon, mesh_size=1, cache_dir=str(tmp_path), backend="native")
    assert len(list(tmp_path.iterdir())) == 2  # distinct cache entry

  with pytest.raises(ValueError):
    connectivity.resolve_backend("cuda")


def test_spatial_permutation_preserves_graph_semantics():
  """The multimesh spatial (RCM) node reordering must not change the graph
  as seen from the grid: per-grid-node mesh2grid sender positions/features
  identical, and model outputs invariant."""
  import functools
  import numpy as np
  from graphcast_tpu.geometry import artifact as artifact_lib

  lat = np.arange(-90.0, 91.0, 30.0)
  lon = np.arange(0.0, 360.0, 30.0)
  kw = dict(grid_lat=lat, grid_lon=lon, mesh_size=2,
            radius_query_fraction_edge_length=0.6, multimesh=True,
            cache_dir="")
  a_on = artifact_lib.build_artifact(spatial_permutation=True, **kw)
  a_off = artifact_lib.build_artifact(spatial_permutation=False, **kw)

  assert a_on.mesh.senders.shape == a_off.mesh.senders.shape
  assert a_on.grid2mesh.senders.shape == a_off.grid2mesh.senders.shape
  # Same vertex set, different order.
  v_on = np.sort(a_on.mesh_vertices.round(6).view([('', a_on.mesh_vertices.dtype)] * 3), axis=0)
  v_off = np.sort(a_off.mesh_vertices.round(6).view([('', a_off.mesh_vertices.dtype)] * 3), axis=0)
  assert np.array_equal(v_on, v_off)

  # mesh2grid: per grid receiver, the (sorted) edge-feature rows match.
  def rows_by_receiver(art):
    out = {}
    for i in range(art.num_grid_nodes):
      f = art.mesh2grid.features[3 * i:3 * i + 3]
      out[i] = np.sort(f.round(5), axis=0)
    return out
  r_on, r_off = rows_by_receiver(a_on), rows_by_receiver(a_off)
  for i in range(a_on.num_grid_nodes):
    np.testing.assert_allclose(r_on[i], r_off[i], rtol=1e-4, atol=1e-5)


def test_spatial_permutation_model_invariance(monkeypatch):
  """GraphCast outputs are invariant to the mesh-node ordering."""
  import functools
  import jax
  import numpy as np
  from graphcast_tpu import train
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.geometry import artifact as artifact_lib
  from graphcast_tpu.models import configs
  from graphcast_tpu.models import graphcast as graphcast_mod

  task = configs.TaskConfig(
      input_variables=("2m_temperature", "temperature",
                       "toa_incident_solar_radiation", "land_sea_mask"),
      target_variables=("2m_temperature", "temperature"),
      forcing_variables=("toa_incident_solar_radiation",),
      pressure_levels=(500, 850),
      input_duration="12h")
  model = configs.ModelConfig(
      resolution=30.0, mesh_size=2, latent_size=16, gnn_msg_steps=2,
      hidden_layers=1, radius_query_fraction_edge_length=0.6)
  inputs, targets, forcings = synthetic.make_example_batch(
      task, resolution=30.0, batch=1)
  rng = jax.random.PRNGKey(0)

  orig = artifact_lib.build_artifact
  # Force the permutation ON for the first model so on-vs-off orderings are
  # genuinely compared (build_artifact defaults to spatial_permutation=False).
  monkeypatch.setattr(
      artifact_lib, "build_artifact",
      functools.partial(orig, spatial_permutation=True))
  m_on = graphcast_mod.GraphCast(model, task, cache_dir="")
  params = m_on.init(rng, inputs, targets, forcings)
  out_on = m_on(params, rng, inputs, targets, forcings)

  monkeypatch.setattr(
      artifact_lib, "build_artifact",
      functools.partial(orig, spatial_permutation=False))
  m_off = graphcast_mod.GraphCast(model, task, cache_dir="")
  learned, _ = train.partition_params(params)
  params_off = m_off.attach_graph_statics(dict(learned), inputs)
  out_off = m_off(params_off, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_off.data(n)), np.asarray(out_on.data(n)),
        rtol=2e-4, atol=2e-4)


def test_patch_permutation_valid_and_block_compact():
  """BFS-patch ordering is a valid permutation and yields fewer active
  splash tiles than RCM on a k-hop mask (its purpose — see
  artifact.patch_permutation)."""
  import scipy.sparse as sp
  mesh = ico.get_mesh_hierarchy(4)[-1]
  senders, receivers = ico.faces_to_edges(mesh.faces)
  n = mesh.vertices.shape[0]

  perm = artifact.patch_permutation(senders, receivers, n,
                                    mesh.vertices, 128)
  assert perm.shape == (n,)
  assert np.array_equal(np.sort(perm), np.arange(n))

  from graphcast_tpu.models.sparse_transformer import (
      k_hop_adjacency_from_matrix)
  from graphcast_tpu.ops.splash import _build_block_map
  adj = sp.csr_matrix((np.ones_like(senders, dtype=np.int8),
                       (senders, receivers)), shape=(n, n))
  adj = ((adj + adj.T + sp.eye(n, dtype=np.int8)) > 0).tocsr()
  mask = k_hop_adjacency_from_matrix(adj, 8)

  def active_blocks(order):
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    coo = mask.tocoo()
    m = sp.csr_matrix((coo.data, (inv[coo.row], inv[coo.col])),
                      shape=(n, n))
    return int(_build_block_map(m, 128, 128)["kv_count"].sum())

  rcm = artifact.rcm_permutation(senders, receivers, n)
  assert active_blocks(perm) < active_blocks(rcm)


def test_patch_ordering_model_invariance():
  """A splash GenCast denoiser gives the same grid outputs under RCM and
  BFS-patch mesh-node orderings (the ordering only relabels mesh nodes)."""
  import dataclasses
  import jax
  from graphcast_tpu.data import synthetic
  from graphcast_tpu.models import gencast
  from graphcast_tpu.models.denoiser import (
      DenoiserArchitectureConfig, NoiseEncoderConfig)
  from graphcast_tpu.models.sparse_transformer import SparseTransformerConfig
  from tests.test_gencast import TINY_TASK, make_batch

  def build(node_ordering):
    st_cfg = SparseTransformerConfig(
        attention_k_hop=2, d_model=16, num_layers=2, num_heads=2,
        attention_type="splash_mha", ffw_hidden=32,
        block_q=64, block_kv=64, node_ordering=node_ordering)
    arch_cfg = DenoiserArchitectureConfig(
        sparse_transformer_config=st_cfg, mesh_size=2, latent_size=16,
        hidden_layers=1)
    return gencast.GenCast(
        task_config=TINY_TASK,
        denoiser_architecture_config=arch_cfg,
        sampler_config=gencast.SamplerConfig(num_noise_levels=3),
        noise_config=gencast.NoiseConfig(),
        noise_encoder_config=NoiseEncoderConfig(
            num_frequencies=8, output_sizes=(16, 8)),
        cache_dir="", interpret_attention=True)

  inputs, targets, forcings = make_batch(batch=1)
  rng = jax.random.PRNGKey(0)
  m_rcm = build("rcm")
  params = m_rcm.init(rng, inputs, targets, forcings)
  out_rcm = m_rcm(params, rng, inputs, targets, forcings)

  m_patch = build("patch")
  # Strip the RCM model's graph statics so the patch model recomputes its
  # own (same pattern as test_denoiser_chunked_with_splash_matches_full).
  params_patch = dict(params)
  params_patch["architecture"] = {
      k: v for k, v in params["architecture"].items()
      if k != "graph_statics"}
  out_patch = m_patch(params_patch, rng, inputs, targets, forcings)
  for n in targets.var_names:
    np.testing.assert_allclose(
        np.asarray(out_patch.data(n)), np.asarray(out_rcm.data(n)),
        rtol=2e-4, atol=2e-4)
