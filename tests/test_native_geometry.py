"""Native C++ geometry kernels vs the scipy/numpy reference path."""

import os
import time

import numpy as np
import pytest

from graphcast_tpu.geometry import connectivity, features
from graphcast_tpu.geometry import icosahedron as ico
from graphcast_tpu.native import build as native

pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="no C++ toolchain available")


def scipy_radius_pairs(grid_lat, grid_lon, mesh, radius):
  """The scipy path, forced (bypasses the native dispatch)."""
  from scipy import spatial
  grid_positions = features.grid_lat_lon_to_node_coordinates(
      grid_lat, grid_lon)
  kd_tree = spatial.cKDTree(mesh.vertices)
  query = kd_tree.query_ball_point(x=grid_positions, r=radius)
  pairs = set()
  for g, ms in enumerate(query):
    for m in ms:
      pairs.add((g, m))
  return pairs


@pytest.mark.parametrize("splits,res", [(2, 10.0), (3, 5.0)])
def test_radius_query_matches_scipy(splits, res):
  mesh = ico.get_mesh_hierarchy(splits)[-1]
  grid_lat = np.arange(-90, 90.1, res, dtype=np.float32)
  grid_lon = np.arange(0, 360, res, dtype=np.float32)
  radius = 0.6 * ico.max_edge_length(mesh)

  grid_positions = features.grid_lat_lon_to_node_coordinates(
      grid_lat, grid_lon)
  g, m = native.radius_query(grid_positions.astype(np.float64),
                             mesh.vertices.astype(np.float64), radius)
  got = set(zip(g.tolist(), m.tolist()))
  want = scipy_radius_pairs(grid_lat, grid_lon, mesh, radius)
  assert got == want


def test_containing_triangles_valid():
  mesh = ico.get_mesh_hierarchy(2)[-1]
  rng = np.random.RandomState(0)
  pts = rng.randn(500, 3)
  pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
  face_idx = native.containing_triangles(
      pts, mesh.vertices.astype(np.float64), mesh.faces)
  verts = mesh.vertices.astype(np.float64)
  tri = mesh.faces[face_idx]
  v = verts[tri]
  for i in range(3):
    a, b = v[:, i], v[:, (i + 1) % 3]
    margin = np.einsum("pd,pd->p", np.cross(a, b), pts)
    assert (margin >= -1e-9).all()


def test_native_poles_and_dateline():
  """Tricky points: poles, dateline, bucket boundaries."""
  mesh = ico.get_mesh_hierarchy(3)[-1]
  lat = np.array([90.0, -90.0, 0.0, 0.0, 89.9, -89.9], np.float32)
  lon = np.array([0.0, 0.0, 179.9, 180.1, 359.9, 0.1], np.float32)
  pts = features.grid_lat_lon_to_node_coordinates(lat, lon)
  pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
  # Diagonal selection: we want each (lat[i], lon[i]) point individually.
  idx = np.arange(6) * 6 + np.arange(6)
  pts = pts[idx]
  face_idx = native.containing_triangles(
      pts, mesh.vertices.astype(np.float64), mesh.faces)
  verts = mesh.vertices.astype(np.float64)
  v = verts[mesh.faces[face_idx]]
  for i in range(3):
    a, b = v[:, i], v[:, (i + 1) % 3]
    margin = np.einsum("pd,pd->p", np.cross(a, b), pts)
    assert (margin >= -1e-9).all()


def test_native_is_faster_at_scale():
  mesh = ico.get_mesh_hierarchy(4)[-1]
  grid_lat = np.arange(-90, 90.1, 1.0, dtype=np.float32)
  grid_lon = np.arange(0, 360, 1.0, dtype=np.float32)
  radius = 0.6 * ico.max_edge_length(mesh)
  grid_positions = features.grid_lat_lon_to_node_coordinates(
      grid_lat, grid_lon).astype(np.float64)

  t0 = time.time()
  native.radius_query(grid_positions, mesh.vertices.astype(np.float64),
                      radius)
  native_t = time.time() - t0

  from scipy import spatial
  t0 = time.time()
  kd = spatial.cKDTree(mesh.vertices)
  kd.query_ball_point(x=grid_positions, r=radius)
  scipy_t = time.time() - t0
  # Not asserting a ratio (machines vary); just record both complete.
  assert native_t > 0 and scipy_t > 0
