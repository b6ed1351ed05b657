"""The geometry compiler: precomputed, cacheable graph artifacts.

The reference recomputes its graph structures lazily at trace time inside the
model (graphcast.py:427-437 `_maybe_init`). TPU-first, we treat geometry as a
compile step: everything derived from (grid lat/lon, mesh_size,
radius_fraction) — edge lists, structural features, permutations — is built
once on host, optionally cached to disk, and closed over as static constants
of the jitted program, resident in HBM.

All edge lists are sorted by receiver so scatter-adds can use the sorted
segment-sum path.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pathlib
from collections import deque
from typing import Optional

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import reverse_cuthill_mckee

from graphcast_tpu.geometry import connectivity, features, icosahedron


@dataclasses.dataclass(frozen=True)
class EdgeArrays:
  senders: np.ndarray    # [E] int32, sorted by receiver
  receivers: np.ndarray  # [E] int32, non-decreasing
  features: np.ndarray   # [E, F] float32


@dataclasses.dataclass(frozen=True)
class GridMeshArtifact:
  """Static graph data for one (grid, mesh) configuration."""
  mesh_size: int
  grid_lat: np.ndarray
  grid_lon: np.ndarray
  mesh_vertices: np.ndarray      # finest mesh, [V, 3]
  mesh_faces: np.ndarray         # finest mesh faces
  mesh_nodes_lat: np.ndarray     # [V]
  mesh_nodes_lon: np.ndarray     # [V]
  grid_nodes_lat: np.ndarray     # [num_grid]
  grid_nodes_lon: np.ndarray     # [num_grid]
  grid_node_features: np.ndarray  # [num_grid, 3]
  mesh_node_features: np.ndarray  # [V, 3]
  grid2mesh: EdgeArrays          # grid → mesh (radius query)
  mesh: EdgeArrays               # multi-mesh (all refinement levels)
  mesh2grid: EdgeArrays          # mesh → grid (triangle containment)

  @property
  def num_grid_nodes(self) -> int:
    return self.grid_nodes_lat.shape[0]

  @property
  def num_mesh_nodes(self) -> int:
    return self.mesh_vertices.shape[0]

  def graph_statics(self) -> dict:
    """The per-step device data as a pytree of arrays.

    Threaded through jitted programs as *arguments* (a non-trainable
    "graph_statics" entry in the params tree) rather than closure
    constants — at 0.25° the edge lists and features total hundreds of MB
    and would otherwise be inlined as giant HLO literals, exploding
    compile time.
    """
    return {
        "grid_node_features": self.grid_node_features,
        "mesh_node_features": self.mesh_node_features,
        "g2m_senders": self.grid2mesh.senders,
        "g2m_receivers": self.grid2mesh.receivers,
        "g2m_edge_features": self.grid2mesh.features,
        "mesh_senders": self.mesh.senders,
        "mesh_receivers": self.mesh.receivers,
        "mesh_edge_features": self.mesh.features,
        "m2g_senders": self.mesh2grid.senders,
        "m2g_receivers": self.mesh2grid.receivers,
        "m2g_edge_features": self.mesh2grid.features,
    }


def _sorted_edges(senders, receivers, feats) -> EdgeArrays:
  from graphcast_tpu.nn.typed_graph import sort_edges_by_receiver
  s, r, f = sort_edges_by_receiver(senders, receivers, feats)
  return EdgeArrays(senders=s, receivers=r, features=f)


def build_artifact(
    grid_lat: np.ndarray,
    grid_lon: np.ndarray,
    mesh_size: int,
    radius_query_fraction_edge_length: float = 0.6,
    mesh2grid_edge_normalization_factor: Optional[float] = None,
    multimesh: bool = True,
    permute_banded: bool = False,
    banded_patch_size: Optional[int] = None,
    spatial_permutation: bool = False,
    cache_dir: Optional[str] = None,
    backend: str = "auto",
) -> GridMeshArtifact:
  """Builds (or loads from cache) the full graph artifact.

  Args:
    grid_lat/grid_lon: 1D coordinate arrays in degrees.
    mesh_size: number of icosahedron splits (finest level).
    radius_query_fraction_edge_length: grid2mesh query radius as a fraction
      of the finest mesh's max edge length (reference: graphcast.py:323-326).
    mesh2grid_edge_normalization_factor: optional fixed edge-feature
      normalization for checkpoint compatibility (graphcast.py:190-193).
    multimesh: if True the processor edge set is the union over all
      refinement levels (GraphCast); if False only the finest level
      (GenCast denoiser, denoiser.py:285-291).
    permute_banded: if True, reorder the finest mesh's vertices so the
      k-hop attention mask is block-compact — required by the block-sparse
      attention processor (reference: denoiser.py:833-851 uses RCM).
      Only valid with multimesh=False.
    banded_patch_size: with permute_banded, order nodes into contiguous
      BFS patches of this many nodes (aligned to the attention block size)
      instead of RCM bands — ~2× fewer active attention tiles on the
      0.25°/mesh-6 k-hop-16 mask (see ``patch_permutation``). None = RCM.
    spatial_permutation: (multimesh only) reorder mesh-node ids with RCM
      on the finest-level adjacency so consecutive ids are spatially
      adjacent. Measured at 0.25°/mesh-6: NO gather speedup (TPU row
      gathers are per-row dispatch-bound, ~14.5 ns/row regardless of
      locality) and the reorder unbalances per-block in-degrees (+14%
      padded-layout expansion), so the default is OFF; kept as an option
      with invariance tests for future layout experiments.
    cache_dir: disk cache directory; default env GRAPHCAST_TPU_CACHE or
      ~/.cache/graphcast_tpu. Pass "" to disable caching.
    backend: connectivity backend — "auto" (native C++ if built, else
      numpy/scipy), "native", or "numpy". The RESOLVED backend is part of
      the cache key: triangle-containment ties can resolve differently
      (both validly) between backends, so artifacts built by one are never
      served from cache to the other. Pin "numpy" for bit-reproducible
      artifacts across machines with/without the C++ extension.
  """
  grid_lat = np.asarray(grid_lat, dtype=np.float32)
  grid_lon = np.asarray(grid_lon, dtype=np.float32)

  if permute_banded and multimesh:
    raise ValueError("permute_banded requires multimesh=False")

  backend = connectivity.resolve_backend(backend)
  cache_path = _cache_path(
      cache_dir, grid_lat, grid_lon, mesh_size,
      radius_query_fraction_edge_length, mesh2grid_edge_normalization_factor,
      (multimesh, permute_banded, spatial_permutation, backend)
      if banded_patch_size is None else
      (multimesh, permute_banded, spatial_permutation, backend,
       banded_patch_size))
  if cache_path is not None and cache_path.exists():
    return _load(cache_path, mesh_size, grid_lat, grid_lon)

  meshes = icosahedron.get_mesh_hierarchy(mesh_size)
  finest = meshes[-1]
  processor_faces = (icosahedron.merge_meshes(meshes).faces if multimesh
                     else None)
  if permute_banded:
    finest = permute_mesh_to_banded(finest, patch_size=banded_patch_size)
  elif multimesh and spatial_permutation:
    # Spatially coherent ids (see docstring). RCM on the finest-level
    # adjacency; the merged multi-mesh faces are remapped with the same
    # permutation (coarse-level faces index finest vertices).
    s0, r0 = icosahedron.faces_to_edges(finest.faces)
    n = finest.vertices.shape[0]
    perm = rcm_permutation(s0, r0, n)
    inverse = np.empty(n, dtype=np.int32)
    inverse[perm] = np.arange(n, dtype=np.int32)
    finest = icosahedron.TriangularMesh(
        vertices=finest.vertices[perm],
        faces=inverse[finest.faces].astype(np.int32))
    processor_faces = inverse[processor_faces].astype(np.int32)
  mesh_phi, mesh_theta = features.cartesian_to_spherical(
      finest.vertices[:, 0], finest.vertices[:, 1], finest.vertices[:, 2])
  mesh_lat, mesh_lon = features.spherical_to_lat_lon(mesh_phi, mesh_theta)
  mesh_lat = mesh_lat.astype(np.float32)
  mesh_lon = mesh_lon.astype(np.float32)

  lon2d, lat2d = np.meshgrid(grid_lon, grid_lat)
  grid_nodes_lat = lat2d.reshape(-1).astype(np.float32)
  grid_nodes_lon = lon2d.reshape(-1).astype(np.float32)

  radius = (icosahedron.max_edge_length(finest)
            * radius_query_fraction_edge_length)

  # --- grid2mesh (radius query), receivers are mesh nodes ---
  g2m_grid, g2m_mesh = connectivity.radius_query_indices(
      grid_lat, grid_lon, finest, radius, backend=backend)
  grid_feats, mesh_feats, g2m_edge_feats = (
      features.bipartite_graph_spatial_features(
          grid_nodes_lat, grid_nodes_lon, mesh_lat, mesh_lon,
          g2m_grid, g2m_mesh))
  grid2mesh = _sorted_edges(g2m_grid, g2m_mesh, g2m_edge_feats)

  # --- mesh processor edges (multi-mesh or finest) ---
  processor_mesh = (icosahedron.TriangularMesh(
      vertices=finest.vertices, faces=processor_faces) if multimesh
                    else finest)
  m_send, m_recv = icosahedron.faces_to_edges(processor_mesh.faces)
  _, mesh_edge_feats = features.graph_spatial_features(
      mesh_lat, mesh_lon, m_send, m_recv)
  mesh_edges = _sorted_edges(m_send, m_recv, mesh_edge_feats)

  # --- mesh2grid (triangle containment), receivers are grid nodes ---
  m2g_grid, m2g_mesh = connectivity.in_mesh_triangle_indices(
      grid_lat, grid_lon, finest, backend=backend)
  _, _, m2g_edge_feats = features.bipartite_graph_spatial_features(
      mesh_lat, mesh_lon, grid_nodes_lat, grid_nodes_lon,
      m2g_mesh, m2g_grid,
      edge_normalization_factor=mesh2grid_edge_normalization_factor)
  mesh2grid = _sorted_edges(m2g_mesh, m2g_grid, m2g_edge_feats)

  artifact = GridMeshArtifact(
      mesh_size=mesh_size,
      grid_lat=grid_lat,
      grid_lon=grid_lon,
      mesh_vertices=finest.vertices,
      mesh_faces=finest.faces,
      mesh_nodes_lat=mesh_lat,
      mesh_nodes_lon=mesh_lon,
      grid_nodes_lat=grid_nodes_lat,
      grid_nodes_lon=grid_nodes_lon,
      grid_node_features=grid_feats,
      mesh_node_features=mesh_feats,
      grid2mesh=grid2mesh,
      mesh=mesh_edges,
      mesh2grid=mesh2grid)

  if cache_path is not None:
    _save(cache_path, artifact)
  return artifact


def permute_mesh_to_banded(
    mesh: icosahedron.TriangularMesh,
    patch_size: Optional[int] = None) -> icosahedron.TriangularMesh:
  """Reorders a mesh's vertices so the attention mask is block-compact:
  RCM bands (reference: denoiser.py:833-851) or, with ``patch_size``,
  contiguous BFS patches aligned to the attention blocks."""
  senders, receivers = icosahedron.faces_to_edges(mesh.faces)
  num_nodes = mesh.vertices.shape[0]
  if patch_size is not None:
    perm = patch_permutation(senders, receivers, num_nodes,
                             mesh.vertices, patch_size)
  else:
    perm = rcm_permutation(senders, receivers, num_nodes)
  inverse = np.empty(num_nodes, dtype=np.int32)
  inverse[perm] = np.arange(num_nodes, dtype=np.int32)
  return icosahedron.TriangularMesh(
      vertices=mesh.vertices[perm],
      faces=inverse[mesh.faces].astype(np.int32))


def rcm_permutation(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int) -> np.ndarray:
  """Reverse-Cuthill-McKee node ordering to make adjacency banded.

  Used by the GenCast denoiser to permute mesh nodes before block-sparse
  attention (reference: denoiser.py:833-851).
  """
  data = np.ones_like(senders, dtype=np.int8)
  adj = csr_matrix((data, (senders, receivers)),
                   shape=(num_nodes, num_nodes))
  perm = reverse_cuthill_mckee(adj, symmetric_mode=True)
  return np.asarray(perm, dtype=np.int32)


def patch_permutation(senders: np.ndarray, receivers: np.ndarray,
                      num_nodes: int, vertices: np.ndarray,
                      patch_size: int) -> np.ndarray:
  """Orders nodes into contiguous BFS patches of ``patch_size`` nodes.

  For block-sparse attention over a k-hop mask, what matters is how many
  (q-block, kv-block) tiles the mask touches. RCM's 1-D bands put each
  query's 2-D k-hop ball into a band as wide as ~k graph rings — at
  0.25°/mesh-6/k-hop-16 that covers 12.5× the mask's true nonzeros.
  Compact spatial patches aligned to the attention blocks reach the
  geometric (ball ∪ halo) lower bound instead: measured 6.4× at
  patch/block 512 and 4.9× at 256 on the same mask — ~2× fewer attended
  tiles, the dominant cost of the denoiser's transformer.

  Patches are grown by BFS on the mesh adjacency (compact, hexagonal-ish),
  seeded in z-then-longitude sweep order so consecutive patches are also
  spatially adjacent; leftover BFS frontier nodes are released for later
  patches so every patch except the final one has exactly ``patch_size``
  nodes and patch boundaries coincide with attention-block boundaries.
  """
  data = np.ones_like(senders, dtype=np.int8)
  adj = csr_matrix((data, (senders, receivers)),
                   shape=(num_nodes, num_nodes)).tocsr()
  indptr, indices = adj.indptr, adj.indices
  visited = np.zeros(num_nodes, dtype=bool)
  order = np.empty(num_nodes, dtype=np.int32)
  pos = 0
  z = vertices[:, 2]
  lon = np.arctan2(vertices[:, 1], vertices[:, 0])
  seeds_sorted = np.argsort(z * 1000.0 + lon, kind="stable")
  si = 0
  queue = deque()
  while pos < num_nodes:
    while si < num_nodes and visited[seeds_sorted[si]]:
      si += 1
    seed = seeds_sorted[si]
    queue.clear()
    queue.append(seed)
    visited[seed] = True
    count = 0
    while queue and count < patch_size:
      u = queue.popleft()
      order[pos] = u
      pos += 1
      count += 1
      for v in indices[indptr[u]:indptr[u + 1]]:
        if not visited[v]:
          visited[v] = True
          queue.append(v)
    # Release the unplaced frontier so later patches can claim it.
    while queue:
      visited[queue.pop()] = False
  return order


# --- disk cache ---

_CACHE_VERSION = 2  # v2: spatial mesh-node permutation for multimesh


def _cache_path(cache_dir, grid_lat, grid_lon, mesh_size, fraction,
                norm_factor, multimesh) -> Optional[pathlib.Path]:
  if cache_dir == "":
    return None
  if cache_dir is None:
    cache_dir = os.environ.get(
        "GRAPHCAST_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu"))
  h = hashlib.sha256()
  h.update(grid_lat.tobytes())
  h.update(grid_lon.tobytes())
  h.update(repr((mesh_size, fraction, norm_factor, multimesh,
                 _CACHE_VERSION)).encode())
  return pathlib.Path(cache_dir) / f"artifact_{h.hexdigest()[:16]}.npz"


_ARRAY_FIELDS = (
    "mesh_vertices", "mesh_faces", "mesh_nodes_lat", "mesh_nodes_lon",
    "grid_nodes_lat", "grid_nodes_lon", "grid_node_features",
    "mesh_node_features")
_EDGE_FIELDS = ("grid2mesh", "mesh", "mesh2grid")


def _save(path: pathlib.Path, artifact: GridMeshArtifact):
  path.parent.mkdir(parents=True, exist_ok=True)
  payload = {f: getattr(artifact, f) for f in _ARRAY_FIELDS}
  for name in _EDGE_FIELDS:
    e = getattr(artifact, name)
    payload[f"{name}_senders"] = e.senders
    payload[f"{name}_receivers"] = e.receivers
    payload[f"{name}_features"] = e.features
  tmp = path.with_suffix(".tmp.npz")
  np.savez_compressed(tmp, **payload)
  os.replace(tmp, path)


def _load(path: pathlib.Path, mesh_size, grid_lat, grid_lon
          ) -> GridMeshArtifact:
  with np.load(path) as data:
    kwargs = {f: data[f] for f in _ARRAY_FIELDS}
    for name in _EDGE_FIELDS:
      kwargs[name] = EdgeArrays(
          senders=data[f"{name}_senders"],
          receivers=data[f"{name}_receivers"],
          features=data[f"{name}_features"])
  return GridMeshArtifact(mesh_size=mesh_size, grid_lat=grid_lat,
                          grid_lon=grid_lon, **kwargs)
