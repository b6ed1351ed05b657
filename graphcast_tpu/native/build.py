"""On-demand compilation + ctypes bindings for the native geometry kernels.

Compiles geometry_kernels.cc with g++ -O3 into a shared library next to the
artifact cache on first use. All callers fall back to the scipy/numpy path
in graphcast_tpu/geometry/connectivity.py if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).parent / "geometry_kernels.cc"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> pathlib.Path:
  root = os.environ.get(
      "GRAPHCAST_TPU_CACHE",
      os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu"))
  if root == "":
    root = os.path.join(os.path.expanduser("~"), ".cache", "graphcast_tpu")
  return pathlib.Path(root) / "native"


def _build() -> Optional[ctypes.CDLL]:
  src = _SRC.read_bytes()
  digest = hashlib.sha256(src).hexdigest()[:16]
  out_dir = _cache_dir()
  out_dir.mkdir(parents=True, exist_ok=True)
  lib_path = out_dir / f"geometry_kernels_{digest}.so"
  if not lib_path.exists():
    tmp = lib_path.with_suffix(".tmp.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(tmp)]
    try:
      subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
      return None
    os.replace(tmp, lib_path)
  try:
    lib = ctypes.CDLL(str(lib_path))
  except OSError:
    return None

  lib.radius_query.restype = ctypes.c_int64
  lib.radius_query.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.c_double,
      ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
      ctypes.c_int64,
  ]
  lib.containing_triangles.restype = None
  lib.containing_triangles.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
      ctypes.POINTER(ctypes.c_int32),
  ]
  return lib


def get_library() -> Optional[ctypes.CDLL]:
  global _LIB, _TRIED
  with _LOCK:
    if not _TRIED:
      _TRIED = True
      if os.environ.get("GRAPHCAST_TPU_NO_NATIVE"):
        _LIB = None
      else:
        _LIB = _build()
    return _LIB


def have_native() -> bool:
  return get_library() is not None


def _as_c(arr, ctype):
  return arr.ctypes.data_as(ctypes.POINTER(ctype))


def radius_query(grid_pos: np.ndarray, mesh_pos: np.ndarray, radius: float):
  """Native (grid, mesh) radius pairs; returns (grid_idx, mesh_idx)."""
  lib = get_library()
  assert lib is not None
  grid_pos = np.ascontiguousarray(grid_pos, dtype=np.float64)
  mesh_pos = np.ascontiguousarray(mesh_pos, dtype=np.float64)
  n_grid, n_mesh = grid_pos.shape[0], mesh_pos.shape[0]
  count = lib.radius_query(
      _as_c(grid_pos, ctypes.c_double), n_grid,
      _as_c(mesh_pos, ctypes.c_double), n_mesh,
      float(radius), None, None, 0)
  out_grid = np.empty(count, dtype=np.int32)
  out_mesh = np.empty(count, dtype=np.int32)
  filled = lib.radius_query(
      _as_c(grid_pos, ctypes.c_double), n_grid,
      _as_c(mesh_pos, ctypes.c_double), n_mesh,
      float(radius),
      _as_c(out_grid, ctypes.c_int32), _as_c(out_mesh, ctypes.c_int32),
      count)
  assert filled == count
  return out_grid, out_mesh


def containing_triangles(points: np.ndarray, vertices: np.ndarray,
                         faces: np.ndarray) -> np.ndarray:
  lib = get_library()
  assert lib is not None
  points = np.ascontiguousarray(points, dtype=np.float64)
  vertices = np.ascontiguousarray(vertices, dtype=np.float64)
  faces = np.ascontiguousarray(faces, dtype=np.int32)
  out = np.empty(points.shape[0], dtype=np.int32)
  lib.containing_triangles(
      _as_c(points, ctypes.c_double), points.shape[0],
      _as_c(vertices, ctypes.c_double), vertices.shape[0],
      _as_c(faces, ctypes.c_int32), faces.shape[0],
      _as_c(out, ctypes.c_int32))
  return out
