"""ctypes bindings for the native mesh-topology library (meshlib.cpp).

Lazy compile-on-first-use: the shared object is built next to this file with
g++ -O3 and cached until the source changes. `available()` reports whether
the native path can be used; callers keep a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import NamedTuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "meshlib.cpp"
_LIB = _DIR / "_meshlib.so"
_LOCK = threading.Lock()
_STATE: dict = {"lib": None, "tried": False}


def _compile() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native meshlib unavailable (%s); using Python fallback", e)
        return False


def _load():
    with _LOCK:
        if _STATE["tried"]:
            return _STATE["lib"]
        _STATE["tried"] = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.info("native meshlib failed to load (%s)", e)
            return None
        lib.mesh_topology_build.restype = ctypes.c_void_p
        lib.mesh_topology_build.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
        lib.mesh_topology_sizes.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.mesh_topology_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32] + \
            [ctypes.c_void_p] * 8
        lib.mesh_topology_free.argtypes = [ctypes.c_void_p]
        _STATE["lib"] = lib
        return lib


def available() -> bool:
    return _load() is not None


class Topology(NamedTuple):
    vertex_neighbors: np.ndarray   # (N, D) int32, -1 padded, sorted
    vertex_cells: np.ndarray       # (N, C) int32, appearance order
    vertex_cell_slot: np.ndarray   # (N, C) int32 corner slots
    vertex_degree: np.ndarray      # (N,) int32
    vertex_cell_count: np.ndarray  # (N,) int32
    edges: np.ndarray              # (E, 2) int32 sorted pairs, lex order
    edge_cells: np.ndarray         # (E, 2) int32, -1 for boundary
    boundary_vertex: np.ndarray    # (N,) bool


def build_topology(n_vertices: int, triangles: np.ndarray) -> Topology | None:
    """Native topology build; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    handle = lib.mesh_topology_build(
        np.int32(n_vertices), np.int32(tris.shape[0]),
        tris.ctypes.data_as(ctypes.c_void_p))
    try:
        sizes = np.zeros(3, dtype=np.int32)
        lib.mesh_topology_sizes(handle, sizes.ctypes.data_as(ctypes.c_void_p))
        max_deg, max_cells, n_edges = (int(s) for s in sizes)
        n_edges = max(n_edges, 1)
        vn = np.empty((n_vertices, max_deg), dtype=np.int32)
        vc = np.empty((n_vertices, max_cells), dtype=np.int32)
        vs = np.empty((n_vertices, max_cells), dtype=np.int32)
        deg = np.empty(n_vertices, dtype=np.int32)
        ncell = np.empty(n_vertices, dtype=np.int32)
        edges = np.full((n_edges, 2), -1, dtype=np.int32)
        edge_cells = np.full((n_edges, 2), -1, dtype=np.int32)
        boundary = np.zeros(n_vertices, dtype=np.uint8)
        lib.mesh_topology_fill(
            handle, np.int32(max_deg), np.int32(max_cells),
            *(a.ctypes.data_as(ctypes.c_void_p)
              for a in (vn, vc, vs, deg, ncell, edges, edge_cells, boundary)))
        return Topology(vn, vc, vs, deg, ncell, edges, edge_cells,
                        boundary.astype(bool))
    finally:
        lib.mesh_topology_free(handle)
