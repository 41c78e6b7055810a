"""Geometry-precompute cache keyed by mesh content hash (SURVEY.md §5.4).

The reference's config.yaml carries a commented-out `processed_surface_path`
(config.yaml:18,27) — an intended cache of the per-surface geometry
precompute (tangent bases, hat gradients, areas, adjacency) that was never
wired in; every run recomputes it. Here it is real: `load_mesh_cached`
hashes (points, triangles) and stores every TriMesh array in one .npz, so
repeat runs over the same surface skip both the device precompute and the
topology build.
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
from pathlib import Path

import numpy as np

from manifold_flow_tpu.geometry.mesh import TriMesh, build_mesh

logger = logging.getLogger(__name__)

_CACHE_VERSION = 1


def mesh_content_hash(points, triangles) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(points, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(triangles, dtype=np.int32).tobytes())
    h.update(str(_CACHE_VERSION).encode())
    return h.hexdigest()[:24]


def save_mesh(path, mesh: TriMesh) -> None:
    arrays = {
        f.name: np.asarray(getattr(mesh, f.name))
        for f in dataclasses.fields(mesh)
        if not f.metadata.get("static", False)
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, n_vertices=mesh.n_vertices,
                        n_triangles=mesh.n_triangles, **arrays)


def load_mesh(path) -> TriMesh:
    import jax.numpy as jnp

    with np.load(path) as z:
        kwargs = {k: jnp.asarray(z[k]) for k in z.files
                  if k not in ("n_vertices", "n_triangles")}
        return TriMesh(n_vertices=int(z["n_vertices"]),
                       n_triangles=int(z["n_triangles"]), **kwargs)


def build_mesh_cached(points, triangles, cache_dir=None,
                      dtype=None) -> TriMesh:
    """build_mesh with an on-disk cache keyed by the mesh content.

    With cache_dir=None, builds directly (no caching).
    """
    if cache_dir is None:
        return build_mesh(points, triangles, dtype=dtype)
    points = np.asarray(points)
    if dtype is not None:
        points = points.astype(dtype)
    key = mesh_content_hash(points, triangles)
    path = Path(cache_dir) / f"mesh_{key}.npz"
    if path.exists():
        try:
            return load_mesh(path)
        except Exception:  # corrupted cache entry: rebuild
            logger.warning("mesh cache entry %s unreadable; rebuilding", path)
    mesh = build_mesh(points, triangles)
    save_mesh(path, mesh)
    return mesh
