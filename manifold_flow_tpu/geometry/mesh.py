"""TriMesh: the central mesh container (a JAX pytree).

Replaces the reference's reliance on a live PyVista object for geometry
arrays and topology queries (points / faces / point_normals / cell areas at
utils/compute_optical_flow.py:345-350; point_neighbors, point_cell_ids,
point_neighbors_levels, find_closest_point, find_cells_intersecting_line,
geodesic used across utils/find_singularity_point.py, S5, S6, S7). All
topology is precomputed host-side into fixed-shape padded int arrays so every
downstream op is jit/vmap/shard-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.geometry.fem_quantities import (
    hat_gradients,
    mass_integrals,
    triangle_areas,
    vertex_normals_from_cells,
)
from manifold_flow_tpu.geometry.tangent import tangent_basis

PAD_INDEX = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriMesh:
    """Triangulated 2-manifold with precomputed FEM + topology arrays.

    Array fields (pytree leaves):
      points          (N, 3)  float  vertex coordinates
      triangles       (M, 3)  int32  corner vertex ids
      normals         (N, 3)  float  unit vertex normals
      areas           (M,)    float  triangle areas
      basis           (N, 2, 3) float tangent orthonormal bases ("e")
      grad_w          (M, 3, 3) float P1 hat gradients per corner
      integrals       (M, 2)  float  [A/6, A/12] mass integrals
      vertex_neighbors (N, D) int32  1-ring vertex ids, PAD_INDEX padded
      vertex_cells     (N, C) int32  incident cell ids, PAD_INDEX padded
      vertex_cell_slot (N, C) int32  corner slot (0..2) of the vertex within
                                     each incident cell, PAD_INDEX padded —
                                     turns FEM scatter-adds into fixed-width
                                     gather+sum reductions (fem.operator)
      vertex_degree    (N,)   int32  valid entries in vertex_neighbors
      vertex_cell_count(N,)   int32  valid entries in vertex_cells
      boundary_vertex  (N,)   bool   vertex on mesh boundary
      edges            (E, 2) int32  unique undirected edges (sorted pairs)
      edge_cells       (E, 2) int32  incident cells per edge (PAD for boundary)

    Static (aux) fields: n_vertices, n_triangles (PADDED counts — the array
    sizes every jitted program shapes to) and n_valid_vertices /
    n_valid_triangles (the real mesh; 0 means "all valid"). `pad_mesh` builds
    padded meshes whose array shapes are rounded to multiples, so different
    surfaces share one compiled program; padding triangles reference padding
    vertices only, have zero area/gradients, and contribute nothing to FEM
    assembly or adjacency of real vertices. Ops mask their outputs with
    `valid_vertices` / `valid_triangles` (ops.singularity.detect,
    topology.closest_vertex callers).
    """

    points: jnp.ndarray
    triangles: jnp.ndarray
    normals: jnp.ndarray
    areas: jnp.ndarray
    basis: jnp.ndarray
    grad_w: jnp.ndarray
    integrals: jnp.ndarray
    vertex_neighbors: jnp.ndarray
    vertex_cells: jnp.ndarray
    vertex_cell_slot: jnp.ndarray
    vertex_degree: jnp.ndarray
    vertex_cell_count: jnp.ndarray
    boundary_vertex: jnp.ndarray
    edges: jnp.ndarray
    edge_cells: jnp.ndarray
    n_vertices: int = dataclasses.field(metadata=dict(static=True))
    n_triangles: int = dataclasses.field(metadata=dict(static=True))
    n_valid_vertices: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    n_valid_triangles: int = dataclasses.field(
        default=0, metadata=dict(static=True))

    @property
    def n_dof(self) -> int:
        """Velocity DOF count 2N (two tangent components per vertex)."""
        return 2 * self.n_vertices

    @property
    def valid_vertices(self) -> int:
        """Count of REAL (non-padding) vertices."""
        return self.n_valid_vertices or self.n_vertices

    @property
    def valid_triangles(self) -> int:
        """Count of REAL (non-padding) triangles."""
        return self.n_valid_triangles or self.n_triangles

    @property
    def is_padded(self) -> bool:
        return (self.valid_vertices != self.n_vertices
                or self.valid_triangles != self.n_triangles)

    @property
    def e(self) -> jnp.ndarray:
        """Alias matching the reference's name for the tangent bases."""
        return self.basis


def _vertex_adjacency(n_vertices: int, triangles: np.ndarray):
    """Vertex->vertex and vertex->(cell, corner-slot) incidence, padded."""
    neigh = [set() for _ in range(n_vertices)]
    cells = [[] for _ in range(n_vertices)]
    slots = [[] for _ in range(n_vertices)]
    for m, (a, b, c) in enumerate(triangles):
        neigh[a].update((b, c))
        neigh[b].update((a, c))
        neigh[c].update((a, b))
        for slot, v in enumerate((a, b, c)):
            cells[v].append(m)
            slots[v].append(slot)
    max_deg = max((len(s) for s in neigh), default=1) or 1
    max_cells = max((len(s) for s in cells), default=1) or 1
    vn = np.full((n_vertices, max_deg), PAD_INDEX, dtype=np.int32)
    vc = np.full((n_vertices, max_cells), PAD_INDEX, dtype=np.int32)
    vs = np.full((n_vertices, max_cells), PAD_INDEX, dtype=np.int32)
    deg = np.zeros(n_vertices, dtype=np.int32)
    ncell = np.zeros(n_vertices, dtype=np.int32)
    for i in range(n_vertices):
        s = sorted(neigh[i])
        vn[i, : len(s)] = s
        deg[i] = len(s)
        vc[i, : len(cells[i])] = cells[i]
        vs[i, : len(slots[i])] = slots[i]
        ncell[i] = len(cells[i])
    return vn, vc, vs, deg, ncell


def _edges_and_boundary(n_vertices: int, triangles: np.ndarray):
    """Unique undirected edges, their incident cells, boundary vertices."""
    edge_map: dict[tuple[int, int], list[int]] = {}
    for m, tri in enumerate(triangles):
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(a, b), max(a, b))
            edge_map.setdefault(key, []).append(m)
    n_edges = max(len(edge_map), 1)
    edges = np.full((n_edges, 2), PAD_INDEX, dtype=np.int32)
    edge_cells = np.full((n_edges, 2), PAD_INDEX, dtype=np.int32)
    boundary = np.zeros(n_vertices, dtype=bool)
    for idx, (key, cs) in enumerate(sorted(edge_map.items())):
        edges[idx] = key
        edge_cells[idx, : min(len(cs), 2)] = cs[:2]
        if len(cs) == 1:
            boundary[key[0]] = True
            boundary[key[1]] = True
    return edges, edge_cells, boundary


def _precompute_quantities(pts, tris, nrm, n_vertices: int):
    """All per-mesh FEM quantities in one traceable function."""
    if nrm is None:
        nrm = vertex_normals_from_cells(pts, tris, n_vertices)
    areas = triangle_areas(pts, tris)
    basis = tangent_basis(nrm)
    grad_w = hat_gradients(pts, tris)
    integrals = mass_integrals(areas)
    return nrm, areas, basis, grad_w, integrals


def build_mesh(points, triangles, normals=None, dtype=None) -> TriMesh:
    """Construct a TriMesh from raw arrays (host-side, runs once per surface).

    `normals` defaults to cell-normal-averaged vertex normals (the quantity
    the reference takes from `surface.point_normals`,
    utils/compute_optical_flow.py:349).

    The precompute runs as ONE jitted program on the CPU backend: dispatching
    it op-by-op on a remote accelerator would pay per-op compile + transfer
    latency for a strictly host-side, once-per-surface step. Results land on
    the default device afterwards.
    """
    points = np.asarray(points)
    if dtype is not None:
        points = points.astype(dtype)
    triangles = np.asarray(triangles, dtype=np.int32)
    n_vertices = int(points.shape[0])
    n_triangles = int(triangles.shape[0])

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # exotic configs without a CPU backend
        cpu = None
    nrm_in = (None if normals is None
              else np.asarray(normals, dtype=points.dtype))
    compute = jax.jit(_precompute_quantities,
                      static_argnames=("n_vertices",))
    if cpu is not None and jax.devices()[0].platform != "cpu":
        with jax.default_device(cpu):
            out = compute(points, triangles, nrm_in, n_vertices)
        nrm, areas, basis, grad_w, integrals = (
            jnp.asarray(np.asarray(a)) for a in out)
    else:
        nrm, areas, basis, grad_w, integrals = compute(
            points, triangles, nrm_in, n_vertices)
    pts = jnp.asarray(points)
    tris = jnp.asarray(triangles)

    from manifold_flow_tpu import native

    topo = native.build_topology(n_vertices, triangles)
    if topo is not None:
        vn, vc, vs = (topo.vertex_neighbors, topo.vertex_cells,
                      topo.vertex_cell_slot)
        deg, ncell = topo.vertex_degree, topo.vertex_cell_count
        edges, edge_cells = topo.edges, topo.edge_cells
        boundary = topo.boundary_vertex
    else:  # pure-Python fallback (no C++ toolchain)
        vn, vc, vs, deg, ncell = _vertex_adjacency(n_vertices, triangles)
        edges, edge_cells, boundary = _edges_and_boundary(n_vertices, triangles)

    return TriMesh(
        points=pts,
        triangles=tris,
        normals=nrm,
        areas=areas,
        basis=basis,
        grad_w=grad_w,
        integrals=integrals,
        vertex_neighbors=jnp.asarray(vn),
        vertex_cells=jnp.asarray(vc),
        vertex_cell_slot=jnp.asarray(vs),
        vertex_degree=jnp.asarray(deg),
        vertex_cell_count=jnp.asarray(ncell),
        boundary_vertex=jnp.asarray(boundary),
        edges=jnp.asarray(edges),
        edge_cells=jnp.asarray(edge_cells),
        n_vertices=n_vertices,
        n_triangles=n_triangles,
    )


def pad_mesh(mesh: TriMesh, vertex_multiple: int = 128,
             triangle_multiple: int = 256) -> TriMesh:
    """Round the mesh's array shapes up to multiples for TPU tiling and —
    the bigger win on a remote accelerator — fixed-shape program reuse:
    surfaces padded to the same bucket share every compiled kernel instead
    of recompiling per subject/run (jit keys on static shapes).

    Padding triangles reference only padding vertices (never vertex 0 —
    that would corrupt real adjacency/cell counts), cycled across the pad
    vertices so no single pad vertex inflates the incidence table width.
    Padding vertices get normal (0, 0, 1) (any unit vector works; they are
    excluded from every op via `valid_vertices`) and coordinates far outside
    the bounding box so closest-point snapping can never pick them even
    without the explicit mask.
    """
    n = mesh.valid_vertices
    m = mesh.valid_triangles
    if mesh.is_padded:
        raise ValueError("mesh is already padded")
    n_pad = -(-n // vertex_multiple) * vertex_multiple
    m_pad = -(-m // triangle_multiple) * triangle_multiple
    if m_pad > m and n_pad == n:
        n_pad += vertex_multiple  # need at least one pad vertex to anchor
    if n_pad == n and m_pad == m:
        return mesh

    points = np.asarray(mesh.points)
    tris = np.asarray(mesh.triangles)
    far = points.max(axis=0) + 1e6 * max(
        1.0, float(np.ptp(points, axis=0).max()))
    pts_pad = np.concatenate(
        [points, np.broadcast_to(far, (n_pad - n, 3)).copy()])
    normals = np.asarray(mesh.normals)
    nrm_pad = np.concatenate(
        [normals,
         np.broadcast_to(np.array([0.0, 0.0, 1.0], normals.dtype),
                         (n_pad - n, 3)).copy()])
    if m_pad > m:
        anchors = n + (np.arange(m_pad - m) % (n_pad - n))
        tri_fill = np.stack([anchors] * 3, axis=1).astype(np.int32)
        tris_pad = np.concatenate([tris, tri_fill])
    else:
        tris_pad = tris
    padded = build_mesh(pts_pad, tris_pad, normals=nrm_pad)
    return dataclasses.replace(
        padded, n_valid_vertices=n, n_valid_triangles=m)
