"""Native C++ topology builder parity vs the pure-Python implementation."""

import numpy as np
import pytest

from manifold_flow_tpu import native
from manifold_flow_tpu.geometry import synthetic
from manifold_flow_tpu.geometry.mesh import (
    _edges_and_boundary,
    _vertex_adjacency,
)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_topology_matches_python():
    mesh = synthetic.plane_patch(nx=17, ny=13, lx=8.0, ly=6.0)
    tris = np.asarray(mesh.triangles)
    n = mesh.n_vertices
    topo = native.build_topology(n, tris)

    vn, vc, vs, deg, ncell = _vertex_adjacency(n, tris)
    edges, edge_cells, boundary = _edges_and_boundary(n, tris)

    np.testing.assert_array_equal(topo.vertex_neighbors, vn)
    np.testing.assert_array_equal(topo.vertex_cells, vc)
    np.testing.assert_array_equal(topo.vertex_cell_slot, vs)
    np.testing.assert_array_equal(topo.vertex_degree, deg)
    np.testing.assert_array_equal(topo.vertex_cell_count, ncell)
    np.testing.assert_array_equal(topo.edges, edges)
    np.testing.assert_array_equal(topo.edge_cells, edge_cells)
    np.testing.assert_array_equal(topo.boundary_vertex, boundary)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_topology_scales():
    """A subdivided sphere (non-trivial closed surface: no boundary)."""
    mesh = synthetic.sphere_patch(n_sub=4)
    tris = np.asarray(mesh.triangles)
    topo = native.build_topology(mesh.n_vertices, tris)
    assert not topo.boundary_vertex.any()
    # Euler characteristic of a sphere: V - E + F = 2.
    assert mesh.n_vertices - len(topo.edges) + len(tris) == 2
