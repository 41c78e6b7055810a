"""Geometry layer parity vs the scipy oracle + basic invariants."""

import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.geometry import (
    synthetic,
    tangent_basis,
    project_to_plane,
    express_on_basis,
    position_diff_on_basis,
    topology,
)
from manifold_flow_tpu.geometry.fem_quantities import (
    hat_gradients,
    triangle_areas,
)
from manifold_flow_tpu.geometry.mesh import PAD_INDEX
from tests.oracle import reference_impl as ref


def test_tangent_basis_matches_oracle(curved_mesh):
    normals = np.asarray(curved_mesh.normals)
    got = np.asarray(tangent_basis(jnp.asarray(normals)))
    want = ref.orthonormal_basis_np(normals)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_tangent_basis_degenerate_normals():
    normals = jnp.asarray(
        [[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    )
    e = tangent_basis(normals)
    assert not np.any(np.isnan(np.asarray(e)))
    # Orthonormality and tangency.
    for i in range(normals.shape[0]):
        np.testing.assert_allclose(np.dot(e[i, 0], e[i, 1]), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.dot(e[i, 0], normals[i]), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(e[i, 0]), 1.0, atol=1e-12)


def test_hat_gradients_match_oracle(curved_mesh):
    pts = np.asarray(curved_mesh.points)
    tris = np.asarray(curved_mesh.triangles)
    got = np.asarray(hat_gradients(jnp.asarray(pts), jnp.asarray(tris)))
    want = ref.hat_gradients_np(pts, tris)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_areas_match_oracle(curved_mesh):
    got = np.asarray(triangle_areas(curved_mesh.points, curved_mesh.triangles))
    want = ref.triangle_areas_np(
        np.asarray(curved_mesh.points), np.asarray(curved_mesh.triangles)
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_projection_and_basis_roundtrip(curved_mesh):
    e = curved_mesh.basis
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(curved_mesh.n_vertices, 3)))
    vt = project_to_plane(v, e[:, 0], e[:, 1])
    coef = express_on_basis(vt, e[:, 0], e[:, 1])
    back = coef[:, :1] * e[:, 0] + coef[:, 1:] * e[:, 1]
    np.testing.assert_allclose(np.asarray(back), np.asarray(vt), atol=1e-10)
    # Projection removes the normal component only.
    n = jnp.cross(e[:, 0], e[:, 1])
    np.testing.assert_allclose(
        np.asarray(jnp.sum(vt * n, axis=-1)), 0.0, atol=1e-10
    )


def test_position_diff_is_planar_coordinates(curved_mesh):
    e = curved_mesh.basis
    pts = curved_mesh.points
    uv = position_diff_on_basis(pts[10], pts[11], e[10, 0], e[10, 1])
    rel = np.asarray(pts[11] - pts[10])
    n = np.cross(np.asarray(e[10, 0]), np.asarray(e[10, 1]))
    proj = rel - np.dot(rel, n) * n / np.dot(n, n)
    np.testing.assert_allclose(
        np.asarray(uv),
        [np.dot(proj, np.asarray(e[10, 0])), np.dot(proj, np.asarray(e[10, 1]))],
        atol=1e-10,
    )


def test_adjacency_tables(small_mesh):
    vn = np.asarray(small_mesh.vertex_neighbors)
    deg = np.asarray(small_mesh.vertex_degree)
    tris = np.asarray(small_mesh.triangles)
    # Vertex 0 is a corner of the grid: neighbors are exactly those sharing a
    # triangle with it.
    want = sorted(set(tris[np.any(tris == 0, axis=1)].ravel()) - {0})
    got = sorted(vn[0, : deg[0]].tolist())
    assert got == want
    assert np.all(vn[0, deg[0]:] == PAD_INDEX)


def test_boundary_detection(small_mesh):
    b = np.asarray(small_mesh.boundary_vertex)
    pts = np.asarray(small_mesh.points)
    on_edge = (
        np.isclose(pts[:, 0], 0) | np.isclose(pts[:, 0], 6)
        | np.isclose(pts[:, 1], 0) | np.isclose(pts[:, 1], 6)
    )
    np.testing.assert_array_equal(b, on_edge)


def test_bfs_levels(small_mesh):
    levels = np.asarray(
        topology.bfs_levels(small_mesh.vertex_neighbors, jnp.int32(0), 3)
    )
    assert levels[0] == 0
    vn = np.asarray(small_mesh.vertex_neighbors)
    deg = np.asarray(small_mesh.vertex_degree)
    ring1 = set(vn[0, : deg[0]].tolist())
    assert all(levels[v] == 1 for v in ring1)
    # Ring 2 = neighbors-of-ring1 minus closer rings.
    ring2 = set()
    for v in ring1:
        ring2.update(vn[v, : deg[v]].tolist())
    ring2 -= ring1 | {0}
    assert all(levels[v] == 2 for v in ring2)
    assert np.all(levels[np.asarray(sorted(ring2))] == 2)
    assert np.sum(levels == -1) > 0  # beyond max_level


def test_closest_vertex(small_mesh):
    q = small_mesh.points[7] + 1e-3
    idx = topology.closest_vertex(small_mesh.points, q[None])
    assert int(idx[0]) == 7


def test_other_cell_across_edge(small_mesh):
    edges = np.asarray(small_mesh.edges)
    ecells = np.asarray(small_mesh.edge_cells)
    interior = np.where((ecells[:, 1] != PAD_INDEX))[0][0]
    va, vb = edges[interior]
    c0, c1 = ecells[interior]
    got = topology.other_cell_across_edge(
        small_mesh.edges, small_mesh.edge_cells,
        jnp.int32(c0), jnp.int32(va), jnp.int32(vb),
    )
    assert int(got) == c1
    boundary = np.where(ecells[:, 1] == PAD_INDEX)[0][0]
    va, vb = edges[boundary]
    got = topology.other_cell_across_edge(
        small_mesh.edges, small_mesh.edge_cells,
        jnp.int32(ecells[boundary, 0]), jnp.int32(va), jnp.int32(vb),
    )
    assert int(got) == PAD_INDEX


def test_geodesic_matrix_symmetric(small_mesh):
    d = topology.geodesic_distance_matrix(small_mesh, np.array([0, 5]))
    assert d.shape == (2, small_mesh.n_vertices)
    assert d[0, 0] == 0
    # Graph distance to an adjacent vertex equals the edge length.
    vn = np.asarray(small_mesh.vertex_neighbors)
    j = vn[0, 0]
    pts = np.asarray(small_mesh.points)
    np.testing.assert_allclose(d[0, j], np.linalg.norm(pts[j] - pts[0]))
