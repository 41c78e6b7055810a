"""Geometry layer: mesh container, tangent bases, FEM quantities, topology.

One canonical implementation of the geometric primitives that the reference
re-implements five times (SURVEY.md §2, "Duplication worth knowing"):
tangent orthonormal bases, tangent-plane projection, basis expression,
P1 hat-function gradients, and mesh topology queries.
"""

from manifold_flow_tpu.geometry.mesh import TriMesh, build_mesh, pad_mesh
from manifold_flow_tpu.geometry.tangent import (
    tangent_basis,
    project_to_plane,
    express_on_basis,
    position_diff_on_basis,
)
from manifold_flow_tpu.geometry.fem_quantities import (
    hat_gradients,
    triangle_areas,
    vertex_normals_from_cells,
    mass_integrals,
)
from manifold_flow_tpu.geometry import topology, synthetic

__all__ = [
    "TriMesh",
    "build_mesh",
    "pad_mesh",
    "tangent_basis",
    "project_to_plane",
    "express_on_basis",
    "position_diff_on_basis",
    "hat_gradients",
    "triangle_areas",
    "vertex_normals_from_cells",
    "mass_integrals",
    "topology",
    "synthetic",
]
