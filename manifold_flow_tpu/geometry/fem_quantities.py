"""P1 finite-element geometric quantities, triangle-batched.

Replaces the reference's per-triangle Python loops
(utils/compute_optical_flow.py:27-97, 238-255) with vectorized jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangle_areas(points: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Areas (M,) of triangles (M, 3) over points (N, 3).

    Same quantity as PyVista `compute_cell_sizes(...)['Area']` used at
    utils/compute_optical_flow.py:350.
    """
    p = points[triangles]  # (M, 3, 3)
    cr = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    return 0.5 * jnp.linalg.norm(cr, axis=-1)


def triangle_normals(points: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Unit normals (M, 3) of each triangle (zero for degenerate cells)."""
    p = points[triangles]
    cr = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    nrm = jnp.linalg.norm(cr, axis=-1, keepdims=True)
    return jnp.where(nrm > 0, cr / jnp.where(nrm > 0, nrm, 1.0), 0.0)


def vertex_normals_from_cells(points: jnp.ndarray, triangles: jnp.ndarray,
                              n_vertices: int) -> jnp.ndarray:
    """Per-vertex unit normals: normalized sum of incident unit cell normals.

    Equivalent in spirit to VTK point normals consumed by the reference via
    `surface.point_normals` (utils/compute_optical_flow.py:349): each
    triangle's unit normal is accumulated at its three corners and the sum is
    renormalized.
    """
    tn = triangle_normals(points, triangles)  # (M, 3)
    acc = jnp.zeros((n_vertices, 3), dtype=points.dtype)
    for c in range(3):
        acc = acc.at[triangles[:, c]].add(tn)
    nrm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return jnp.where(nrm > 0, acc / jnp.where(nrm > 0, nrm, 1.0), 0.0)


def hat_gradients(points: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """Per-corner P1 hat-function gradient vectors (M, 3, 3).

    grad[m, c] is the gradient vector associated with corner c of triangle m,
    following the reference construction (utils/compute_optical_flow.py:238-255):

      v_jk = p_k - p_j ;  v_ji = p_i - p_j
      perp = (v_ji . v_jk) / (v_jk . v_jk) * v_jk
      v_ih = p_j - p_i + perp
      grad = v_ih / (v_ih . v_ih)

    with corner orderings (A;B,C), (B;A,C), (C;A,B) as in
    utils/compute_optical_flow.py:63-68. Degenerate triangles (zero-length
    opposite edge or zero altitude, e.g. padding cells) yield zero gradients
    instead of NaN.
    """
    p = points[triangles]  # (M, 3, 3)
    # Corner c uses (i=c, j, k) with (j, k) the other two corners in the
    # reference's order: c=0 -> (1, 2); c=1 -> (0, 2); c=2 -> (0, 1).
    order = jnp.array([[0, 1, 2], [1, 0, 2], [2, 0, 1]])
    pi = p[:, order[:, 0]]  # (M, 3, 3)
    pj = p[:, order[:, 1]]
    pk = p[:, order[:, 2]]
    v_jk = pk - pj
    v_ji = pi - pj
    denom_e = jnp.sum(v_jk * v_jk, axis=-1, keepdims=True)
    safe_e = jnp.where(denom_e > 0, denom_e, 1.0)
    perp = (jnp.sum(v_ji * v_jk, axis=-1, keepdims=True) / safe_e) * v_jk
    v_ih = pj - pi + perp
    denom_h = jnp.sum(v_ih * v_ih, axis=-1, keepdims=True)
    safe_h = jnp.where(denom_h > 0, denom_h, 1.0)
    grad = jnp.where((denom_e > 0) & (denom_h > 0), v_ih / safe_h, 0.0)
    return grad


def mass_integrals(areas: jnp.ndarray) -> jnp.ndarray:
    """P1 mass-matrix integrals (M, 2): [A/6 (i==j), A/12 (i!=j)].

    Reference: utils/compute_optical_flow.py:72-75.
    """
    return jnp.stack([areas / 6.0, areas / 12.0], axis=-1)
