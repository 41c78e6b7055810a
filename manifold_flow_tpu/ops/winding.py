"""Winding-number ("winding line") analysis around singularities.

TPU redesign of S7_winding_line.py: concentric vertex rings come from the
masked BFS (`geometry.topology.bfs_levels` — replacing PyVista
`point_neighbors_levels`, S7:131); each ring's winding number is computed
with masked sorts and gathers at fixed capacity N, vmapped over rings and
query points.

Per ring (calculate_winding_numbers, S7:120-165):
  * project ring-vertex positions and velocities into the center vertex's
    tangent basis;
  * sort by polar angle atan2(y, x) (sort_by_polar_angle_anticlockwise,
    S7:93-102 — the reference sorts about the origin; its cx, cy arguments
    are unused);
  * winding number = sum of signed angles between consecutive velocity
    vectors / 2 pi (winding_number + angle_between_vectors, S7:59-87).

Ring 1 fixes the expected type: +1 (node/focus) if w in [0.99, 1.01], -1
(saddle) if w in [-1.01, -0.99] (S7:150-158); subsequent rings count while
|w -/+ 1| <= 0.001 (check_property, S7:104-118 — note the tighter tolerance)
and the count stops at the first failure.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manifold_flow_tpu.geometry.mesh import TriMesh
from manifold_flow_tpu.geometry.tangent import (
    express_on_basis,
    position_diff_on_basis,
    project_to_plane,
)
from manifold_flow_tpu.geometry import topology


class WindingResult(NamedTuple):
    counts: jnp.ndarray        # (..., S) rings with persistent winding number
    types: jnp.ndarray         # (..., S) +1 node/focus, -1 saddle, 0 unmatched
    winding_numbers: jnp.ndarray  # (..., S, L) per-ring winding numbers


def ring_winding_number(uv: jnp.ndarray, vxy: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """Winding number of the 2-D field `vxy` (N, 2) over the masked ring.

    `uv` (N, 2) are in-plane positions (sort key), `mask` (N,) selects ring
    members. Masked entries sort to the end; the circular pairing wraps at
    the valid count.
    """
    big = jnp.asarray(1e30, dtype=uv.dtype)
    key = jnp.where(mask, jnp.arctan2(uv[:, 1], uv[:, 0]), big)
    order = jnp.argsort(key)
    vs = vxy[order]                        # (N, 2) sorted, invalid at end
    k = jnp.sum(mask)
    idx = jnp.arange(mask.shape[0])
    nxt = jnp.where(idx + 1 < k, idx + 1, 0)
    v1 = vs
    v2 = vs[nxt]

    def unit(v):
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.where(nrm > 0, nrm, 1.0)

    u1, u2 = unit(v1), unit(v2)
    dot = jnp.clip(jnp.sum(u1 * u2, axis=-1), -1.0, 1.0)
    ang = jnp.arccos(dot)
    cross = u1[:, 0] * u2[:, 1] - u1[:, 1] * u2[:, 0]
    ang = jnp.where(cross < 0, -ang, ang)
    ang = jnp.where(idx < k, ang, 0.0)
    return jnp.sum(ang) / (2.0 * jnp.pi)


def _signed_angle(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Signed angle u1 -> u2 for unit 2-vectors (..., 2), sign from the cross
    product (angle_between_vectors, S7:59-74)."""
    dot = jnp.clip(jnp.sum(u1 * u2, axis=-1), -1.0, 1.0)
    ang = jnp.arccos(dot)
    cross = u1[..., 0] * u2[..., 1] - u1[..., 1] * u2[..., 0]
    return jnp.where(cross < 0, -ang, ang)


@partial(jax.jit, static_argnames=("max_level",))
def winding_profile(mesh: TriMesh, v_world_frame: jnp.ndarray,
                    center: jnp.ndarray, max_level: int = 25) -> jnp.ndarray:
    """Winding numbers (max_level,) for rings 1..max_level around `center`.

    `v_world_frame` is one frame's (N, 3) field; `center` a vertex index.

    ONE argsort serves every ring: vertices sort by the composite key
    (ring level, polar angle), which groups each ring contiguously in
    anticlockwise order; per-ring sums of consecutive signed velocity-angle
    differences (plus the circular closure term between each ring's last and
    first member) then come from dense masked reductions. The naive
    formulation (a full masked sort per ring — 25 sorts per singularity)
    made winding analysis the slowest stage of the pipeline.
    """
    n = mesh.points.shape[0]
    dtype = v_world_frame.dtype
    levels = topology.bfs_levels(mesh.vertex_neighbors, center, max_level)
    e1 = mesh.basis[center, 0].astype(dtype)
    e2 = mesh.basis[center, 1].astype(dtype)
    uv = position_diff_on_basis(mesh.points[center].astype(dtype),
                                mesh.points.astype(dtype), e1, e2)
    vproj = project_to_plane(v_world_frame, e1, e2)
    vxy = express_on_basis(vproj, e1, e2)

    theta = jnp.arctan2(uv[:, 1], uv[:, 0])                   # (-pi, pi]
    in_ring = (levels >= 1) & (levels <= max_level)
    frac = (theta + jnp.pi) / (2.0 * jnp.pi + 1e-6)           # [0, 1)
    key = jnp.where(in_ring, levels.astype(dtype) + frac,
                    jnp.asarray(jnp.inf, dtype))
    order = jnp.argsort(key)
    lvl_s = jnp.where(in_ring, levels, -1)[order]             # (N,)
    vs = vxy[order]
    nrm = jnp.linalg.norm(vs, axis=-1, keepdims=True)
    us = vs / jnp.where(nrm > 0, nrm, 1.0)

    # Consecutive pairs within the same ring.
    pair_ang = _signed_angle(us[:-1], us[1:])                 # (N-1,)
    same = (lvl_s[:-1] == lvl_s[1:]) & (lvl_s[:-1] >= 1)
    pair_ang = jnp.where(same, pair_ang, 0.0)
    ring_ids = jnp.arange(1, max_level + 1)
    onehot_pair = (lvl_s[:-1][None, :] == ring_ids[:, None]).astype(dtype)
    sums = onehot_pair @ pair_ang                             # (L,)

    # Circular closure: last member -> first member of each ring.
    pos = jnp.arange(n)
    member = lvl_s[None, :] == ring_ids[:, None]              # (L, N)
    big = jnp.asarray(n + 1, jnp.int32)
    first = jnp.min(jnp.where(member, pos, big), axis=1)      # (L,)
    last = jnp.max(jnp.where(member, pos, -1), axis=1)        # (L,)
    count = member.sum(axis=1)
    has = count >= 1
    f = jnp.where(has, first, 0)
    l = jnp.where(has, last, 0)
    closure = _signed_angle(us[l], us[f])
    closure = jnp.where(has & (count >= 2), closure, 0.0)
    return (sums + closure) / (2.0 * jnp.pi)


def _count_and_type(w: jnp.ndarray):
    """Ring-persistence count + type from a (L,) winding profile."""
    w0 = w[0]
    is_pos = (w0 >= 0.99) & (w0 <= 1.01)
    is_neg = (w0 >= -1.01) & (w0 <= -0.99)
    typ = jnp.where(is_pos, 1, jnp.where(is_neg, -1, 0))
    target = typ.astype(w.dtype)
    ok = (w[1:] >= target - 0.001) & (w[1:] <= target + 0.001) & (typ != 0)
    # Count consecutive successes from ring 2 onward.
    consec = jnp.cumprod(ok.astype(jnp.int32))
    count = jnp.where(typ != 0, 1 + jnp.sum(consec), 0)
    return count.astype(jnp.int32), typ.astype(jnp.int32)


def scale_map(mesh: TriMesh, singularity_points, counts) -> jnp.ndarray:
    """Per-vertex winding-line 'scale' field for visualization (N,).

    Reference calculate_scale_values (S7_winding_line.py:167-183): the
    snapped center vertex of singularity i gets counts[i] + 1; its k-th
    neighbor ring (k = 1..counts[i]) gets counts[i] - (k - 1). Later
    singularities overwrite earlier ones on overlap, as in the reference's
    sequential assignment.

    One device program for the whole list: the BFS vmaps over centers, each
    singularity's candidate values form one row of a (S, N) array, and the
    sequential-overwrite rule becomes a per-vertex "last nonzero row wins"
    select (per-singularity dispatch would pay the remote-call latency S
    times over).
    """
    pts = jnp.asarray(singularity_points)
    counts = jnp.asarray(counts)
    if pts.shape[0] == 0:
        return jnp.zeros((mesh.n_vertices,), dtype=jnp.float32)
    max_count = max(int(jnp.max(counts)), 1)  # one host sync, sizes the BFS
    return _scale_values(mesh, pts, counts, max_count)


# Module-level jit (mesh is a pytree argument): a per-call closure would
# retrace — and on a remote accelerator potentially recompile — on every
# scale_map invocation.
@partial(jax.jit, static_argnames=("max_level",))
def _scale_values(mesh, points_q, cnts, max_level):
    centers = topology.closest_vertex(mesh.points, points_q,
                                      n_valid=mesh.valid_vertices)
    levels = jax.vmap(
        lambda c: topology.bfs_levels(mesh.vertex_neighbors, c,
                                      max_level))(centers)   # (S, N)
    c = cnts[:, None].astype(jnp.float32)
    ring = jnp.where((levels >= 1) & (levels <= cnts[:, None]),
                     c - (levels.astype(jnp.float32) - 1.0), 0.0)
    vals = jax.vmap(lambda row, ctr, cc: row.at[ctr].set(cc + 1.0))(
        ring, centers, cnts.astype(jnp.float32))             # (S, N)
    # Last singularity whose value is nonzero wins (the reference's
    # sequential overwrite); argmax of the row index among nonzero rows.
    s = vals.shape[0]
    written = vals != 0.0
    last = jnp.argmax(
        jnp.where(written, jnp.arange(s)[:, None], -1), axis=0)  # (N,)
    out = jnp.take_along_axis(vals, last[None, :], axis=0)[0]
    return jnp.where(jnp.any(written, axis=0), out, 0.0)


@partial(jax.jit, static_argnames=("max_level",))
def analyze_singularities(mesh: TriMesh, v_world_frame: jnp.ndarray,
                          points: jnp.ndarray, valid: jnp.ndarray,
                          max_level: int = 25) -> WindingResult:
    """Winding analysis for one frame's singularity list.

    points: (S, 3) fixed-capacity singularity coordinates; valid: (S,) mask.
    Each point is snapped to its closest REAL vertex (S7:130; padding
    vertices are excluded) before ring construction. Invalid slots return
    count 0 / type 0.
    """
    centers = topology.closest_vertex(mesh.points, points,
                                      n_valid=mesh.valid_vertices)

    def one(center):
        w = winding_profile(mesh, v_world_frame, center, max_level)
        count, typ = _count_and_type(w)
        return count, typ, w

    counts, types, ws = jax.vmap(one)(centers)
    zero = jnp.int32(0)
    return WindingResult(
        counts=jnp.where(valid, counts, zero),
        types=jnp.where(valid, types, zero),
        winding_numbers=jnp.where(valid[:, None], ws, 0.0),
    )
