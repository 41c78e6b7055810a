"""NumPy oracle for the analysis ops (singularities, winding, wave speed),
re-implementing the reference's per-element algorithms
(utils/find_singularity_point.py, S5_compute_wave_v.py, S7_winding_line.py)
as plain loops for golden comparison."""

from __future__ import annotations

import math

import numpy as np


def project_np(v, e1, e2):
    n = np.cross(e1, e2)
    return v - np.dot(v, n) * n / np.dot(n, n)


def express_np(v, e1, e2):
    return np.dot(v, e1) / np.dot(e1, e1), np.dot(v, e2) / np.dot(e2, e2)


def posdiff_np(a, b, e1, e2):
    rel = b - a
    n = np.cross(e1, e2)
    proj = rel - np.dot(rel, n) * n / np.dot(n, n)
    return np.dot(proj, e1), np.dot(proj, e2)


def find_singularities_np(points, triangles, v_now, eps):
    """find_singularity_points (utils/find_singularity_point.py:140-189)."""
    v_len = np.linalg.norm(v_now, axis=-1)
    vmax = v_len.max()
    vertex_ids = [i for i in range(len(points)) if v_len[i] / vmax <= eps]
    vertex_set = set(vertex_ids)
    interiors = []
    for m, tri in enumerate(triangles):
        if any(p in tri for p in vertex_set):
            continue
        a, b, c = tri
        pa, pb, pc = points[a], points[b], points[c]
        va, vb, vc = v_now[a] / vmax, v_now[b] / vmax, v_now[c] / vmax
        n = np.cross(pb - pa, pc - pa)
        n = n / np.linalg.norm(n)
        va_p = va - np.dot(va, n) * n
        vb_p = vb - np.dot(vb, n) * n
        vc_p = vc - np.dot(vc, n) * n
        m_mat = np.column_stack((va_p - vc_p, vb_p - vc_p))
        lam, mu = np.linalg.lstsq(m_mat, -vc_p, rcond=None)[0]
        if lam + mu <= 1 and lam >= 0 and mu >= 0:
            p_coord = lam * pa + mu * pb + (1 - lam - mu) * pc
            interiors.append((m, lam, mu, p_coord))
    return vertex_ids, interiors, vmax


def vertex_jacobian_np(points, neighbors, v_now, vmax, e1, e2, index):
    """compute_jacobian_matrix_for_vertex (:355-402)."""
    jac = np.zeros((2, 2))
    for nb in neighbors:
        v = v_now[nb] / vmax
        vp = project_np(v, e1, e2)
        u, w = express_np(vp, e1, e2)
        d1, d2 = posdiff_np(points[index], points[nb], e1, e2)
        jac[0, 0] += u / d1
        jac[0, 1] += u / d2
        jac[1, 0] += w / d1
        jac[1, 1] += w / d2
    return jac


def classify_np(jac):
    """classify_critical_point (:463-498)."""
    tr = np.trace(jac)
    det = np.linalg.det(jac)
    if det > 0:
        return "Node" if tr ** 2 > 4 * det else "Focus"
    if det < 0:
        return "Saddle"
    return "Indeterminate"


def winding_number_np(vx, vy):
    """winding_number + angle_between_vectors (S7:59-87)."""
    n = len(vx)
    total = 0.0
    for i in range(n):
        v1 = np.array([vx[i], vy[i]])
        v2 = np.array([vx[(i + 1) % n], vy[(i + 1) % n]])
        u1 = v1 / np.linalg.norm(v1)
        u2 = v2 / np.linalg.norm(v2)
        dot = np.clip(np.dot(u1, u2), -1.0, 1.0)
        ang = np.arccos(dot)
        if u1[0] * u2[1] - u1[1] * u2[0] < 0:  # 2-D cross (z component)
            ang = -ang
        total += ang
    return total / (2 * np.pi)


def ring_winding_np(points, v_now, e1, e2, center, ring_vertices):
    """One ring of calculate_winding_numbers (S7:134-149)."""
    uv = np.array([posdiff_np(points[center], points[x], e1, e2)
                   for x in ring_vertices])
    vxy = np.array([express_np(project_np(v_now[x], e1, e2), e1, e2)
                    for x in ring_vertices])
    angles = [math.atan2(uv[i, 1], uv[i, 0]) for i in range(len(ring_vertices))]
    order = np.lexsort((angles,))
    return winding_number_np(vxy[order, 0], vxy[order, 1])


def vertex_gradients_np(points, triangles, movie, areas, vertex_cells):
    """compute_grad_M_I (S5:136-171): area-weighted incident-cell average."""
    t, n = movie.shape
    grad_w = np.zeros((len(triangles), 3, 3))

    def gw(pi, pj, pk):
        vjk = pk - pj
        vji = pi - pj
        perp = np.dot(vji, vjk) * vjk / np.dot(vjk, vjk)
        vih = pj - pi + perp
        return vih / np.dot(vih, vih)

    for m, (a, b, c) in enumerate(triangles):
        grad_w[m, 0] = gw(points[a], points[b], points[c])
        grad_w[m, 1] = gw(points[b], points[a], points[c])
        grad_w[m, 2] = gw(points[c], points[a], points[b])
    grad_m = np.einsum("tmc,mcd->tmd", movie[:, triangles], grad_w)
    out = np.zeros((t, n, 3))
    for i in range(n):
        ids = [c for c in vertex_cells[i] if c >= 0]
        tot = sum(areas[c] for c in ids)
        for c in ids:
            out[:, i] += grad_m[:, c] * areas[c]
        out[:, i] /= tot
    return out


# ------------------------------------------------------- reference quirks --
def nearest_edge_np(a, b, c, p, quirk=False):
    """Edge index (0: AB, 1: BC, 2: CA) nearest to interior point p.

    quirk=True is find_nearest_edge_and_vertices
    (utils/find_singularity_point.py:318-351) verbatim: the distances are
    3-component |cross| vectors, np.argmin flattens the (3, 3) stack, and the
    flat index maps through {0: AB, 1: BC, else: CA}. quirk=False is the
    intended true point-to-line distance.
    """
    v1, v2, v3 = b - a, c - b, a - c
    if quirk:
        d1 = np.abs(np.cross(p - a, v1) / np.linalg.norm(v1))
        d2 = np.abs(np.cross(p - b, v2) / np.linalg.norm(v2))
        d3 = np.abs(np.cross(p - c, v3) / np.linalg.norm(v3))
        idx = int(np.argmin(np.array([d1, d2, d3])))
        return 0 if idx == 0 else (1 if idx == 1 else 2)
    d = [np.linalg.norm(np.cross(p - a, v1)) / np.linalg.norm(v1),
         np.linalg.norm(np.cross(p - b, v2)) / np.linalg.norm(v2),
         np.linalg.norm(np.cross(p - c, v3)) / np.linalg.norm(v3)]
    return int(np.argmin(d))


def _scalar_posdiff_np(s, e1, e2):
    """position_diff_on_basis_with_origin on SCALAR args (the reference's
    S6:115-117 bug: vertex indices passed where coordinates are expected)."""
    n = np.cross(e1, e2)
    proj = s - s * n * n / np.dot(n, n)
    return np.dot(proj, e1), np.dot(proj, e2)


def _cross2_np(u, v):
    return u[0] * v[1] - u[1] * v[0]


def streamline_walk_np(points, normals, neighbors_row, cells_row, triangles,
                       v_now, seed, quirk=False, max_steps=10000):
    """One greedy streamline walk, the reference's rule
    (extract_static_streamline_dot_product, S6_streamline.py:51-138),
    returning visited vertex ids. `neighbors_row`/`cells_row` are the padded
    (N, D)/(N, C) adjacency tables (PAD < 0) in the framework's sorted order
    so tie-breaks match the device implementation. quirk selects the
    single-shared-cell boundary test variant (index bug vs intended
    geometry)."""
    from tests.oracle.reference_impl import orthonormal_basis_np

    e_all = orthonormal_basis_np(normals)
    cur = int(seed)
    line = [cur]
    for _ in range(max_steps):
        if np.linalg.norm(v_now[cur]) == 0 and len(line) == 1:
            break  # zero-velocity seed: length-1 streamline
        e1, e2 = e_all[cur, 0], e_all[cur, 1]
        nbs = neighbors_row[cur]
        nbs = nbs[nbs >= 0]
        dots = []
        for nb in nbs:
            vec = points[nb] - points[cur]
            pr = project_np(vec, e1, e2)
            pr = pr / np.linalg.norm(pr)
            dots.append(np.dot(pr, v_now[cur]))
        dots = np.array(dots)
        idx = int(np.argmax(dots))
        cand = int(nbs[idx])
        valid_dir = dots[idx] > 0 and cand not in line
        cc = cells_row[cur]
        cells_cur = [int(x) for x in cc[cc >= 0]]
        if len(cells_cur) >= 6:  # interior vertex
            if not valid_dir:
                break
            cur = cand
            line.append(cur)
            continue
        # boundary vertex
        cb = cells_row[cand]
        cells_cand = set(int(x) for x in cb[cb >= 0])
        common = [m for m in cells_cur if m in cells_cand]  # cur-table order
        if len(common) >= 2:
            if not valid_dir:
                break
            cur = cand
            line.append(cur)
            continue
        # single shared cell: orientation test (S6:100-133)
        tri = triangles[common[0]]
        a, b, c = int(tri[0]), int(tri[1]), int(tri[2])
        if a == cur:
            pass
        elif b == cur:
            a, b = b, a
        elif c == cur:
            a, c = c, a
        if quirk:
            p1 = np.array(_scalar_posdiff_np(float(b - a), e1, e2))
            p2 = np.array(_scalar_posdiff_np(float(a - c), e1, e2))
        else:
            p1 = np.array(posdiff_np(points[a], points[b], e1, e2))
            p2 = np.array(posdiff_np(points[a], points[c], e1, e2))
        orient = _cross2_np(p1, p2)
        if orient == 0:
            break  # collinear: clockwise() returns []
        pb, pc = (p1, p2) if orient > 0 else (p2, p1)
        pa = np.zeros(2)
        u, v = express_np(v_now[cur], e1, e2)
        pv = np.array([u, v])
        inside = (_cross2_np(pb - pa, pv - pa) > 0
                  and _cross2_np(pc - pb, pv - pb) > 0
                  and _cross2_np(pa - pc, pv - pc) > 0)
        if inside and valid_dir:
            cur = cand
            line.append(cur)
        else:
            break
    return line
