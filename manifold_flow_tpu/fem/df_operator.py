"""Two-float32 FEM operator: float64-grade residuals at float32 speed.

The refined solver (solve.refine) needs the residual r = f - A x evaluated
well beyond float32 precision on hardware with no float64 units. Instead of
XLA's slow f64 emulation, this module assembles and applies the flow operator
A = a1_k + lambda a2 entirely in compensated two-float32 arithmetic
(kernels.df32): every contraction over the small FEM dimensions (3 corners,
2 tangent components, 6 local DOFs, <=C incident cells) is an unrolled chain
of error-free transforms, fused by XLA into native-f32 VPU kernels.

Mirrors fem.assembly/fem.operator formulas exactly (reference equations at
utils/compute_optical_flow.py:116-141, 258-311); agreement with true float64
is at the ~1e-13 relative level (validated in tests/test_df32.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manifold_flow_tpu.geometry.mesh import TriMesh
from manifold_flow_tpu.kernels import df32
from manifold_flow_tpu.kernels.df32 import DF


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DFFlowOperator:
    """Batched A = a1 + lambda a2 with two-float32 components.

    Fields mirror fem.operator.FlowOperator, each numeric tensor as a DF pair.
    """

    dof: jnp.ndarray          # (M, 6) int32
    gather_base: jnp.ndarray  # (N, C) int32 flat local-slot indices
    blocks2: DF               # (M, 6, 6)
    g: DF                     # (T, M, 3, 2)
    w_scale: DF               # (M,)  = A/12
    lambda_: DF               # ()
    n_dof: int = dataclasses.field(default=0, metadata=dict(static=True))

    def matvec(self, x: DF) -> DF:
        """A x with compensated arithmetic: (T, 2N) DF -> (T, 2N) DF."""
        t = x.hi.shape[0]
        m = self.dof.shape[0]
        xg = df32.gather(x, self.dof, axis=1)                     # (T, M, 6)
        y2 = df32.dot_along(
            DF(self.blocks2.hi[None], self.blocks2.lo[None]),
            DF(xg.hi[:, :, None, :], xg.lo[:, :, None, :]), axis=3)  # (T, M, 6)
        xg32 = DF(xg.hi.reshape(t, m, 3, 2), xg.lo.reshape(t, m, 3, 2))
        s = df32.dot_along(self.g, xg32, axis=3)                  # (T, M, 3)
        stot = df32.sum_along(s, axis=2)                          # (T, M)
        splus = df32.add(s, DF(stot.hi[:, :, None], stot.lo[:, :, None]))
        w = df32.mul(DF(self.w_scale.hi[None, :, None],
                        self.w_scale.lo[None, :, None]), splus)   # (T, M, 3)
        y1 = df32.mul(self.g, DF(w.hi[..., None], w.lo[..., None]))
        lam = DF(self.lambda_.hi[..., None, None, None],
                 self.lambda_.lo[..., None, None, None])
        y_loc = df32.add(df32.mul(lam, y2),
                         DF(y1.hi.reshape(t, m, 6), y1.lo.reshape(t, m, 6)))
        return _reduce_local(y_loc, self.gather_base, t)

    def residual(self, f: DF, x: DF) -> DF:
        return df32.sub(f, self.matvec(x))


def _reduce_local(y_loc: DF, gather_base: jnp.ndarray, t: int) -> DF:
    """Fixed-width compensated reduction of local contributions (T, M, 6)
    into DOF vectors (T, 2N) via the vertex->(cell, slot) table."""
    flat = DF(
        jnp.concatenate([y_loc.hi.reshape(t, -1),
                         jnp.zeros((t, 2), jnp.float32)], axis=1),
        jnp.concatenate([y_loc.lo.reshape(t, -1),
                         jnp.zeros((t, 2), jnp.float32)], axis=1))
    c0 = df32.gather(flat, gather_base, axis=1)          # (T, N, C)
    c1 = df32.gather(flat, gather_base + 1, axis=1)      # (T, N, C)
    s0 = df32.sum_along(c0, axis=2)                      # (T, N)
    s1 = df32.sum_along(c1, axis=2)                      # (T, N)
    return DF(jnp.concatenate([s0.hi, s1.hi], axis=-1),
              jnp.concatenate([s0.lo, s1.lo], axis=-1))


def _mesh_pairs(mesh: TriMesh):
    et = df32.from_f64(mesh.basis[mesh.triangles])        # (M, 3, 2, 3)
    gw = df32.from_f64(mesh.grad_w)                       # (M, 3, 3)
    areas = df32.from_f64(mesh.areas)                     # (M,)
    return et, gw, areas


class DFMeshTables(NamedTuple):
    """Frame-independent DF pieces of the operator (one per mesh)."""

    et: DF            # (M, 3, 2, 3)
    gw: DF            # (M, 3, 3)
    areas: DF         # (M,)
    w_scale: DF       # (M,)
    blocks2: DF       # (M, 6, 6)
    dof: jnp.ndarray          # (M, 6)
    gather_base: jnp.ndarray  # (N, C)


def _build_df_tables(mesh: TriMesh) -> DFMeshTables:
    from manifold_flow_tpu.fem import assembly

    et, gw, areas = _mesh_pairs(mesh)
    twelve = DF(jnp.float32(12.0), jnp.float32(0.0))
    m = mesh.triangles.shape[0]
    pad = mesh.vertex_cells < 0
    gather_base = jnp.where(
        pad, m * 6,
        mesh.vertex_cells * 6 + mesh.vertex_cell_slot * 2).astype(jnp.int32)
    return DFMeshTables(
        et=et, gw=gw, areas=areas, w_scale=df32.div(areas, twelve),
        blocks2=_blocks2_pairs(et, gw, areas),
        dof=assembly.local_dof_indices(mesh), gather_base=gather_base)


# Identity-keyed cache pinning the keyed arrays (a bare id() key could be
# recycled after the arrays are freed; holding references prevents that,
# and the `is` checks verify the hit). Capped FIFO for batch sweeps over
# many surfaces.
_DF_TABLES_CACHE: dict = {}
_DF_TABLES_CAP = 8


def mesh_df_tables(mesh: TriMesh) -> DFMeshTables:
    """Cached frame-independent DF tables for `mesh`.

    Building these (f64 splits + the compensated a2 block assembly) costs a
    measurable slice of each refined solve (~27 ms standalone at reference
    scale) yet depends only on the mesh; callers that solve many movies over
    one surface should hit the cache. Under tracing (mesh arrays are
    tracers) caching is impossible and the tables build inline, exactly as
    before.
    """
    # Key on EVERY array _build_df_tables consumes — a TriMesh variant
    # sharing triangles/basis but carrying replaced grad_w/areas/
    # vertex_cells tables must miss, not silently reuse stale tables.
    deps = (mesh.triangles, mesh.basis, mesh.grad_w, mesh.areas,
            mesh.vertex_cells, mesh.vertex_cell_slot)
    try:
        from jax._src import core as _core

        tracing = not _core.trace_state_clean()
    except Exception:  # API moved: conservatively assume tracing
        tracing = True
    # Under ANY active trace the jnp ops below stage tracers even on
    # concrete inputs — caching those leaks tracers out of the trace
    # (UnexpectedTracerError on the next call). Build inline instead.
    if tracing or any(isinstance(x, jax.core.Tracer) for x in deps):
        return _build_df_tables(mesh)
    key = tuple(id(x) for x in deps)
    hit = _DF_TABLES_CACHE.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], deps)):
        return hit[1]
    tables = _build_df_tables(mesh)
    _DF_TABLES_CACHE[key] = (deps, tables)
    while len(_DF_TABLES_CACHE) > _DF_TABLES_CAP:
        _DF_TABLES_CACHE.pop(next(iter(_DF_TABLES_CACHE)))
    return tables


def _blocks2_pairs(et: DF, gw: DF, areas: DF) -> DF:
    """a2 local blocks (M, 6, 6) in DF (fem.assembly.a2_blocks formulas)."""
    gg = df32.dot_along(DF(gw.hi[:, :, None], gw.lo[:, :, None]),
                        DF(gw.hi[:, None, :], gw.lo[:, None, :]), axis=3)
    ee = df32.dot_along(
        DF(et.hi[:, :, :, None, None, :], et.lo[:, :, :, None, None, :]),
        DF(et.hi[:, None, None, :, :, :], et.lo[:, None, None, :, :, :]),
        axis=5)                                           # (M, 3, 2, 3, 2)
    b = df32.mul(ee, DF(gg.hi[:, :, None, :, None], gg.lo[:, :, None, :, None]))
    b = df32.mul(b, DF(areas.hi[:, None, None, None, None],
                       areas.lo[:, None, None, None, None]))
    m = b.hi.shape[0]
    return DF(b.hi.reshape(m, 6, 6), b.lo.reshape(m, 6, 6))


def _frame_factors_pairs(mesh: TriMesh, pot: DF, et: DF, gw: DF) -> DF:
    """g = (grad_M I . e) as (T, M, 3, 2) DF (fem.assembly.frame_factors)."""
    i_tri = df32.gather(pot, mesh.triangles, axis=1)      # (T, M, 3)
    grad_m = df32.dot_along(
        DF(i_tri.hi[..., None], i_tri.lo[..., None]),
        DF(gw.hi[None], gw.lo[None]), axis=2)             # (T, M, 3=d)
    return df32.dot_along(
        DF(grad_m.hi[:, :, None, None, :], grad_m.lo[:, :, None, None, :]),
        DF(et.hi[None], et.lo[None]), axis=4)             # (T, M, 3, 2)


def make_df_operator(mesh: TriMesh, potentials: jnp.ndarray,
                     times: jnp.ndarray, lambda_: float,
                     potentials_next: jnp.ndarray | None = None,
                     tables: DFMeshTables | None = None
                     ) -> tuple[DFFlowOperator, DF]:
    """Build the DF operator and DF right-hand sides from a float64 movie.

    The only float64 device ops are the initial elementwise splits (cheap);
    everything downstream is fused float32. `potentials_next` supports the
    reference's optional second movie I_k_2 for the time derivative
    (utils/compute_optical_flow.py:174-176); defaults to `potentials`.
    `tables` injects precomputed frame-independent pieces across a jit
    boundary (mesh_df_tables); None resolves them here (cached when the
    mesh is concrete).
    """
    if potentials.dtype != jnp.float64:
        raise ValueError(f"make_df_operator wants float64 inputs; got "
                         f"{potentials.dtype}")
    if tables is None:
        tables = mesh_df_tables(mesh)
    et, gw = tables.et, tables.gw
    pot_all = df32.from_f64(potentials)                   # (T, N)
    pot = DF(pot_all.hi[:-1], pot_all.lo[:-1])
    g = _frame_factors_pairs(mesh, pot, et, gw)

    w_scale = tables.w_scale

    # RHS: dI = (I_{k+1} - I_k) / dt, then f = scatter(g * (dI_c + sum dI) A/12).
    dt = df32.from_f64(times[1:] - times[:-1])            # (T-1,)
    nxt_all = (pot_all if potentials_next is None
               else df32.from_f64(potentials_next))
    d_pot = df32.sub(DF(nxt_all.hi[1:], nxt_all.lo[1:]), pot)
    di = df32.div(d_pot, DF(dt.hi[:, None], dt.lo[:, None]))   # (T-1, N)
    di_tri = df32.gather(di, mesh.triangles, axis=1)      # (T, M, 3)
    s = df32.sum_along(di_tri, axis=2)                    # (T, M)
    splus = df32.add(di_tri, DF(s.hi[:, :, None], s.lo[:, :, None]))
    scale = df32.mul(splus, DF(w_scale.hi[None, :, None],
                               w_scale.lo[None, :, None]))
    f_loc = df32.mul(g, DF(scale.hi[..., None], scale.lo[..., None]))
    t = f_loc.hi.shape[0]
    m = mesh.triangles.shape[0]

    f = _reduce_local(DF(f_loc.hi.reshape(t, m, 6), f_loc.lo.reshape(t, m, 6)),
                      tables.gather_base, t)

    op = DFFlowOperator(
        dof=tables.dof,
        gather_base=tables.gather_base,
        blocks2=tables.blocks2,
        g=g,
        w_scale=w_scale,
        lambda_=df32.from_f64(jnp.asarray(lambda_, jnp.float64)),
        n_dof=mesh.n_dof,
    )
    return op, f
