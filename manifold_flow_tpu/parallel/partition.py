"""shard_map-based distributed velocity solve over ('frames', 'mesh').

Sharding layout:
  * per-frame data (a1 factors g, RHS f, CG iterates) shard the frame axis
    over 'frames' — pure data parallelism, zero communication (the TPU-native
    replacement for the reference's multiprocessing pool,
    utils/compute_optical_flow.py:152-194);
  * the triangle set (a2 blocks, g's triangle axis, DOF/corner tables,
    diagonal contributions) shards over 'mesh'; each matvec computes local
    triangle contributions into a mesh-replicated (T_local, 2N) DOF vector
    and `psum`s over 'mesh' (replicated-vector / partitioned-elements FEM
    SPMD — one ICI collective per matvec; a halo-exchange variant only pays
    off once 2N outgrows VMEM-sized blocks).

CG control flow stays in lockstep across the 'mesh' axis because residuals
are mesh-replicated after each psum; different frames-shards may run
different iteration counts, which is fine — they never communicate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from manifold_flow_tpu.fem import assembly
from manifold_flow_tpu.fem.operator import FlowOperator, invert_2x2_blocks
from manifold_flow_tpu.geometry.mesh import TriMesh
from manifold_flow_tpu.solve.api import VelocityResult
from manifold_flow_tpu.solve.cg import solve_cg


def make_device_mesh(n_frame_shards: int | None = None,
                     n_mesh_shards: int = 1, devices=None) -> Mesh:
    """Device mesh with axes ('frames', 'mesh').

    Defaults to all available devices on the frame axis (the zero-comm
    direction) — the right default at the reference's workload sizes.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_frame_shards is None:
        n_frame_shards = devices.size // n_mesh_shards
    devices = devices[: n_frame_shards * n_mesh_shards]
    grid = devices.reshape(n_frame_shards, n_mesh_shards)
    return Mesh(grid, axis_names=("frames", "mesh"))


def _pad_axis(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _shard_gather_tables(triangles: np.ndarray, n_vertices: int,
                         n_shards: int, n_real: int | None = None):
    """Per-shard vertex -> (local cell, corner) tables for gather-mode
    reductions inside the mesh-partitioned matvec and diagonal build.

    `triangles` is the PADDED (n_shards * Ms, 3) array; shard s owns rows
    [s*Ms, (s+1)*Ms). Returns (base6, base3): (n_shards, N, Cmax) int32 flat
    indices `m_local*6 + slot*2` / `m_local*3 + slot`, padded with Ms*6 /
    Ms*3 (a zero slot appended by the consumer). Scatter-add per iteration
    would serialize on TPU — these tables keep the distributed hot loop
    gather-only (one psum per matvec remains).
    """
    ms = triangles.shape[0] // n_shards
    if n_real is None:
        n_real = triangles.shape[0]
    incid: list[list[list[tuple[int, int]]]] = [
        [[] for _ in range(n_vertices)] for _ in range(n_shards)]
    for m, tri in enumerate(np.asarray(triangles)):
        if m >= n_real:
            break  # zero-padded triangles contribute nothing
        s, m_loc = divmod(m, ms)
        for slot, v in enumerate(tri):
            if 0 <= v < n_vertices:
                incid[s][int(v)].append((m_loc, slot))
    cmax = max((len(x) for sh in incid for x in sh), default=1) or 1
    base6 = np.full((n_shards, n_vertices, cmax), ms * 6, dtype=np.int32)
    base3 = np.full((n_shards, n_vertices, cmax), ms * 3, dtype=np.int32)
    for s in range(n_shards):
        for v in range(n_vertices):
            for c, (m_loc, slot) in enumerate(incid[s][v]):
                base6[s, v, c] = m_loc * 6 + slot * 2
                base3[s, v, c] = m_loc * 3 + slot
    return base6, base3


def sharded_compute_velocity_fields(
    mesh: TriMesh,
    potentials: jnp.ndarray,
    times: jnp.ndarray,
    device_mesh: Mesh,
    lambda_: float = 0.01,
    tol: float = 1e-10,
    max_iter: int = 2000,
    method: str = "cg",
    precond: str = "auto",
) -> VelocityResult:
    """Distributed equivalent of solve.api.compute_velocity_fields.

    method='cg' shards over both axes: frames are data-parallel, triangles
    partition over 'mesh' with one psum per matvec. method='refined' (f32
    inner PCG + two-float32 residuals, f64-grade accuracy) shards over
    'frames' only — frames are independent systems, so the refined solve
    runs unchanged per shard with zero communication; it requires
    n_mesh_shards == 1 because compensated pair sums do not distribute over
    a psum.

    Frames pad to the 'frames' axis size (zero RHS rows converge instantly)
    and triangles pad to the 'mesh' axis size (zero-block triangles whose
    scatter targets DOF 0 contribute nothing); padding is stripped from the
    result.
    """
    if method == "refined":
        return _sharded_refined(mesh, potentials, times, device_mesh,
                                lambda_=lambda_, tol=tol, max_iter=max_iter,
                                precond=precond)
    if method != "cg":
        raise ValueError(f"unknown sharded method {method!r} "
                         "(want 'cg' or 'refined')")
    potentials = jnp.asarray(potentials)
    times = jnp.asarray(times, dtype=potentials.dtype)
    nf = device_mesh.shape["frames"]
    nm = device_mesh.shape["mesh"]
    n_dof = mesh.n_dof
    use_mesh_axis = nm > 1

    g = assembly.frame_factors(mesh, potentials[:-1])           # (T, M, 3, 2)
    dt = (times[1:] - times[:-1])[:, None]
    di = (potentials[1:] - potentials[:-1]) / dt
    f = assembly.rhs_vector(mesh, g, di)                        # (T, 2N)
    contrib = assembly.diag_contributions(mesh, g, lambda_)     # (T, M, 3, 2, 2)
    t = g.shape[0]

    dof = _pad_axis(assembly.local_dof_indices(mesh), 0, nm)
    tris = _pad_axis(mesh.triangles, 0, nm)
    blocks2 = _pad_axis(assembly.a2_blocks(mesh).astype(g.dtype), 0, nm)
    w_scale = _pad_axis((mesh.areas / 12.0).astype(g.dtype), 0, nm)
    g = _pad_axis(_pad_axis(g, 0, nf), 1, nm)
    contrib = _pad_axis(_pad_axis(contrib, 0, nf), 1, nm)
    f = _pad_axis(f, 0, nf)
    base6_np, base3_np = _shard_gather_tables(
        np.asarray(tris), n_dof // 2, nm, n_real=mesh.n_triangles)
    base6 = jnp.asarray(base6_np)
    base3 = jnp.asarray(base3_np)

    def local_solve(dof_l, blocks2_l, w_l, g_l, contrib_l, f_l, b6_l, b3_l):
        op = FlowOperator(
            dof=dof_l, blocks2=blocks2_l, g=g_l, w_scale=w_l,
            lambda_=jnp.asarray(lambda_, dtype=g_l.dtype), n_dof=n_dof,
            gather_base=b6_l[0],
            axis_name="mesh" if use_mesh_axis else None,
        )
        # Block-Jacobi diagonal via the shard-local gather table (the
        # scatter-add equivalent serializes on TPU).
        t_l, m_l = contrib_l.shape[0], contrib_l.shape[1]
        flat = jnp.concatenate(
            [contrib_l.reshape(t_l, m_l * 3, 4),
             jnp.zeros((t_l, 1, 4), contrib_l.dtype)], axis=1)
        diag = jnp.take(flat, b3_l[0], axis=1).sum(axis=2).reshape(
            t_l, n_dof // 2, 2, 2)
        if use_mesh_axis:
            diag = jax.lax.psum(diag, "mesh")
        pre = invert_2x2_blocks(diag)
        res = solve_cg(op, f_l, precond=pre, tol=tol, max_iter=max_iter)
        return res.x, res.iterations[None], res.residual, res.converged

    shard = jax.shard_map(
        local_solve,
        mesh=device_mesh,
        in_specs=(
            P("mesh"),                     # dof (M, 6)
            P("mesh"),                     # blocks2 (M, 6, 6)
            P("mesh"),                     # w_scale (M,)
            P("frames", "mesh"),           # g (T, M, 3, 2)
            P("frames", "mesh"),           # diag contributions (T, M, 3, 2, 2)
            P("frames"),                   # f (T, 2N)
            P("mesh"),                     # gather table (shards, N, C)
            P("mesh"),                     # diag gather table (shards, N, C)
        ),
        out_specs=(P("frames"), P("frames"), P("frames"), P("frames")),
        check_vma=False,
    )
    x, iters, resid, conv = jax.jit(shard)(
        dof, blocks2, w_scale, g, contrib, f, base6, base3)
    return VelocityResult(
        v_k=x[:t], e=mesh.basis,
        iterations=jnp.max(iters), residual=resid[:t], converged=conv[:t])


def _sharded_refined(mesh, potentials, times, device_mesh, lambda_, tol,
                     max_iter, precond: str = "auto"):
    """Frame-sharded two-float32 refined solve (f64-grade accuracy).

    Assembly is replicated (cheap relative to the solve); each frame shard
    runs its own refinement loop to convergence with zero communication —
    the scaling structure of the reference's frame pool, at direct-solver
    accuracy."""
    from manifold_flow_tpu.fem.df_operator import DFFlowOperator, make_df_operator
    from manifold_flow_tpu.kernels.df32 import DF
    from manifold_flow_tpu.solve.refine import refine_loop

    if device_mesh.shape["mesh"] != 1:
        raise ValueError(
            "method='refined' shards frames only (compensated pair sums do "
            "not distribute over a psum); use n_mesh_shards=1")
    potentials = jnp.asarray(potentials)
    times = jnp.asarray(times, dtype=potentials.dtype)
    nf = device_mesh.shape["frames"]
    op_df, f_df = make_df_operator(mesh, potentials, times, lambda_)
    t = f_df.hi.shape[0]

    tables = None
    if precond == "auto":
        from manifold_flow_tpu.solve.api import TWO_LEVEL_MIN_VERTICES

        if mesh.n_vertices < TWO_LEVEL_MIN_VERTICES:
            precond = "jacobi"
    if precond != "jacobi":
        from manifold_flow_tpu.solve import coarse

        try:
            tables = coarse.build_tables(mesh)
        except Exception:
            if precond == "two_level":
                raise
            tables = None  # traced topology: fall back to block-Jacobi

    g_hi = _pad_axis(op_df.g.hi, 0, nf)
    g_lo = _pad_axis(op_df.g.lo, 0, nf)
    f_hi = _pad_axis(f_df.hi, 0, nf)
    f_lo = _pad_axis(f_df.lo, 0, nf)

    def local_solve(gh, gl, fh, fl):
        op_l = DFFlowOperator(
            dof=op_df.dof, gather_base=op_df.gather_base,
            blocks2=op_df.blocks2, g=DF(gh, gl), w_scale=op_df.w_scale,
            lambda_=op_df.lambda_, n_dof=op_df.n_dof)
        res = refine_loop(mesh, op_l, DF(fh, fl), tol=tol,
                          max_iter=max_iter, coarse_tables=tables)
        return res.x, res.iterations[None], res.residual, res.converged

    spec = P("frames")
    shard = jax.shard_map(
        local_solve, mesh=device_mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False)
    x, iters, resid, conv = jax.jit(shard)(g_hi, g_lo, f_hi, f_lo)
    return VelocityResult(
        v_k=x[:t], e=mesh.basis,
        iterations=jnp.max(iters), residual=resid[:t], converged=conv[:t])
