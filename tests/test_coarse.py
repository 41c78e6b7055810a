"""Two-level preconditioner (solve.coarse): correctness + iteration wins."""

import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.fem.operator import make_operator
from manifold_flow_tpu.solve import coarse
from manifold_flow_tpu.solve.api import compute_velocity_fields
from manifold_flow_tpu.solve.cg import solve_cg
from tests.oracle import reference_impl as ref


def test_aggregation_partitions_vertices(curved_mesh):
    tables = coarse.build_tables(curved_mesh, passes=2)
    agg = np.asarray(tables.agg)
    seeds = np.asarray(tables.seeds)
    n = curved_mesh.n_vertices
    assert agg.shape == (n,)
    assert agg.min() >= 0 and agg.max() == tables.n_coarse - 1
    # Every aggregate is non-empty and owns its seed.
    assert len(np.unique(agg)) == tables.n_coarse
    assert np.all(agg[seeds] == np.arange(tables.n_coarse))
    # Real coarsening: at least ~5x per pass on a regular patch.
    assert tables.n_coarse < n / 8


def test_two_level_apply_is_spd(curved_mesh, wave_movie):
    """M^{-1} must be symmetric positive definite for CG to be valid."""
    pot, _ = wave_movie
    op = make_operator(curved_mesh, jnp.asarray(pot), 0.01)
    tables = coarse.build_tables(curved_mesh, passes=1)
    pre = coarse.make_two_level(curved_mesh, op.g, op.lambda_, tables)
    rng = np.random.default_rng(0)
    nd = curved_mesh.n_dof
    t = op.g.shape[0]
    u = jnp.asarray(rng.normal(size=(t, nd)))
    v = jnp.asarray(rng.normal(size=(t, nd)))
    mu = pre.apply(u)
    mv = pre.apply(v)
    # Symmetry: <v, M u> == <u, M v> per frame.
    np.testing.assert_allclose(
        np.sum(np.asarray(v) * np.asarray(mu), axis=-1),
        np.sum(np.asarray(u) * np.asarray(mv), axis=-1),
        rtol=1e-5,
    )
    # Positive definiteness on random vectors.
    assert np.all(np.sum(np.asarray(u) * np.asarray(mu), axis=-1) > 0)


def test_two_level_cuts_iterations(curved_mesh, wave_movie):
    pot, times = wave_movie
    op = make_operator(curved_mesh, jnp.asarray(pot), 0.01)
    from manifold_flow_tpu.fem.operator import block_jacobi_inverse
    from manifold_flow_tpu.solve.api import build_rhs

    f = build_rhs(curved_mesh, op, jnp.asarray(pot), jnp.asarray(times))
    jac = block_jacobi_inverse(curved_mesh, op.g, 0.01)
    tables = coarse.build_tables(curved_mesh, passes=1)
    two = coarse.make_two_level(curved_mesh, op.g, op.lambda_, tables)
    r_jac = solve_cg(op, f, precond=jac, tol=1e-8, max_iter=3000)
    r_two = solve_cg(op, f, precond=two, tol=1e-8, max_iter=3000)
    assert bool(np.all(np.asarray(r_two.converged)))
    assert int(r_two.iterations) < int(r_jac.iterations), (
        int(r_two.iterations), int(r_jac.iterations))
    # Same solution.
    scale = np.abs(np.asarray(r_jac.x)).max()
    np.testing.assert_allclose(np.asarray(r_two.x) / scale,
                               np.asarray(r_jac.x) / scale, atol=1e-5)


def test_refined_with_two_level_matches_oracle(curved_mesh, wave_movie):
    pot, times = wave_movie
    want, _ = ref.velocity_fields_np(
        np.asarray(curved_mesh.points), np.asarray(curved_mesh.triangles),
        np.asarray(curved_mesh.normals), pot, times, 0.01)
    res = compute_velocity_fields(
        curved_mesh, jnp.asarray(pot, jnp.float64),
        jnp.asarray(times, jnp.float64), method="refined", tol=1e-9,
        precond="two_level", coarse_passes=1)
    got = np.asarray(res.v_k)
    scale = np.maximum(np.abs(want).max(), 1e-30)
    rmse = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rmse < 1e-7, f"refined+two_level normalized RMSE {rmse}"
    assert bool(np.all(np.asarray(res.converged)))


def test_coarse_tables_ignore_mesh_padding(curved_mesh, wave_movie):
    """Pad vertices must not become singleton aggregates eating the coarse
    budget: a padded mesh aggregates its VALID subgraph plus one inert pad
    aggregate, and the two-level-preconditioned solve still matches."""
    from manifold_flow_tpu.geometry.mesh import pad_mesh
    from manifold_flow_tpu.solve.api import build_rhs

    padded = pad_mesh(curved_mesh, vertex_multiple=64, triangle_multiple=128)
    t_ref = coarse.build_tables(curved_mesh, passes=1)
    t_pad = coarse.build_tables(padded, passes=1)
    assert t_pad.n_coarse == t_ref.n_coarse + 1  # exactly one pad aggregate
    n = curved_mesh.n_vertices
    agg = np.asarray(t_pad.agg)
    np.testing.assert_array_equal(agg[:n], np.asarray(t_ref.agg))
    assert np.all(agg[n:] == t_ref.n_coarse)
    # Pad members never enter the restriction gather table.
    members = np.asarray(t_pad.members)
    real = members[members < padded.n_vertices]
    assert real.size and real.max() < n

    pot, times = wave_movie
    pot_pad = np.zeros((pot.shape[0], padded.n_vertices), pot.dtype)
    pot_pad[:, :n] = pot
    op = make_operator(curved_mesh, jnp.asarray(pot), 0.01)
    op_p = make_operator(padded, jnp.asarray(pot_pad), 0.01)
    f = build_rhs(curved_mesh, op, jnp.asarray(pot), jnp.asarray(times))
    f_p = build_rhs(padded, op_p, jnp.asarray(pot_pad), jnp.asarray(times))
    two = coarse.make_two_level(curved_mesh, op.g, op.lambda_, t_ref)
    two_p = coarse.make_two_level(padded, op_p.g, op_p.lambda_, t_pad)
    r = solve_cg(op, f, precond=two, tol=1e-9, max_iter=3000)
    r_p = solve_cg(op_p, f_p, precond=two_p, tol=1e-9, max_iter=3000)
    assert bool(np.all(np.asarray(r_p.converged)))
    scale = np.abs(np.asarray(r.x)).max()
    np.testing.assert_allclose(
        np.asarray(r_p.x)[:, :n] / scale, np.asarray(r.x)[:, :n] / scale,
        atol=1e-6)
    # Corrections never leak into pad DOFs.
    assert not np.any(np.asarray(r_p.x)[:, n: padded.n_vertices])


def test_auto_passes_caps_coarse_size(curved_mesh):
    tables = coarse.build_tables(curved_mesh, passes=None)
    assert tables.n_coarse <= coarse.MAX_COARSE_SIZE
    agg = np.asarray(tables.agg)
    assert agg.shape == (curved_mesh.n_vertices,)
    assert len(np.unique(agg)) == tables.n_coarse
