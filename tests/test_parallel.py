"""Distributed solve on a virtual 8-device CPU mesh (SURVEY.md §4 plan (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_flow_tpu.geometry import synthetic
from manifold_flow_tpu.parallel import (
    make_device_mesh,
    sharded_compute_velocity_fields,
)
from manifold_flow_tpu.solve.api import compute_velocity_fields


@pytest.fixture(scope="module")
def problem():
    mesh = synthetic.plane_patch(
        nx=14, ny=14, lx=7.0, ly=7.0,
        height=lambda x, y: 0.2 * np.sin(x) * np.cos(y))
    pot, times = synthetic.plane_wave_movie(mesh, n_frames=7)
    ref = compute_velocity_fields(mesh, jnp.asarray(pot), jnp.asarray(times),
                                  method="cg", tol=1e-12)
    return mesh, pot, times, np.asarray(ref.v_k)


def _run(problem, nf, nm):
    mesh, pot, times, want = problem
    dm = make_device_mesh(nf, nm)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), dm, tol=1e-12)
    assert bool(np.all(np.asarray(res.converged)))
    got = np.asarray(res.v_k)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)


def test_frames_only_sharding(problem):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    _run(problem, 8, 1)


def test_mesh_only_sharding(problem):
    _run(problem, 1, 8)


def test_frames_x_mesh_sharding(problem):
    _run(problem, 4, 2)


def test_refined_frames_sharding(problem):
    """Frame-sharded two-float32 refined solve hits f64-grade accuracy."""
    mesh, pot, times, want = problem
    dm = make_device_mesh(8, 1)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot, jnp.float64), jnp.asarray(times, jnp.float64),
        dm, tol=1e-9, method="refined")
    assert bool(np.all(np.asarray(res.converged)))
    scale = np.abs(want).max()
    rmse = np.sqrt(np.mean((np.asarray(res.v_k) - want) ** 2)) / scale
    assert rmse < 1e-7, rmse


def test_refined_rejects_mesh_axis(problem):
    mesh, pot, times, _ = problem
    dm = make_device_mesh(4, 2)
    with pytest.raises(ValueError, match="frames only"):
        sharded_compute_velocity_fields(
            mesh, jnp.asarray(pot), jnp.asarray(times), dm, method="refined")


def test_uneven_frames_padding(problem):
    # 6 solve-frames over 4-way frame sharding forces padding.
    mesh, pot, times, want = problem
    dm = make_device_mesh(4, 2)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), dm, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.v_k), want, rtol=1e-7,
                               atol=1e-10)


def test_refined_sharded_two_level(problem):
    """Frame-sharded refined solve with the two-level preconditioner active
    (coarse tables are frame-independent, so they replicate across shards)."""
    mesh, pot, times, want = problem
    dm = make_device_mesh(8, 1)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot, jnp.float64), jnp.asarray(times, jnp.float64),
        dm, tol=1e-9, method="refined", precond="two_level")
    assert bool(np.all(np.asarray(res.converged)))
    np.testing.assert_allclose(np.asarray(res.v_k), want,
                               rtol=1e-6, atol=1e-9)
