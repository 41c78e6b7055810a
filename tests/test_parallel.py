"""Distributed solve on a virtual 8-device CPU mesh (SURVEY.md §4 plan (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_flow_tpu.geometry import synthetic
from manifold_flow_tpu.parallel import (
    build_partition,
    halo_refined_velocity_fields,
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


def test_refined_mesh_sharding(problem):
    """The halo partition lifts the old no-mesh-axis restriction on the
    refined method: DF pairs survive halo copies (they are exact), so the
    accuracy-parity solver now shards the DOF space too."""
    mesh, pot, times, want = problem
    dm = make_device_mesh(2, 4)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot, jnp.float64), jnp.asarray(times, jnp.float64),
        dm, tol=1e-9, method="refined")
    assert bool(np.all(np.asarray(res.converged)))
    scale = np.abs(want).max()
    rmse = np.sqrt(np.mean((np.asarray(res.v_k) - want) ** 2)) / scale
    assert rmse < 1e-7, rmse


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


# ----------------------------------------------------------- halo layout --
def test_halo_partition_shards_memory():
    """VERDICT r1 #1 'done' gate: at >= 12k vertices, every per-shard array
    the CG loop touches is a strict fraction of the DOF space, halo included,
    and iteration counts match the unsharded solver exactly."""
    mesh = synthetic.plane_patch(
        nx=112, ny=112, lx=60.0, ly=60.0,
        height=lambda x, y: 2.0 * np.sin(x / 9.0) * np.cos(y / 11.0))
    assert mesh.n_vertices >= 12000
    part = build_partition(mesh, 8)
    n = mesh.n_vertices
    # Owned block + halo is a small fraction of the vertex space: memory for
    # x/r/z/p shards by ~n_mesh (halo overhead ~ perimeter/area).
    assert part.v_owned <= -(-n // 8) + 1
    assert part.v_owned + part.v_halo < 0.2 * n
    assert part.b_send < 0.1 * n
    # Every vertex owned exactly once; ghost triangles cover all incidences.
    owned = np.asarray(part.owned_ids)
    valid = owned[owned < n]
    assert valid.size == n and np.unique(valid).size == n

    pot, times = synthetic.plane_wave_movie(mesh, n_frames=3)
    ref = compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), method="cg", tol=1e-8,
        precond="two_level")
    dm = make_device_mesh(1, 8)
    res = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), dm, tol=1e-8,
        precond="two_level")
    assert bool(np.all(np.asarray(res.converged)))
    assert abs(int(res.iterations) - int(ref.iterations)) <= 2, (
        int(res.iterations), int(ref.iterations))
    scale = np.abs(np.asarray(ref.v_k)).max()
    err = np.abs(np.asarray(res.v_k) - np.asarray(ref.v_k)).max() / scale
    assert err < 1e-6, err


def test_halo_two_level_matches_jacobi_solution(problem):
    """Same solution through both halo preconditioners; two_level needs no
    more iterations than jacobi."""
    mesh, pot, times, want = problem
    dm = make_device_mesh(2, 4)
    res_j = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), dm, tol=1e-10,
        precond="jacobi")
    res_t = sharded_compute_velocity_fields(
        mesh, jnp.asarray(pot), jnp.asarray(times), dm, tol=1e-10,
        precond="two_level")
    np.testing.assert_allclose(np.asarray(res_j.v_k), want, rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_t.v_k), want, rtol=1e-6,
                               atol=1e-9)
    assert int(res_t.iterations) <= int(res_j.iterations)


def test_halo_refined_two_level(problem):
    mesh, pot, times, want = problem
    dm = make_device_mesh(1, 8)
    res = halo_refined_velocity_fields(
        mesh, jnp.asarray(pot, jnp.float64), jnp.asarray(times, jnp.float64),
        dm, tol=1e-9, precond="two_level")
    assert bool(np.all(np.asarray(res.converged)))
    scale = np.abs(want).max()
    rmse = np.sqrt(np.mean((np.asarray(res.v_k) - want) ** 2)) / scale
    assert rmse < 1e-7, rmse


def test_halo_comm_stats_and_prediction(problem):
    """Bytes-based scaling accounting (VERDICT r3 #1): halo traffic per
    matvec is consistent with the partition tables, shrinks RELATIVE to
    compute as shards grow coarser, and the ICI prediction clears the
    >= 80% BASELINE target at production scale."""
    from manifold_flow_tpu.parallel import halo_comm_stats, predicted_efficiency

    mesh, _, _, _ = problem
    prev_frac = None
    for n in (2, 4, 8):
        st = halo_comm_stats(mesh, n)
        part = build_partition(mesh, n)
        assert st.n_shards == n
        assert st.v_owned == part.v_owned and st.b_send == part.b_send
        # all_gather buffer = S * 2B f32 values; link traffic (S-1)/S of it.
        assert st.allgather_bytes == n * 2 * part.b_send * 4
        assert st.link_bytes == (n - 1) * 2 * part.b_send * 4
        assert 0 < st.halo_fraction  # boundaries exist on a connected mesh
        eff = predicted_efficiency(st)
        assert 0.0 < eff <= 1.0
        if prev_frac is not None:
            # Splitting finer raises the boundary-to-owned ratio (surface-
            # to-volume), so per-chip efficiency monotonically drops.
            assert st.halo_fraction >= prev_frac * 0.99
        prev_frac = st.halo_fraction
    # At production scale (the 12.5k bench mesh is ~O(sqrt N) boundaries)
    # the model must clear the >= 80% north star for small shard counts;
    # this 196-vertex test mesh is far pessimal, so only sanity is asserted
    # here — the bench records the production-scale numbers.


def test_measure_scaling_virtual_mesh():
    """Weak/strong retention harness runs on the virtual CPU mesh and
    reports well-formed efficiencies (values bounded by the 2-core host;
    the mechanism — padding, sharding, collectives — is what's validated)."""
    from manifold_flow_tpu.parallel import measure_scaling

    out = measure_scaling(n_devices=(1, 2), frames_per_device=3, nx=10,
                          tol=1e-4)
    assert set(out["weak_eff"]) == {"1", "2"}
    assert out["weak_eff"]["1"] == 1.0
    assert out["strong_eff"]["1"] == 1.0
    for k, v in {**out["weak_eff"], **out["strong_eff"]}.items():
        assert 0.0 < v <= 1.2, (k, v)  # >1 only from timer noise


# ------------------------------------------------ frames-sharded analysis --
@pytest.fixture(scope="module")
def analysis_problem():
    """Velocity movie with detectable singularities for the sharded
    analysis stages (a curved two-source field has sources + saddles)."""
    mesh = synthetic.plane_patch(
        nx=16, ny=16, lx=10.0, ly=10.0,
        height=lambda x, y: 0.3 * np.sin(0.8 * x) * np.cos(0.6 * y))
    pot, times, _ = synthetic.two_source_movie(mesh, n_frames=8)
    res = compute_velocity_fields(mesh, jnp.asarray(pot), jnp.asarray(times),
                                  method="cg", tol=1e-10)
    from manifold_flow_tpu.ops.recombine import velocity_to_world

    v3 = np.asarray(velocity_to_world(res.v_k, mesh.basis))
    return mesh, np.asarray(pot), v3


@pytest.mark.parametrize("nf", [8, 4])
def test_sharded_detect_matches_single_device(analysis_problem, nf):
    """Per-frame detection sharded over 'frames' (incl. uneven padding at
    nf=4: 7 frames over 4 shards) equals the single-device op exactly."""
    from manifold_flow_tpu.ops import singularity as sing_ops
    from manifold_flow_tpu.parallel import sharded_detect

    mesh, _, v3 = analysis_problem
    dm = make_device_mesh(nf, 1)
    want = sing_ops.detect(mesh, jnp.asarray(v3))
    got = sharded_detect(mesh, jnp.asarray(v3), dm)
    np.testing.assert_array_equal(np.asarray(want.vertex_mask),
                                  np.asarray(got.vertex_mask))
    np.testing.assert_array_equal(np.asarray(want.interior_mask),
                                  np.asarray(got.interior_mask))
    np.testing.assert_allclose(np.asarray(want.v_max),
                               np.asarray(got.v_max), rtol=1e-12)
    im = np.asarray(want.interior_mask)
    np.testing.assert_allclose(np.asarray(want.interior_point)[im],
                               np.asarray(got.interior_point)[im],
                               rtol=1e-12)


@pytest.mark.parametrize("method", ["phase", "amplitude"])
def test_sharded_wavespeed_matches_single_device(analysis_problem, method):
    """The temporal stencil couples +-2 frames across shard boundaries;
    the replicated-stencil + sharded-gradient split must still match the
    single-device op to rounding."""
    from manifold_flow_tpu.ops import wavespeed as wave_ops
    from manifold_flow_tpu.parallel import sharded_wave_velocity

    mesh, pot, _ = analysis_problem
    dm = make_device_mesh(8, 1)
    if method == "phase":
        movie = np.angle(np.exp(1j * pot))
        want = wave_ops.wave_velocity_phase_mm_per_ms(
            mesh, jnp.asarray(movie), 1e-3)
    else:
        movie = pot
        want = wave_ops.wave_velocity_amplitude(mesh, jnp.asarray(movie),
                                                1e-3)
    got = sharded_wave_velocity(mesh, jnp.asarray(movie), 1e-3, dm,
                                method=method)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-12)


def test_sharded_winding_matches_single_device(analysis_problem):
    from manifold_flow_tpu.ops import singularity as sing_ops
    from manifold_flow_tpu.ops import winding
    from manifold_flow_tpu.parallel import sharded_winding_movie

    mesh, _, v3 = analysis_problem
    dm = make_device_mesh(8, 1)
    v = jnp.asarray(v3)
    field = sing_ops.detect(mesh, v)
    cap = sing_ops.compact_capacity(field)
    det = sing_ops.compact_detected(mesh, field, capacity=cap)
    t = v3.shape[0]
    pts = np.where(np.asarray(det.interior_valid)[..., None],
                   np.asarray(det.interior_points), 0.0)
    valid = np.asarray(det.interior_valid)
    centers = np.asarray(det.interior_centers)
    if not valid.any():
        pytest.skip("no interior singularities detected in fixture")
    want = winding.analyze_singularities_movie(
        mesh, v, pts, valid, max_level=6, centers=centers)
    got = sharded_winding_movie(mesh, v, pts, valid, dm, max_level=6,
                                centers=centers)
    np.testing.assert_array_equal(np.asarray(want.counts),
                                  np.asarray(got.counts))
    np.testing.assert_array_equal(np.asarray(want.types),
                                  np.asarray(got.types))
    np.testing.assert_allclose(np.asarray(want.winding_numbers),
                               np.asarray(got.winding_numbers),
                               rtol=1e-6, atol=1e-9)


def test_sharded_analysis_programs_cached(analysis_problem):
    """Cohort sweeps must reuse the compiled shard_map programs: repeated
    calls with the same (mesh, device_mesh, params) hit one cached callable
    (a fresh jit(shard_map) per call would re-trace per trial)."""
    from manifold_flow_tpu.parallel import analysis as pa

    mesh, pot, v3 = analysis_problem
    dm = make_device_mesh(8, 1)
    pa._PROGRAM_CACHE.clear()
    pa.sharded_detect_with_counts(mesh, jnp.asarray(v3), dm)
    pa.sharded_wave_velocity(mesh, jnp.asarray(pot), 1e-3, dm)
    n_after_first = len(pa._PROGRAM_CACHE)
    prog_ids = {k: id(v[1]) for k, v in pa._PROGRAM_CACHE.items()}
    pa.sharded_detect_with_counts(mesh, jnp.asarray(v3), dm)
    pa.sharded_wave_velocity(mesh, jnp.asarray(pot), 1e-3, dm)
    assert len(pa._PROGRAM_CACHE) == n_after_first
    assert {k: id(v[1]) for k, v in pa._PROGRAM_CACHE.items()} == prog_ids


def test_sharded_winding_chunks_under_memory_cap(analysis_problem,
                                                 monkeypatch):
    """The frames-sharded winding grid must respect the per-device memory
    ceiling: with a tiny cap it chunks the center axis (parity preserved),
    and below the 8-center floor it falls back to the memory-safe
    single-device dispatch."""
    from manifold_flow_tpu.ops import winding
    from manifold_flow_tpu.parallel import sharded_winding_movie

    mesh, _, v3 = analysis_problem
    dm = make_device_mesh(8, 1)
    rng = np.random.default_rng(5)
    base = np.asarray(mesh.points)[::11][:10]
    pts = base[None].repeat(v3.shape[0], 0) \
        + rng.normal(0, 0.3, (v3.shape[0], 10, 3))
    valid = np.ones(pts.shape[:2], bool)
    want = winding.analyze_singularities_movie(
        mesh, jnp.asarray(v3), pts, valid, max_level=5)
    t_local = -(-v3.shape[0] // 8)
    monkeypatch.setattr(winding, "_GRID_MAX_ELEMS",
                        8 * t_local * mesh.n_vertices)
    got = sharded_winding_movie(mesh, jnp.asarray(v3), pts, valid, dm,
                                max_level=5)
    np.testing.assert_array_equal(np.asarray(want.counts),
                                  np.asarray(got.counts))
    np.testing.assert_allclose(np.asarray(want.winding_numbers),
                               np.asarray(got.winding_numbers),
                               rtol=1e-6, atol=1e-9)
    # Below the chunk floor: the dispatcher must not build the grid at all.
    monkeypatch.setattr(winding, "_GRID_MAX_ELEMS", 7 * t_local *
                        mesh.n_vertices)
    got2 = sharded_winding_movie(mesh, jnp.asarray(v3), pts, valid, dm,
                                 max_level=5)
    np.testing.assert_array_equal(np.asarray(want.counts),
                                  np.asarray(got2.counts))


def test_sharded_detect_with_counts_matches(analysis_problem):
    """The fused sharded detection+counts program equals the single-device
    detect_with_counts (field masks and the two capacity counts)."""
    from manifold_flow_tpu.ops import singularity as sing_ops
    from manifold_flow_tpu.parallel.analysis import sharded_detect_with_counts

    mesh, _, v3 = analysis_problem
    dm = make_device_mesh(8, 1)
    want_f, want_c = sing_ops.detect_with_counts(mesh, jnp.asarray(v3))
    got_f, got_c = sharded_detect_with_counts(mesh, jnp.asarray(v3), dm)
    np.testing.assert_array_equal(np.asarray(want_c), np.asarray(got_c))
    np.testing.assert_array_equal(np.asarray(want_f.vertex_mask),
                                  np.asarray(got_f.vertex_mask))
    np.testing.assert_array_equal(np.asarray(want_f.interior_mask),
                                  np.asarray(got_f.interior_mask))
