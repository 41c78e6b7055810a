"""Full-pipeline integration: every stage composed, synthetic ECoG-like data.

The reference's production path (SURVEY.md §3.1): electrode grid -> surface
reconstruction (S1) -> RBF interpolation of an electrode movie (S2) ->
velocity solve + singularity detection (S3) -> SVD decomposition (S4) ->
wave speeds (S5) -> streamlines (S6) -> winding lines (S7), handing off
through the reference's file formats. Run end-to-end on a synthetic
traveling-wave recording over an 8x8 grid.
"""

import numpy as np
import pytest

from manifold_flow_tpu.pipeline import stages
from manifold_flow_tpu.pipeline.config import PipelineConfig
from manifold_flow_tpu.utils import io


@pytest.fixture(scope="module")
def electrode_recording():
    """8x8 electrode grid on a gentle dome + a traveling-wave movie (T, E)."""
    n = 8
    xe, ye = np.meshgrid(np.linspace(0, 35, n), np.linspace(0, 35, n))
    coords = np.stack(
        [xe.ravel(), ye.ravel(),
         4.0 * np.exp(-((xe.ravel() - 17.5) ** 2
                        + (ye.ravel() - 17.5) ** 2) / 400.0)], axis=1)
    sfreq = 512.0
    t = np.arange(24) / sfreq
    k = np.array([0.25, 0.15])
    phase = coords[:, :2] @ k
    movie = np.cos(2 * np.pi * 8.0 * t[:, None] - phase[None, :])
    return coords, movie, sfreq


@pytest.fixture(scope="module")
def run_all(tmp_path_factory, electrode_recording):
    coords, movie, sfreq = electrode_recording
    out = tmp_path_factory.mktemp("e2e")
    cfg = PipelineConfig()
    cfg.reconstruction.subdivisions = 2
    cfg.reconstruction.smooth_iters = 30
    cfg.solver.tol = 1e-8
    cfg.analysis.min_streamline_length = 5

    # S1: reconstruct.
    rec = stages.reconstruct_stage(coords, cfg,
                                   save_path=out / "surface.ply")
    mesh = rec.mesh
    # S2: interpolate (amplitude) + phases variant.
    vertex_movie = stages.interpolate_stage(
        mesh, coords, movie, cfg, save_path=out / "interp.csv")
    phase_movie = stages.interpolate_stage(mesh, coords, movie, cfg,
                                           phases=True)
    times = np.arange(movie.shape[0]) / sfreq
    # S3: velocity + singularities.
    vel = stages.velocity_stage(
        mesh, vertex_movie, times, cfg,
        e_path=out / "e.csv", v_k_path=out / "V_k.csv",
        speed_path=out / "speed.pkl.bz2")
    sing, labels = stages.singularity_stage(
        mesh, vel.v_world, cfg, classify=True,
        save_path=out / "sing.pkl")
    # S4: SVD both modes.
    modes_c = stages.decompose_stage(vel.v_k, cfg, mode="complex")
    modes_r = stages.decompose_stage(vel.v_k, cfg, mode="concat",
                                     npz_path=out / "data_01.npz")
    # S5: wave speeds (phase + amplitude).
    ws_p = stages.wavespeed_stage(mesh, phase_movie, 1.0 / sfreq,
                                  method="phase",
                                  save_path=out / "ws_phase.pkl.bz2")
    ws_a = stages.wavespeed_stage(mesh, vertex_movie, 1.0 / sfreq,
                                  method="amplitude")
    # S6: streamlines on one frame.
    lines = stages.streamline_stage(mesh, vel.v_world, cfg, frames=[0])
    # S7: winding lines.
    winding = stages.winding_stage(mesh, vel.v_world, sing, cfg,
                                   save_path=out / "winding.pkl.bz2")
    return dict(out=out, mesh=mesh, cfg=cfg, vertex_movie=vertex_movie,
                vel=vel, sing=sing, labels=labels, modes_c=modes_c,
                modes_r=modes_r, ws_p=ws_p, ws_a=ws_a, lines=lines,
                winding=winding, movie=movie, coords=coords)


def test_reconstruction_and_interpolation(run_all):
    mesh = run_all["mesh"]
    vm = run_all["vertex_movie"]
    movie = run_all["movie"]
    # Subdivision 2 on an 8x8 grid: 64 -> hundreds of vertices.
    assert mesh.n_vertices > 500
    assert vm.shape == (movie.shape[0], mesh.n_vertices)
    # RBF interpolation reproduces the electrode values near-exactly at the
    # (smoothed) grid interior scale.
    assert np.all(np.isfinite(vm))
    assert np.abs(vm).max() < 5.0


def test_velocity_field_tracks_wave_direction(run_all):
    """Optical flow of a traveling plane wave points along +k on average."""
    vel = run_all["vel"]
    assert vel.converged
    v = vel.v_world
    mesh = run_all["mesh"]
    pts = np.asarray(mesh.points)
    interior = ((pts[:, 0] > 8) & (pts[:, 0] < 27)
                & (pts[:, 1] > 8) & (pts[:, 1] < 27))
    mean_v = v[:, interior, :2].mean(axis=(0, 1))
    k = np.array([0.25, 0.15])
    cosang = mean_v @ k / (np.linalg.norm(mean_v) * np.linalg.norm(k))
    assert cosang > 0.95, f"flow direction misaligned: cos={cosang}"


def test_artifacts_roundtrip(run_all):
    out = run_all["out"]
    mesh = run_all["mesh"]
    vel = run_all["vel"]
    pts, tris = io.read_ply(out / "surface.ply")
    assert len(pts) == mesh.n_vertices
    np.testing.assert_allclose(io.load_indexed_csv(out / "V_k.csv"),
                               vel.v_k, atol=1e-12)
    saved_sing = io.load_pickle(out / "sing.pkl")
    assert len(saved_sing) == vel.v_k.shape[0]


def test_svd_modes_consistent(run_all):
    """Complex and concat SVD agree on the energy of the dominant mode."""
    c = np.asarray(run_all["modes_c"].pct_squared)
    r = np.asarray(run_all["modes_r"].pct_squared)
    # A single traveling wave concentrates energy in few modes.
    assert c[0] > 30.0
    assert r[0] > 30.0


def test_wavespeed_magnitude(run_all):
    """Phase wave speed recovers the plane-wave speed omega/|k| (scaled).

    The movie is cos(2 pi f t - k.x): phase speed = 2 pi f / |k|; the
    reference divides by 1000 (S5:311-313, mm -> m conversion).
    """
    ws = run_all["ws_p"]
    mesh = run_all["mesh"]
    pts = np.asarray(mesh.points)
    interior = ((pts[:, 0] > 10) & (pts[:, 0] < 25)
                & (pts[:, 1] > 10) & (pts[:, 1] < 25))
    expected = 2 * np.pi * 8.0 / np.linalg.norm([0.25, 0.15]) / 1000.0
    med = float(np.median(ws[2:-2][:, interior]))
    assert 0.5 * expected < med < 2.0 * expected, (med, expected)
    assert np.all(np.isfinite(run_all["ws_a"]))


def test_streamlines_follow_flow(run_all):
    lines = run_all["lines"]["0"]
    assert len(lines) > 0
    # Streamlines advance dominantly along +x (the wave direction).
    disp = np.concatenate([ln[-1:] - ln[:1] for ln in lines])
    assert disp[:, 0].mean() > 0


def test_winding_output_shape(run_all):
    winding = run_all["winding"]
    for rows in winding.values():
        for coord, count, typ in rows:
            assert np.asarray(coord).shape == (3,)
            assert count >= 1
            assert typ in (-1, 1)


def test_classification_labels(run_all):
    labels = run_all["labels"]
    allowed = {"Node", "Focus", "Saddle", "Unknown",
               "Stable Node", "Unstable Node", "Stable Focus",
               "Unstable Focus", "Center"}
    for frame in labels:
        for lab in frame:
            assert lab in allowed, lab
