"""Visualization smoke tests (matplotlib Agg; no display)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from manifold_flow_tpu import viz
from manifold_flow_tpu.geometry import synthetic


def _problem():
    mesh = synthetic.plane_patch(nx=8, ny=8, lx=4.0, ly=4.0)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(2, mesh.n_vertices, 3)) * 0.1
    return mesh, v


def test_plot_velocity_frame(tmp_path):
    mesh, v = _problem()
    scalars = np.asarray(mesh.points)[:, 0]
    sing = np.asarray(mesh.points)[:3]
    fig = viz.plot_velocity_frame(mesh, v[0], scalars=scalars,
                                  singularities=sing, scaling="scaled",
                                  title="frame 0")
    fig.savefig(tmp_path / "frame.png", dpi=50)
    assert (tmp_path / "frame.png").stat().st_size > 0
    # 'raw' mode and true-vs-detected overlay
    fig = viz.plot_velocity_frame(mesh, v[0], scaling="raw",
                                  true_singularities=sing[:1])
    fig.savefig(tmp_path / "frame_raw.png", dpi=50)


def test_animate_velocity_fields(tmp_path):
    mesh, v = _problem()
    out = viz.animate_velocity_fields(
        mesh, v, tmp_path / "anim.gif",
        singularities_per_frame=[np.asarray(mesh.points)[:2]] * 2,
        times=np.asarray([0.0, 0.01]), fps=2, dpi=40)
    assert (tmp_path / "anim.gif").stat().st_size > 0
    assert str(out).endswith("anim.gif")


def test_plot_temporal_modes(tmp_path):
    rng = np.random.default_rng(1)
    vt = rng.normal(size=(4, 16))
    sigma = np.sort(rng.uniform(1, 10, size=4))[::-1]
    fig = viz.plot_temporal_modes(np.linspace(0, 1, 16), vt, sigma,
                                  n_modes=3, save_path=tmp_path / "modes.png")
    assert (tmp_path / "modes.png").stat().st_size > 0


def test_plot_streamlines(tmp_path):
    mesh, _ = _problem()
    pts = np.asarray(mesh.points)
    lines = [pts[:5], pts[10:18]]
    viz.plot_streamlines(mesh, lines, save_path=tmp_path / "sl.png")
    assert (tmp_path / "sl.png").stat().st_size > 0
