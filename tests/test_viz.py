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


def test_true_vs_detected_gif(tmp_path):
    """The simulated-data validation animation: detected + true points
    per frame (draw_optical_flow_field.py:258-319)."""
    mesh, v = _problem()
    pts = np.asarray(mesh.points)
    out = viz.animate_velocity_fields(
        mesh, v, tmp_path / "tvd.gif",
        singularities_per_frame=[pts[:2], pts[3:4]],
        true_singularities_per_frame=[pts[5:7]] * 2,
        fps=2, dpi=40)
    assert (tmp_path / "tvd.gif").stat().st_size > 0
    assert str(out).endswith("tvd.gif")


def test_plot_spatial_modes_both_forms(tmp_path):
    """extract_modes equivalents for complex and concat decompositions
    (S4_...ComplexMatrices .py:145-162)."""
    from manifold_flow_tpu.ops import svd as svd_ops

    mesh, _ = _problem()
    rng = np.random.default_rng(2)
    v_k = rng.normal(size=(6, 2 * mesh.n_vertices))
    for form, fn in (("concat", svd_ops.decompose_concat),
                     ("complex", svd_ops.decompose_complex)):
        modes = fn(v_k if form == "concat"
                   else v_k.astype(np.float64), n_modes=3)
        figs = viz.plot_spatial_modes(
            mesh, modes, n_modes=2,
            save_path_fmt=tmp_path / (form + "_mode_{mode}.png"))
        assert len(figs) == 2
        for i in (1, 2):
            assert (tmp_path / f"{form}_mode_{i}.png").stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close("all")


def test_freesurfer_roundtrip_and_pial_underlay(tmp_path):
    """FreeSurfer binary surface codec + translucent pial underlay
    (plot_pial_surfaces, S4_...ConcatMatrices .py:147-158)."""
    from manifold_flow_tpu.utils import io

    mesh, v = _problem()
    pial_v = np.asarray(mesh.points) * 2.0 + np.array([0.0, 0.0, -1.0])
    pial_f = np.asarray(mesh.triangles)
    path = tmp_path / "lh.pial"
    io.write_freesurfer_surface(path, pial_v, pial_f)
    rv, rf = io.read_freesurfer_surface(path)
    np.testing.assert_allclose(rv, pial_v, rtol=1e-6)
    np.testing.assert_array_equal(rf, pial_f)

    underlay = viz.load_pial_surfaces(path)
    fig = viz.plot_velocity_frame(mesh, v[0], underlay=underlay,
                                  title="with pial underlay")
    fig.savefig(tmp_path / "pial.png", dpi=50)
    assert (tmp_path / "pial.png").stat().st_size > 0
