"""On-device RBF interpolation: electrode samples -> surface vertices.

Replaces the reference's per-frame `scipy.interpolate.Rbf` fit + eval loop
(S2_interpolate.py:22-53, S2_interpolate_phases.py:22-56). The kernel system
is one small dense ExE solve and an ExN evaluation — ideal MXU work — and all
frames share the same electrode geometry, so the kernel matrix is factorized
once and every frame is solved as one multi-RHS triangular solve (the
reference refits the RBF from scratch every frame).

Parity: scipy's Rbf defaults — multiquadric kernel sqrt((r/eps)^2 + 1),
epsilon = (prod(nonzero bbox edges)/n)^(1/dim), smooth = 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def scipy_default_epsilon(coords: jnp.ndarray) -> jnp.ndarray:
    """scipy.interpolate.Rbf's default epsilon ("average distance between
    nodes" from the bounding-box volume)."""
    hi = jnp.max(coords, axis=0)
    lo = jnp.min(coords, axis=0)
    edges = hi - lo
    nz = edges != 0
    prod = jnp.prod(jnp.where(nz, edges, 1.0))
    dim = jnp.sum(nz)
    return jnp.power(prod / coords.shape[0], 1.0 / jnp.maximum(dim, 1))


def _kernel(r: jnp.ndarray, epsilon: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "multiquadric":
        return jnp.sqrt((r / epsilon) ** 2 + 1.0)
    if kind == "inverse_multiquadric":
        return 1.0 / jnp.sqrt((r / epsilon) ** 2 + 1.0)
    if kind == "gaussian":
        return jnp.exp(-((r / epsilon) ** 2))
    if kind == "linear":
        return r
    if kind == "thin_plate":
        return jnp.where(r > 0, r ** 2 * jnp.log(jnp.where(r > 0, r, 1.0)), 0.0)
    raise ValueError(f"unknown RBF kind: {kind!r}")


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@partial(jax.jit, static_argnames=("kind",))
def rbf_interpolate_phases(coords: jnp.ndarray, phi: jnp.ndarray,
                           targets: jnp.ndarray,
                           epsilon: jnp.ndarray | None = None,
                           smooth: float = 0.0, kind: str = "multiquadric"
                           ) -> jnp.ndarray:
    """Phase interpolation with REAL program inputs/outputs: e^{i phi} ->
    complex RBF -> angle, all inside one compiled program
    (S2_interpolate_phases.py:52-56,177-182).

    This is the TPU-safe phases entrypoint: complex buffers cannot cross
    this TPU backend's host<->device boundary, and eager complex op chains
    poison downstream fetches (utils.precision) — so the complex unit-circle
    values exist only as internal tensors here. phi (T, E) real -> (T, P)
    real angles.
    """
    values = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
    out = _rbf_solve(coords, values, targets, epsilon, smooth, kind)
    return jnp.arctan2(out.imag, out.real)


@partial(jax.jit, static_argnames=("kind",))
def rbf_interpolate(coords: jnp.ndarray, values: jnp.ndarray,
                    targets: jnp.ndarray, epsilon: jnp.ndarray | None = None,
                    smooth: float = 0.0, kind: str = "multiquadric"
                    ) -> jnp.ndarray:
    """Interpolate values (T, E) sampled at coords (E, 3) onto targets (P, 3).

    Returns (T, P). Complex `values` are supported (the phases pipeline
    interpolates e^{i phi}, S2_interpolate_phases.py:177-182): the real kernel
    system is solved once with complex right-hand sides. NOTE: complex
    values/results cannot cross the TPU backend's transfer boundary — use
    rbf_interpolate_phases (real I/O) on accelerators.
    """
    return _rbf_solve(coords, values, targets, epsilon, smooth, kind)


def _rbf_solve(coords, values, targets, epsilon, smooth, kind):
    if epsilon is None:
        epsilon = scipy_default_epsilon(coords)
    a = _kernel(_pairwise_dist(coords, coords), epsilon, kind)
    a = a - smooth * jnp.eye(coords.shape[0], dtype=a.dtype)
    b = _kernel(_pairwise_dist(targets, coords), epsilon, kind)   # (P, E)
    # TPU XLA implements LuDecomposition only for f32/c64 (f64 fails to
    # compile), so on TPU the factor is f32 and f64 inputs refine toward
    # full precision through iterative residual correction (f64 residual
    # matmuls are tiny (E,E)@(E,T)) — the same mixed-precision recipe as
    # solve.refine, limited to cond(A) < ~1/eps_f32. Backends WITH f64 LU
    # (CPU/GPU) keep the exact factorization: ill-conditioned RBF kernels
    # (large dense grids) exceed what f32 refinement can recover.
    from manifold_flow_tpu.utils.precision import on_tpu

    f32_factor = a.dtype == jnp.float64 and on_tpu()
    lu, piv = jax.scipy.linalg.lu_factor(
        a.astype(jnp.float32) if f32_factor else a)

    def solve(rhs):
        if not f32_factor:
            return jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(a.dtype)
                                             ).astype(rhs.dtype)
        x = jax.scipy.linalg.lu_solve(
            (lu, piv), rhs.astype(jnp.float32)).astype(jnp.float64)
        rhs64 = rhs.astype(jnp.float64)
        for _ in range(3):
            r = rhs64 - a.astype(jnp.float64) @ x
            x = x + jax.scipy.linalg.lu_solve(
                (lu, piv), r.astype(jnp.float32)).astype(jnp.float64)
        return x.astype(rhs.dtype)

    if jnp.iscomplexobj(values):
        # Real matmuls + one final lax.complex: complex matmuls would run as
        # emulated pairs anyway, and on TPU a complex128 tensor cannot even
        # exist off-device (utils.precision). Precision follows the input:
        # complex64 values solve at f32, complex128 get the refined path.
        rdt = values.real.dtype
        w_re = solve(values.real.T)                               # (E, T)
        w_im = solve(values.imag.T)
        b_r = b.astype(rdt)
        return jax.lax.complex((b_r @ w_re.astype(rdt)).T,
                               (b_r @ w_im.astype(rdt)).T)
    return (b @ solve(values.T)).T
