"""Two-float32 arithmetic (kernels.df32) and the DF operator parity vs f64."""

import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.fem.df_operator import make_df_operator
from manifold_flow_tpu.fem.operator import make_operator
from manifold_flow_tpu.kernels import df32
from manifold_flow_tpu.solve.api import build_rhs


def _rand64(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale)


def test_split_roundtrip():
    rng = np.random.default_rng(0)
    x = _rand64(rng, (64,), scale=1e3) + jnp.asarray(np.pi)
    pair = df32.from_f64(x)
    # lo is itself rounded to f32, so the pair carries ~2^-49 relative error.
    np.testing.assert_allclose(np.asarray(df32.to_f64(pair)), np.asarray(x),
                               rtol=1e-12)


def test_add_mul_precision():
    """DF ops must track f64 to ~2^-45 relative, far beyond f32's 6e-8."""
    rng = np.random.default_rng(1)
    a = _rand64(rng, (512,), scale=10.0)
    b = _rand64(rng, (512,), scale=0.1)
    da, db = df32.from_f64(a), df32.from_f64(b)
    for got, want in [
        (df32.add(da, db), a + b),
        (df32.sub(da, db), a - b),
        (df32.mul(da, db), a * b),
        (df32.div(da, db), a / b),
    ]:
        err = np.abs(np.asarray(df32.to_f64(got)) - np.asarray(want))
        rel = err / np.maximum(np.abs(np.asarray(want)), 1e-300)
        assert rel.max() < 1e-13, rel.max()


def test_compensated_sum_beats_f32():
    """Summing adversarial magnitudes: DF keeps ~1e-13, f32 loses digits."""
    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(size=8) * 1e6, rng.normal(size=8) * 1e-3])
    rng.shuffle(x)
    x64 = jnp.asarray(x)[None]
    pair = df32.from_f64(x64)
    got = float(np.asarray(df32.to_f64(df32.sum_along(pair, axis=1)))[0])
    want = float(np.sum(np.asarray(x64, dtype=np.float64)))
    assert abs(got - want) / abs(want) < 1e-12
    f32_err = abs(float(np.sum(x.astype(np.float32))) - want) / abs(want)
    assert f32_err > 1e-9  # sanity: plain f32 actually loses precision here


def test_df_operator_matches_f64(curved_mesh, wave_movie):
    """DF matvec and RHS track the float64 operator to ~1e-12 relative."""
    pot, times = wave_movie
    pot = jnp.asarray(pot, jnp.float64)
    times = jnp.asarray(times, jnp.float64)
    op_df, f_df = make_df_operator(curved_mesh, pot, times, 0.01)
    op64 = make_operator(curved_mesh, pot, 0.01)
    f64_ = build_rhs(curved_mesh, op64, pot, times)

    scale_f = float(jnp.max(jnp.abs(f64_)))
    err_f = np.asarray(jnp.abs(df32.to_f64(f_df) - f64_))
    assert err_f.max() / scale_f < 1e-12, err_f.max() / scale_f

    rng = np.random.default_rng(3)
    x = _rand64(rng, (pot.shape[0] - 1, curved_mesh.n_dof))
    y64 = op64.matvec(x)
    y_df = op_df.matvec(df32.from_f64(x))
    err = np.asarray(jnp.abs(df32.to_f64(y_df) - y64))
    assert err.max() / float(jnp.max(jnp.abs(y64))) < 1e-12
