"""kernels.reduce: scatter-free segment reduction vs numpy scatter-add."""

import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.kernels import reduce as kreduce


def test_apply_reduce_matches_scatter_add():
    rng = np.random.default_rng(0)
    n_out = 257
    idx = rng.integers(0, n_out, size=5000)
    idx[:100] = 7          # one heavily-hit slot (deep stage-2 path)
    vals = rng.normal(size=(3, idx.size))
    plan = kreduce.build_reduce_plan(idx, n_out, group=8)
    got = np.asarray(kreduce.apply_reduce(plan, jnp.asarray(vals)))
    want = np.zeros((3, n_out))
    np.add.at(want, (slice(None), idx), vals)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_apply_reduce_empty_slots_are_zero():
    idx = np.array([3, 3, 3, 10])
    vals = np.ones((1, 4))
    plan = kreduce.build_reduce_plan(idx, 16, group=8)
    got = np.asarray(kreduce.apply_reduce(plan, jnp.asarray(vals)))[0]
    want = np.zeros(16)
    want[3], want[10] = 3.0, 1.0
    np.testing.assert_array_equal(got, want)


def test_apply_reduce_leading_batch_dims():
    idx = np.array([0, 1, 1, 2])
    vals = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    plan = kreduce.build_reduce_plan(idx, 3, group=8)
    got = np.asarray(kreduce.apply_reduce(plan, jnp.asarray(vals)))
    assert got.shape == (2, 3, 3)
    want = np.stack([vals[..., 0], vals[..., 1] + vals[..., 2], vals[..., 3]],
                    axis=-1)
    np.testing.assert_allclose(got, want)
