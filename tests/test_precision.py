"""Backend precision policy (utils.precision): the rules that keep complex
and f64 linalg runnable on the TPU backend (which cannot transfer complex
buffers, compile f64 LU, or compile complex SVD)."""

import numpy as np
import pytest

from manifold_flow_tpu.utils import precision


def test_cpu_defaults():
    import jax.numpy as jnp

    assert not precision.on_tpu()  # tests force the CPU backend
    assert precision.complex_dtype() == jnp.dtype(jnp.complex128)
    assert precision.complex_dtype(np.complex64) == jnp.dtype(jnp.complex64)
    assert precision.spectral_real_dtype(jnp.float64) == jnp.dtype(jnp.float64)
    assert precision.spectral_real_dtype(jnp.float32) == jnp.dtype(jnp.float32)


def test_tpu_policy(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(precision, "on_tpu", lambda: True)
    assert precision.complex_dtype() == jnp.dtype(jnp.complex64)
    assert precision.complex_dtype(np.complex128) == jnp.dtype(jnp.complex64)
    assert precision.spectral_real_dtype(jnp.float64) == jnp.dtype(jnp.float32)


def test_complex_to_numpy_paths(monkeypatch):
    import jax.numpy as jnp

    # Host numpy complex recombines (and real passes through).
    z = np.ones((3, 2)) + 1j * np.arange(6).reshape(3, 2)
    np.testing.assert_array_equal(precision.complex_to_numpy(z), z)
    r = jnp.ones((2, 2))
    np.testing.assert_array_equal(precision.complex_to_numpy(r), np.ones((2, 2)))
    # Complex DEVICE arrays on CPU are fine...
    zc = jnp.asarray(z)
    np.testing.assert_allclose(precision.complex_to_numpy(zc), z)
    # ...but on TPU the fetch would hang/poison — rejected loudly.
    monkeypatch.setattr(precision, "on_tpu", lambda: True)
    with pytest.raises(TypeError, match="complex device arrays"):
        precision.complex_to_numpy(zc)
    # Host numpy complex stays allowed even "on TPU".
    np.testing.assert_array_equal(precision.complex_to_numpy(z), z)


def test_analysis_dtype_policy(monkeypatch):
    import jax.numpy as jnp

    # CPU: caller dtype passes through (oracle parity tests stay exact).
    assert precision.analysis_dtype(jnp.float64) == jnp.dtype(jnp.float64)
    assert precision.analysis_dtype(jnp.float32) == jnp.dtype(jnp.float32)
    # TPU: f64 falls to f32 (emulated f64 runs the winding movie program
    # 12x slower for bit-identical ring counts, measured on chip).
    monkeypatch.setattr(precision, "on_tpu", lambda: True)
    assert precision.analysis_dtype(jnp.float64) == jnp.dtype(jnp.float32)
    assert precision.analysis_dtype(jnp.float32) == jnp.dtype(jnp.float32)
