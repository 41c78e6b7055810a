"""Backend precision policy for complex/spectral work.

TPUs have no float64 units (f64 is slow XLA emulation), and the TPU PJRT
backend cannot handle complex128 at all — measured on the target chip: a
`device_put` of a complex128 array HANGS, and f64 LU decomposition fails to
compile ("Only F32 and C64 types are implemented in LuDecomposition").
Complex and spectral math therefore runs at single precision on TPU —
phases are angles, where float32 gives ~1e-7 absolute accuracy, far beyond
physiological relevance — and at double precision elsewhere when x64 is on.

CPU test runs keep full double precision, so scipy-parity tests are
unaffected; only accelerator execution degrades (gracefully, instead of
hanging).
"""

from __future__ import annotations


def on_tpu() -> bool:
    import jax

    return jax.devices()[0].platform == "tpu"


def complex_dtype(requested=None):
    """The complex dtype to compute with: complex64 on TPU, else `requested`
    (or the widest the x64 mode allows)."""
    import jax
    import jax.numpy as jnp

    if on_tpu():
        return jnp.complex64
    if requested is not None:
        return jnp.dtype(requested)
    return jnp.dtype(jnp.complex128 if jax.config.jax_enable_x64
                     else jnp.complex64)


def spectral_real_dtype(dtype):
    """Real dtype for FFT-bound work: float64 falls to float32 on TPU
    (an f64 FFT would produce complex128)."""
    import jax.numpy as jnp

    if jnp.dtype(dtype) == jnp.float64 and on_tpu():
        return jnp.dtype(jnp.float32)
    return jnp.dtype(dtype)


def analysis_dtype(dtype):
    """Real dtype for the S3-S7 analysis ops (detection, classification,
    streamlines, winding): float64 falls to float32 on TPU, where f64 is
    ~15-30x-slower emulation that also blocks fusion (measured on the
    target chip: the winding movie program runs 592 ms in f64 vs 48 ms in
    f32 with bit-identical ring counts and types). The analysis ops consume
    a velocity field whose own solver error is ~1e-6 relative, so f32
    rounding (~1e-7) is below the data's noise floor; threshold decisions
    (detection eps=1e-4) sit orders of magnitude above either. CPU runs
    keep the caller's dtype so oracle-parity tests are exact."""
    import jax.numpy as jnp

    if jnp.dtype(dtype) == jnp.float64 and on_tpu():
        return jnp.dtype(jnp.float32)
    return jnp.dtype(dtype)


def complex_to_numpy(x):
    """Recombine HOST-side complex (or fetch a real device array) to numpy.

    Complex buffers cannot cross this TPU backend's transfer path in either
    direction (c64 device->host is UNIMPLEMENTED; c128 host->device hangs),
    and even EAGER .real/.imag dispatches on a complex device array poison
    downstream fetches — so a complex jax.Array on TPU is already
    unrecoverable here and is rejected loudly. Ops must return real/imag
    planes from inside one jitted program (e.g. ops.svd._svd_complex_parts)
    and recombine via this helper on host numpy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jnp.iscomplexobj(x):
        if isinstance(x, jax.Array) and on_tpu():
            raise TypeError(
                "complex device arrays cannot be fetched on this TPU "
                "backend; return real/imag planes from a jitted program "
                "and recombine on host (utils.precision module docs)")
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)
