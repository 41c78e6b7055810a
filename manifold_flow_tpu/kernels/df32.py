"""Two-float32 ("double-single") compensated arithmetic.

TPU VPU/MXU hardware has no float64; XLA emulates it ~15-30x slower than
float32 and blocks fusion. This module implements the classic error-free
transformations (Dekker 1971, Knuth TAOCP 4.2.2, Hida-Li-Bailey double-double)
on PAIRS of float32 arrays: a value x is represented as hi + lo with
|lo| <= ulp(hi)/2, giving ~2^-48 relative precision (quad-of-bf16-class
accuracy, comfortably beyond the 1e-8 residual targets of solve.refine) at
native f32 VPU speed with full XLA fusion.

All functions are elementwise/broadcasting over jnp arrays and jit-safe.
No FMA is assumed: two_prod uses Dekker splitting (exact in IEEE f32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# 2^12 + 1 for 24-bit mantissa splits. A numpy (not jnp) scalar: a concrete
# device array at module scope would initialize the XLA backend at import
# time, which breaks jax.distributed.initialize ordering for multi-host runs.
_SPLITTER = np.float32(4097.0)


class DF(NamedTuple):
    """A two-float32 value: the represented number is hi + lo (exactly)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.hi.shape


def from_f64(x) -> DF:
    """Split a float64 array into a DF pair (two elementwise casts)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def from_f32(x) -> DF:
    return DF(x, jnp.zeros_like(x))


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a + b). 6 flops, no branch."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split of f32 into two non-overlapping 12-bit halves."""
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a * b). 17 flops, no FMA."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x: DF, y: DF) -> DF:
    """DF + DF (Knuth two-sum with error folding)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*quick_two_sum(s, e))


def sub(x: DF, y: DF) -> DF:
    return add(x, DF(-y.hi, -y.lo))


def mul(x: DF, y: DF) -> DF:
    """DF * DF (Dekker product with cross-term folding)."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*quick_two_sum(p, e))


def mul_f32(x: DF, a) -> DF:
    """DF * plain-f32."""
    p, e = two_prod(x.hi, a)
    e = e + x.lo * a
    return DF(*quick_two_sum(p, e))


def div(x: DF, y: DF) -> DF:
    """DF / DF by one Newton-style correction of the f32 quotient."""
    q1 = x.hi / y.hi
    r = sub(x, mul_f32(y, q1))
    q2 = (r.hi + r.lo) / y.hi
    return DF(*quick_two_sum(q1, q2))


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def sum_along(x: DF, axis: int) -> DF:
    """Compensated reduction along a SMALL static axis (unrolled df adds)."""
    n = x.hi.shape[axis]
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    acc = DF(hi[0], lo[0])
    for i in range(1, n):
        acc = add(acc, DF(hi[i], lo[i]))
    return acc


def dot_along(x: DF, y: DF, axis: int) -> DF:
    """Compensated contraction sum_k x_k * y_k along a small static axis."""
    return sum_along(mul(x, y), axis)


def gather(x: DF, idx, axis: int = 1) -> DF:
    """Exact gather of a DF array (index both components)."""
    return DF(jnp.take(x.hi, idx, axis=axis), jnp.take(x.lo, idx, axis=axis))
