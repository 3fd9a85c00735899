"""Double-float (f32 pair) arithmetic — error-free transforms.

TPU hardware has no f64 ALU: XLA emulates f64 ops one at a time, with
HBM round-trips between them (measured ~1.5 GFLOP/s effective for f64
matmuls on v5e).  Inside a Pallas kernel we instead carry ~2^-45
precision as (hi, lo) f32 pairs using the classical error-free
transforms (Dekker 1971, Knuth TAOCP v2) — built only from f32 adds and
multiplies that the VPU executes natively, and fused in VMEM.

These functions are plain jnp compositions, so they work (and are
tested) both inside Pallas kernels and in regular traced code.

Note: correctness requires IEEE f32 semantics without reassociation.
XLA does not reassociate float arithmetic; ``--xla_allow_excess_
precision`` may fuse a*b+c into FMAs, which only *improves* two_prod's
error term on TPU.  Precision is validated against f64 in the tests.
"""
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from mfs_tpu.typings import Array

# Veltkamp split constant for f32 (24-bit mantissa): 2^12 + 1.
_SPLIT = np.float32(4097.0)


class DF(NamedTuple):
    """A double-float value: x ≈ hi + lo with |lo| <= ulp(hi)/2."""

    hi: Array
    lo: Array


def df(hi, lo=None) -> DF:
    # Python/NumPy scalars stay NumPy scalars: Pallas kernels reject
    # captured jax.Array constants, and np scalars broadcast identically.
    if isinstance(hi, (int, float, np.floating)):
        hi = np.float32(hi)
        lo = np.float32(0.0) if lo is None else np.float32(lo)
        return DF(hi, lo)
    hi = jnp.asarray(hi, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return DF(hi, jnp.asarray(lo, jnp.float32))


def from_f64(x) -> DF:
    """Split an f64 array into an (hi, lo) f32 pair (outside kernels)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def to_f64(a: DF):
    """Recombine to f64 (outside kernels)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


_BARRIER_MODE = ["xla"]  # "xla" -> optimization_barrier, "none" -> identity


class barrier_mode:
    """Context manager selecting the anti-folding mechanism.

    Inside real Pallas TPU kernels (Mosaic lowering) the
    ``optimization_barrier`` primitive is unsupported — and unnecessary:
    Mosaic does not run the XLA HLO algebraic simplifier that folds the
    compensation terms.  The Pallas wrappers trace kernels under
    ``barrier_mode("none")``.
    """

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        self.prev = _BARRIER_MODE[0]
        _BARRIER_MODE[0] = self.mode

    def __exit__(self, *exc):
        _BARRIER_MODE[0] = self.prev


def _nofold(x):
    """Defeat XLA's algebraic simplifier.

    This environment compiles with ``--xla_allow_excess_precision``,
    under which XLA folds compensation patterns like
    ``(a - (s - bb)) + (b - bb)`` to zero and fuses products into FMAs
    — silently destroying every error-free transform (measured: a
    40-step df chain degrades from 2.6e-13 to 1.2e-6 under jit).  An
    optimization barrier on the rounded intermediates keeps the exact
    IEEE results opaque to the simplifier.
    """
    if _BARRIER_MODE[0] == "none":
        return x
    import jax

    return jax.lax.optimization_barrier(x)


def _quick_two_sum(a, b) -> Tuple[Array, Array]:
    # requires |a| >= |b|
    s = _nofold(a + b)
    return s, b - (s - a)


def _two_sum(a, b) -> Tuple[Array, Array]:
    s = _nofold(a + b)
    bb = _nofold(s - a)
    return s, (a - (s - bb)) + (b - bb)


def _split(a) -> Tuple[Array, Array]:
    t = _nofold(_SPLIT * a)
    hi = _nofold(t - (t - a))
    return hi, a - hi


def _two_prod(a, b) -> Tuple[Array, Array]:
    p = _nofold(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((_nofold(ah * bh) - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(a: DF, b: DF) -> DF:
    s, e = _two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    hi, lo = _quick_two_sum(s, e)
    return DF(hi, lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, DF(-b.hi, -b.lo))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def mul(a: DF, b: DF) -> DF:
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def div(a: DF, b: DF) -> DF:
    q1 = a.hi / b.hi
    r = sub(a, mul(df(q1), b))
    q2 = (r.hi + r.lo) / b.hi
    hi, lo = _quick_two_sum(q1, q2)
    return DF(hi, lo)


def sqrt(a: DF) -> DF:
    """One Newton step on an f32 sqrt seed (Karp–Markstein style)."""
    s = jnp.sqrt(a.hi)
    # guard zero to avoid 0/0; sqrt(0) stays 0.
    safe = jnp.where(s == 0, 1.0, s)
    r = sub(a, mul(df(s), df(s)))
    corr = (r.hi + r.lo) / (2.0 * safe)
    corr = jnp.where(s == 0, 0.0, corr)
    hi, lo = _quick_two_sum(s, corr)
    return DF(hi, lo)


def scale_f32(a: DF, c) -> DF:
    """Multiply by an exact f32 scalar (e.g. 0.5, -1.0, 2.0)."""
    return DF(a.hi * c, a.lo * c)


def lt(a: DF, b: DF) -> Array:
    return jnp.where(
        a.hi == b.hi, a.lo < b.lo, a.hi < b.hi
    )


def where(mask, a: DF, b: DF) -> DF:
    return DF(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))
