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
XLA does not reassociate float arithmetic, but its CPU backend
FMA-contracts ``round(a*b) + c`` into ``fma(a, b, c)`` regardless of
``--xla_allow_excess_precision`` — which silently *un-rounds* a product
whose rounding error a compensation term already accounts for (measured:
``mul(X, X)`` degrades from 1e-14 to 6e-8 under jit).  The defense here
is structural, not flag-based: every f32 multiply in the error-free
transforms is *exactly representable* (12-bit × 12-bit operand halves
from an integer mask-based split), so any contraction computes the
identical value.  The only inexact multiplies are the ~2^-24-scale
cross terms, where contraction perturbs results below the 2^-45 target.
Precision is validated against f64 in the tests.
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.typings import Array


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
    # requires |a| >= |b|.  Every rounded intermediate is barriered:
    # leaving any of them foldable lets the simplifier rewrite e.g.
    # ``b - (s - a)`` to ``(a + b) - s`` (valid in reals only), which
    # collapses the compensation to zero (ADVICE.md round-1 high).
    s = _nofold(a + b)
    t = _nofold(s - a)
    return s, _nofold(b - t)


def _two_sum(a, b) -> Tuple[Array, Array]:
    s = _nofold(a + b)
    bb = _nofold(s - a)
    ea = _nofold(a - _nofold(s - bb))
    eb = _nofold(b - bb)
    return s, _nofold(ea + eb)


def _split(a) -> Tuple[Array, Array]:
    """Split a into 12-bit halves: a = hi + lo exactly, each half with
    at most 12 significant bits (so products of halves are exact f32).

    Integer round-to-12-bits: add half an ulp-at-bit-12 to the payload
    and mask the low 12 mantissa bits.  IEEE sign-magnitude makes this
    correct for negatives; a mantissa carry rounds up into the exponent,
    which is still exactly representable.  Built from integer ops that
    neither XLA's algebraic simplifier nor LLVM's FMA contraction can
    rewrite (the Veltkamp float-only split is corrupted by contraction
    of its ``SPLIT*a - a`` step into an fma).  ``lo = a - hi`` is exact
    (Sterbenz).
    """
    if isinstance(a, (int, float, np.floating)) or (
        isinstance(a, np.ndarray) and a.ndim == 0
    ):
        # Constants split at trace time (keeps them NumPy scalars —
        # Mosaic rejects scalar bitcasts and captured jax constants).
        af = np.float32(a)
        bits = np.asarray(af).view(np.uint32)
        hi = np.asarray(
            (bits + np.uint32(0x800)) & np.uint32(0xFFFFF000)
        ).view(np.float32)[()]
        return hi, np.float32(af - hi)
    a = jnp.asarray(a, jnp.float32)
    shaped = a if a.ndim else a.reshape(1)
    bits = jax.lax.bitcast_convert_type(shaped, jnp.uint32)
    hi_bits = (bits + jnp.uint32(0x800)) & jnp.uint32(0xFFFFF000)
    hi = jax.lax.bitcast_convert_type(hi_bits, jnp.float32)
    hi = hi if a.ndim else hi.reshape(())
    return hi, a - hi


def _two_prod(a, b) -> Tuple[Array, Array]:
    """Exact product: p + err == a*b with p = fl(a*b) (to ~1 ulp^2).

    All four partial products of the 12-bit halves are exactly
    representable, so every multiply is immune to FMA contraction; the
    partials are then summed with error-free adds only.
    """
    ah, al = _split(a)
    bh, bl = _split(b)
    hh = ah * bh          # exact, carries the full magnitude
    m1 = ah * bl          # exact, ~2^-12 scale
    m2 = al * bh          # exact, ~2^-12 scale
    ll = al * bl          # exact, ~2^-24 scale
    s, e = _two_sum(m1, m2)
    e = _nofold(e + ll)
    p, e2 = _two_sum(hh, s)
    err = _nofold(e2 + e)
    return p, err


def add(a: DF, b: DF) -> DF:
    # Full-precision double-float add (QD "ieee_add"): both the hi and
    # lo sums go through error-free transforms, so the result stays
    # accurate to ~2 ulp of itself even under heavy cancellation (the
    # sloppy single-two_sum variant degrades to ~1e-10 relative there,
    # which broke the Cholesky of ill-conditioned Hankel matrices).
    s, e = _two_sum(a.hi, b.hi)
    t, te = _two_sum(a.lo, b.lo)
    e = _nofold(e + t)
    s, e = _quick_two_sum(s, e)
    e = _nofold(e + te)
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
