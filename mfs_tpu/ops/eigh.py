"""Batched small symmetric eigendecomposition for TPU.

The moment-quadrature step eigendecomposes thousands of tiny (n <= ~32)
symmetric multiplication-operator matrices per filter step.  XLA's
``lax.linalg.eigh`` on TPU is a poor fit for this regime (measured on
v5e: ~46 ms per call for a (2048, 16, 16) f64 batch, and f32 residuals
around 1e-3 of the matrix norm).  This module implements a
*parallel-ordered cyclic Jacobi* eigensolver in which

- every sweep is a static round-robin schedule of n/2 disjoint
  rotations applied simultaneously,
- each round applies one orthogonal matrix Q via two batched matmuls
  (MXU-friendly; true f64 via XLA's emulation, verified ~1e-15), and
- the sweep count is a compile-time constant (cyclic Jacobi converges
  quadratically; the default is calibrated in tests to f64 machine
  precision for n <= 32).

A custom JVP implements the standard eigh differentiation rule so the
negative log-likelihood stays differentiable through the quadrature
(the reference relies on JAX's built-in rules: reference
``mfs/one_dim/quadtures.py:131``, ``dardel/parameter_estimation/mf.py:37-72``).
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.typings import Array


@functools.lru_cache(maxsize=None)
def _round_robin_schedule(n: int) -> Tuple[Tuple[np.ndarray, np.ndarray], ...]:
    """Static tournament schedule: n-1 rounds of n/2 disjoint (p, q) pairs.

    For odd n one virtual index sits out each round (classic circle
    method).  Returns tuples of (ps, qs) index arrays with p < q.
    """
    m = n if n % 2 == 0 else n + 1
    players = list(range(m))
    rounds = []
    for _ in range(m - 1):
        ps, qs = [], []
        for i in range(m // 2):
            a, b = players[i], players[m - 1 - i]
            if a < n and b < n:
                ps.append(min(a, b))
                qs.append(max(a, b))
        rounds.append((np.array(ps), np.array(qs)))
        players = [players[0]] + [players[-1]] + players[1:-1]
    return tuple(rounds)


def _default_sweeps(n: int) -> int:
    # Cyclic Jacobi converges quadratically; these are conservative
    # (validated to f64 machine precision in tests/test_ops_eigh.py).
    if n <= 4:
        return 6
    if n <= 12:
        return 8
    if n <= 24:
        return 10
    return 12


def _jacobi_eigh(a: Array, sweeps: int) -> Tuple[Array, Array]:
    n = a.shape[-1]
    dtype = a.dtype
    eye = jnp.eye(n, dtype=dtype)
    v = jnp.broadcast_to(eye, a.shape)
    schedule = _round_robin_schedule(n)

    # Static one-hot bases per round: Q = I + Σ_k [ (c_k - 1)(E_pp + E_qq)
    # + s_k (E_pq - E_qp) ].  Building Q with small einsums keeps the
    # whole update on the MXU/VPU — dynamic scatters (``.at[...].set``)
    # are an order-of-magnitude slower on TPU.
    def _round_consts(ps, qs):
        m = len(ps)
        diag = np.zeros((m, n, n))
        skew = np.zeros((m, n, n))
        diag[np.arange(m), ps, ps] = 1.0
        diag[np.arange(m), qs, qs] = 1.0
        skew[np.arange(m), ps, qs] = 1.0
        skew[np.arange(m), qs, ps] = -1.0
        return jnp.asarray(diag, dtype), jnp.asarray(skew, dtype)

    consts = [_round_consts(ps, qs) for ps, qs in schedule]

    def apply_round(a, v, ps, qs, diag_basis, skew_basis):
        app = a[..., ps, ps]
        aqq = a[..., qs, qs]
        apq = a[..., ps, qs]
        # Golub–Van Loan 8.4.1 rotation choice (smaller-angle root).
        small = jnp.abs(apq) <= jnp.finfo(dtype).tiny * 1e3
        safe_apq = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        q = (
            eye
            + jnp.einsum("...m,mij->...ij", c - 1.0, diag_basis)
            + jnp.einsum("...m,mij->...ij", s, skew_basis)
        )
        aq = jnp.einsum("...jk,...kl->...jl", a, q)
        a = jnp.einsum("...ji,...jl->...il", q, aq)
        # Re-symmetrise to kill rounding drift.
        a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
        v = jnp.einsum("...ij,...jk->...ik", v, q)
        return a, v

    for _ in range(sweeps):
        for (ps, qs), (diag_basis, skew_basis) in zip(schedule, consts):
            a, v = apply_round(a, v, ps, qs, diag_basis, skew_basis)

    vals = jnp.diagonal(a, axis1=-2, axis2=-1)
    return vals, v


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _eigh_core(a: Array, sweeps: int) -> Tuple[Array, Array]:
    return _jacobi_eigh(a, sweeps)


@_eigh_core.defjvp
def _eigh_core_jvp(sweeps, primals, tangents):
    (a,) = primals
    (da,) = tangents
    vals, vecs = _eigh_core(a, sweeps)
    da = 0.5 * (da + jnp.swapaxes(da, -1, -2))
    s = jnp.einsum("...ji,...jk,...kl->...il", vecs, da, vecs)
    dvals = jnp.diagonal(s, axis1=-2, axis2=-1)
    gaps = vals[..., None, :] - vals[..., :, None]  # gaps[i, j] = w_j - w_i
    n = a.shape[-1]
    off = ~jnp.eye(n, dtype=bool)
    safe = jnp.where(off, gaps, 1.0)
    f = jnp.where(off, 1.0 / safe, 0.0)
    dvecs = jnp.einsum("...ik,...kj->...ij", vecs, f * s)
    return (vals, vecs), (dvals, dvecs)


def eigh_batched(a: Array, sweeps: int = None, sort: bool = False) -> Tuple[Array, Array]:
    """Eigendecomposition of a batch of small symmetric matrices.

    Parameters
    ----------
    a : Array (..., n, n)
        Symmetric matrices.
    sweeps : int, optional
        Number of cyclic-Jacobi sweeps (static).  Default is a
        conservative size-based heuristic.
    sort : bool
        Sort eigenvalues (and eigenvectors) ascending.  The moment
        quadrature does not require sorting.

    Returns
    -------
    vals : Array (..., n), vecs : Array (..., n, n)
        ``a ≈ vecs @ diag(vals) @ vecs.T`` (columns are eigenvectors).
    """
    n = a.shape[-1]
    if sweeps is None:
        sweeps = _default_sweeps(n)
    vals, vecs = _eigh_core(a, sweeps)
    if sort:
        order = jnp.argsort(vals, axis=-1)
        vals = jnp.take_along_axis(vals, order, axis=-1)
        vecs = jnp.take_along_axis(vecs, order[..., None, :], axis=-1)
    return vals, vecs


def eigh_xla(a: Array, sort: bool = False) -> Tuple[Array, Array]:
    """XLA's eigh with the same (vals, vecs) return convention."""
    vecs, vals = jax.lax.linalg.eigh(a, sort_eigenvalues=sort)
    return vals, vecs
