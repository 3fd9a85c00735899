"""Sigma-point rules and RK4 integrators for Gaussian filters.

Counterpart of reference ``mfs/classical_filters_smoothers/quadratures.py``.
Gauss–Hermite nodes/weights come from ``numpy.polynomial`` at trace
time (compilation constants) instead of polynomial root-finding.
"""
import math
from functools import partial
from typing import Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.typings import Array


def rk4_m_cov(
    m_cov_ode: Callable[[Array, Array], Tuple[Array, Array]],
    m: Array,
    v: Array,
    dt: float,
) -> Tuple[Array, Array]:
    """Classic RK4 step for a coupled mean/covariance ODE system."""
    k1m, k1v = m_cov_ode(m, v)
    k2m, k2v = m_cov_ode(m + dt * k1m / 2, v + dt * k1v / 2)
    k3m, k3v = m_cov_ode(m + dt * k2m / 2, v + dt * k2v / 2)
    k4m, k4v = m_cov_ode(m + dt * k3m, v + dt * k3v)
    return (
        m + dt * (k1m + 2 * k2m + 2 * k3m + k4m) / 6,
        v + dt * (k1v + 2 * k2v + 2 * k3v + k4v) / 6,
    )


def rk4_m_cov_backward(
    m_cov_ode: Callable[[Array, Array, Array, Array], Tuple[Array, Array]],
    m: Array,
    v: Array,
    mf: Array,
    vf: Array,
    dt: float,
) -> Tuple[Array, Array]:
    """RK4 step for the backward (smoothing) mean/covariance ODEs."""
    k1m, k1v = m_cov_ode(m, v, mf, vf)
    k2m, k2v = m_cov_ode(m + dt * k1m / 2, v + dt * k1v / 2, mf, vf)
    k3m, k3v = m_cov_ode(m + dt * k2m / 2, v + dt * k2v / 2, mf, vf)
    k4m, k4v = m_cov_ode(m + dt * k3m, v + dt * k3v, mf, vf)
    return (
        m + dt * (k1m + 2 * k2m + 2 * k3m + k4m) / 6,
        v + dt * (k1v + 2 * k2v + 2 * k3v + k4v) / 6,
    )


class SigmaPoints(NamedTuple):
    r"""Sigma-point integration rule.

    ``∫ z(x) N(x | m, P) dx ≈ Σ_i w_i z(m + chol(P) ξ_i)``.
    """

    d: int
    n_points: int
    w: Array
    wc: Union[Array, None]
    xi: Array  # (n_points, d)

    @classmethod
    def cubature(cls, d: int) -> "SigmaPoints":
        """Spherical cubature rule (2d points)."""
        n_points = 2 * d
        w = jnp.full((n_points,), 1.0 / n_points)
        xi = math.sqrt(d) * jnp.concatenate([jnp.eye(d), -jnp.eye(d)], axis=0)
        return cls(d=d, n_points=n_points, w=w, wc=None, xi=xi)

    @classmethod
    def gauss_hermite(cls, d: int, order: int = 3) -> "SigmaPoints":
        """Tensor-product Gauss–Hermite rule (order^d points).

        1D nodes/weights from ``numpy.polynomial.hermite_e.hermegauss``
        (probabilists' convention: weight function N(0, 1)).
        """
        nodes_1d, weights_1d = np.polynomial.hermite_e.hermegauss(order)
        weights_1d = weights_1d / math.sqrt(2.0 * math.pi)
        grids = np.meshgrid(*([nodes_1d] * d), indexing="ij")
        xi = np.stack([g.ravel() for g in grids], axis=-1)  # (order^d, d)
        wgrids = np.meshgrid(*([weights_1d] * d), indexing="ij")
        w = np.prod(np.stack([g.ravel() for g in wgrids], axis=-1), axis=-1)
        return cls(
            d=d, n_points=order**d, w=jnp.asarray(w), wc=None, xi=jnp.asarray(xi)
        )

    @classmethod
    def unscented(cls, d: int, alpha: float = 1.0, beta: float = 2.0, kappa: float = None) -> "SigmaPoints":
        """Unscented transform points (2d + 1).

        Left unimplemented in the reference
        (``mfs/classical_filters_smoothers/quadratures.py:150-152``);
        provided here with the standard Julier weights.  Note ``wc``
        (covariance weights) differ from ``w`` when alpha != 1 or
        beta != 0.
        """
        if kappa is None:
            kappa = 3.0 - d
        lam = alpha**2 * (d + kappa) - d
        xi0 = jnp.zeros((1, d))
        xs = math.sqrt(d + lam) * jnp.eye(d)
        xi = jnp.concatenate([xi0, xs, -xs], axis=0)
        w0 = lam / (d + lam)
        wi = 1.0 / (2.0 * (d + lam))
        w = jnp.concatenate([jnp.array([w0]), jnp.full((2 * d,), wi)])
        wc = w.at[0].add(1.0 - alpha**2 + beta)
        return cls(d=d, n_points=2 * d + 1, w=w, wc=wc, xi=xi)

    def gen_sigma_points(self, m: Array, chol_of_v: Array) -> Array:
        return m + jnp.einsum("ij,...j->...i", chol_of_v, self.xi)

    def expectation_from_nodes(self, v_f: Callable, chi: Array) -> Array:
        return jnp.einsum("i,i...->...", self.w, v_f(chi))

    def expectation(self, evals_of_integrand: Array) -> Array:
        return jnp.einsum("i,i...->...", self.w, evals_of_integrand)


def gaussian_expectation(
    ms: Array,
    chol_vs: Array,
    func: Callable,
    d: int = 1,
    order: int = 10,
    force_shape: bool = False,
) -> Array:
    """E[g(V_k)] for a trajectory of Gaussians V_k ~ N(m_k, P_k), by GH."""
    if force_shape:
        ms = jnp.reshape(ms, (-1, 1))
        chol_vs = jnp.reshape(chol_vs, (-1, 1, 1))
    sgps = SigmaPoints.gauss_hermite(d=d, order=order)

    @partial(jax.vmap, in_axes=[0, 0])
    def one(m, chol):
        chi = sgps.gen_sigma_points(m, chol)
        return sgps.expectation_from_nodes(func, chi)

    return one(ms, chol_vs)
