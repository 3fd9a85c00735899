"""Gaussian (Kalman-family) filters and smoothers.

Baselines used to validate and benchmark the moment filters
(counterpart of reference ``mfs/classical_filters_smoothers/gfs.py``):
Kalman filter/RTS smoother, extended Kalman filter/smoother, their
continuous-discrete RK4 variants, and sigma-point (Gauss–Hermite /
cubature) filters and smoothers.  All are ``lax.scan`` recursions
returning filtering means, covariances, and the running negative log
likelihood.
"""
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mfs_tpu.filters.sigma_points import SigmaPoints, rk4_m_cov, rk4_m_cov_backward
from mfs_tpu.typings import Array, FloatScalar


def _log_mvn_pdf(x: Array, mu: Array, chol: Array) -> Array:
    z = jax.lax.linalg.triangular_solve(chol, x - mu, left_side=True, lower=True)
    half_log_det = jnp.sum(jnp.log(jnp.diagonal(chol)))
    k = x.shape[-1]
    return -0.5 * jnp.dot(z, z) - half_log_det - 0.5 * k * math.log(2.0 * math.pi)


def _predict_linear(F: Array, Sigma: Array, m: Array, P: Array) -> Tuple[Array, Array]:
    return F @ m, F @ P @ F.T + Sigma


def _update_linear(
    mp: Array, vp: Array, H: Array, pred_y: Array, Xi: Array, y: Array
) -> Tuple[Array, Array, Array]:
    """Gaussian measurement update; returns (mean, cov, nell increment)."""
    S = H @ vp @ H.T + Xi
    chol = jax.lax.linalg.cholesky(S)
    K = jax.scipy.linalg.cho_solve((chol, True), H @ vp).T
    nell_inc = -_log_mvn_pdf(y, pred_y, chol)
    return mp + K @ (y - pred_y), vp - K @ S @ K.T, nell_inc


def _smooth_shared(
    DT: Array, mf: Array, vf: Array, mp: Array, vp: Array, ms: Array, vs: Array
) -> Tuple[Array, Array]:
    """One step of the generic Gaussian smoother given D^T = Cov[x_k, x_{k+1}]^T."""
    c, low = jax.scipy.linalg.cho_factor(vp)
    G = jax.scipy.linalg.cho_solve((c, low), DT).T
    return mf + G @ (ms - mp), vf + G @ (vs - vp) @ G.T


def _stack_smoothing(mfs, vfs, mss, vss):
    return jnp.vstack([mss, mfs[-1]]), jnp.vstack([vss, vfs[-1, None]])


def kf(
    F: Array, Sigma: Array, H: Array, Xi: Array, m0: Array, v0: Array, ys: Array
) -> Tuple[Array, Array, Array]:
    """Kalman filter for linear-Gaussian state-space models.

    Returns filtering means (T, dx), covariances (T, dx, dx), and the
    running negative log likelihood (T,).
    """

    def step(carry, y):
        mf, vf, nell = carry
        mp, vp = _predict_linear(F, Sigma, mf, vf)
        mf, vf, inc = _update_linear(mp, vp, H, H @ mp, Xi, y)
        nell = nell + inc
        return (mf, vf, nell), (mf, vf, nell)

    _, (mfs, vfs, nell) = jax.lax.scan(step, (m0, v0, 0.0), ys)
    return mfs, vfs, nell


def rts(F: Array, Sigma: Array, mfs: Array, vfs: Array) -> Tuple[Array, Array]:
    """Rauch–Tung–Striebel smoother from Kalman filtering results."""

    def step(carry, elem):
        ms, vs = carry
        mf, vf = elem
        ms, vs = _smooth_shared(
            F @ vf, mf, vf, F @ mf, F @ vf @ F.T + Sigma, ms, vs
        )
        return (ms, vs), (ms, vs)

    _, (mss, vss) = jax.lax.scan(
        step, (mfs[-1], vfs[-1]), (mfs[:-1], vfs[:-1]), reverse=True
    )
    return _stack_smoothing(mfs, vfs, mss, vss)


def ekf(
    state_cond_m_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    measurement_cond_m_cov: Callable[[Array], Tuple[Array, Array]],
    m0: Array,
    v0: Array,
    dt: FloatScalar,
    ys: Array,
    fwd_jacobian: bool = False,
) -> Tuple[Array, Array, Array]:
    """Extended Kalman filter (first-order linearisation)."""

    def update(mp, vp, y):
        jac = (jax.jacfwd if fwd_jacobian else jax.jacrev)(
            lambda u: measurement_cond_m_cov(u)[0]
        )(mp)
        pred_m, pred_cov = measurement_cond_m_cov(mp)
        return _update_linear(mp, vp, jac, pred_m, pred_cov, y)

    def step(carry, y):
        mf, vf, nell = carry
        jacF = jax.jacfwd(lambda u: state_cond_m_cov(u, dt)[0])(mf)
        mp, Sigma = state_cond_m_cov(mf, dt)
        vp = jacF @ vf @ jacF.T + Sigma
        mf, vf, inc = update(mp, vp, y)
        nell = nell + inc
        return (mf, vf, nell), (mf, vf, nell)

    _, out = jax.lax.scan(step, (m0, v0, 0.0), ys)
    return out


def eks(
    state_cond_m_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    mfs: Array,
    vfs: Array,
    dt: FloatScalar,
) -> Tuple[Array, Array]:
    """Extended Kalman smoother."""

    def step(carry, elem):
        ms, vs = carry
        mf, vf = elem
        jacF = jax.jacfwd(lambda u: state_cond_m_cov(u, dt)[0])(mf)
        mp, Sigma = state_cond_m_cov(mf, dt)
        vp = jacF @ vf @ jacF.T + Sigma
        ms, vs = _smooth_shared(jacF @ vf, mf, vf, mp, vp, ms, vs)
        return (ms, vs), (ms, vs)

    _, (mss, vss) = jax.lax.scan(
        step, (mfs[-1], vfs[-1]), (mfs[:-1], vfs[:-1]), reverse=True
    )
    return _stack_smoothing(mfs, vfs, mss, vss)


def cd_ekf(
    drift: Callable[[Array], Array],
    dispersion: Callable[[Array], Array],
    measurement_cond_m_cov: Callable[[Array], Tuple[Array, Array]],
    m0: Array,
    v0: Array,
    dt: FloatScalar,
    ys: Array,
    fwd_jacobian: bool = False,
) -> Tuple[Array, Array, Array]:
    """Continuous-discrete EKF: RK4 on the mean/cov moment ODEs."""
    jac_drift = jax.jacfwd(drift)

    def odes(m, v):
        J = jac_drift(m)
        b = dispersion(m)
        return drift(m), v @ J.T + J @ v + b @ b.T

    def update(mp, vp, y):
        jac = (jax.jacfwd if fwd_jacobian else jax.jacrev)(
            lambda u: measurement_cond_m_cov(u)[0]
        )(mp)
        pred_m, pred_cov = measurement_cond_m_cov(mp)
        return _update_linear(mp, vp, jac, pred_m, pred_cov, y)

    def step(carry, y):
        mf, vf, nell = carry
        mp, vp = rk4_m_cov(odes, mf, vf, dt)
        mf, vf, inc = update(mp, vp, y)
        nell = nell + inc
        return (mf, vf, nell), (mf, vf, nell)

    _, out = jax.lax.scan(step, (m0, v0, 0.0), ys)
    return out


def cd_eks(
    drift: Callable[[Array], Array],
    dispersion: Callable[[Array], Array],
    mfs: Array,
    vfs: Array,
    dt: FloatScalar,
) -> Tuple[Array, Array]:
    """Continuous-discrete EKS: backward RK4 smoothing ODEs."""
    dt = -dt
    jac_drift = jax.jacfwd(drift)

    def odes(m, v, mf, vf):
        b = dispersion(m)
        gamma = b @ b.T
        c, low = jax.scipy.linalg.cho_factor(vf)
        A = jac_drift(m) + jax.scipy.linalg.cho_solve((c, low), gamma.T).T
        dm = drift(m) + gamma @ jax.scipy.linalg.cho_solve((c, low), m - mf)
        dv = A @ v + v @ A.T - gamma
        return dm, dv

    def step(carry, elem):
        ms, vs = carry
        mf, vf = elem
        ms, vs = rk4_m_cov_backward(odes, ms, vs, mf, vf, dt)
        return (ms, vs), (ms, vs)

    _, (mss, vss) = jax.lax.scan(
        step, (mfs[-1], vfs[-1]), (mfs[:-1], vfs[:-1]), reverse=True
    )
    return _stack_smoothing(mfs, vfs, mss, vss)


def _sgp_predict(sgps, vec_cond_m_cov, dt, mf, vf):
    chi = sgps.gen_sigma_points(mf, jax.lax.linalg.cholesky(vf))
    ms, covs = vec_cond_m_cov(chi, dt)
    mp = sgps.expectation(ms)
    outer = jnp.einsum("i...j,i...k->i...jk", ms, ms)
    vp = sgps.expectation(outer + covs) - jnp.outer(mp, mp)
    return mp, vp, chi, ms


def _sgp_update(sgps, vec_meas_m_cov, mp, vp, y, const_measurement_cov=False):
    chi = sgps.gen_sigma_points(mp, jax.lax.linalg.cholesky(vp))
    ms, xis = vec_meas_m_cov(chi)
    pred = sgps.expectation(ms)
    outer = jnp.einsum("ij,ik->ijk", ms, ms)
    if const_measurement_cov:
        S = sgps.expectation(outer) - jnp.outer(pred, pred) + xis[0]
    else:
        S = sgps.expectation(outer + xis) - jnp.outer(pred, pred)
    C = sgps.expectation(jnp.einsum("ij,ik->ijk", chi, ms)) - jnp.outer(mp, pred)
    chol = jax.lax.linalg.cholesky(S)
    K = jax.scipy.linalg.cho_solve((chol, True), C.T).T
    return mp + K @ (y - pred), vp - K @ S @ K.T, -_log_mvn_pdf(y, pred, chol)


def sgp_filter(
    state_cond_m_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    measurement_cond_m_cov: Callable[[Array], Tuple[Array, Array]],
    sgps: SigmaPoints,
    m0: Array,
    v0: Array,
    dt: FloatScalar,
    ys: Array,
    const_measurement_cov: bool = False,
) -> Tuple[Array, Array, Array]:
    """Sigma-point (e.g. Gauss–Hermite) filter on a discretised SDE."""
    vec_cond = jax.vmap(state_cond_m_cov, in_axes=[0, None])
    vec_meas = jax.vmap(measurement_cond_m_cov)

    def step(carry, y):
        mf, vf, nell = carry
        mp, vp, _, _ = _sgp_predict(sgps, vec_cond, dt, mf, vf)
        mf, vf, inc = _sgp_update(sgps, vec_meas, mp, vp, y, const_measurement_cov)
        nell = nell + inc
        return (mf, vf, nell), (mf, vf, nell)

    _, out = jax.lax.scan(step, (m0, v0, 0.0), ys)
    return out


def sgp_smoother(
    state_cond_m_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    sgps: SigmaPoints,
    mfs: Array,
    vfs: Array,
    dt: FloatScalar,
) -> Tuple[Array, Array]:
    """Sigma-point smoother."""
    vec_cond = jax.vmap(state_cond_m_cov, in_axes=[0, None])

    def step(carry, elem):
        ms, vs = carry
        mf, vf = elem
        mp, vp, chi, prop_ms = _sgp_predict(sgps, vec_cond, dt, mf, vf)
        D = sgps.expectation(jnp.einsum("ij,ik->ijk", chi, prop_ms)) - jnp.outer(
            mf, mp
        )
        ms, vs = _smooth_shared(D.T, mf, vf, mp, vp, ms, vs)
        return (ms, vs), (ms, vs)

    _, (mss, vss) = jax.lax.scan(
        step, (mfs[-1], vfs[-1]), (mfs[:-1], vfs[:-1]), reverse=True
    )
    return _stack_smoothing(mfs, vfs, mss, vss)


def _cd_sgp_moment_odes(sgps, vec_drift, dispersion_const, m, P):
    chi = sgps.gen_sigma_points(m, jax.lax.linalg.cholesky(P))
    evals = vec_drift(chi)
    dm = sgps.expectation(evals)
    cross = sgps.expectation(jnp.einsum("ij,ik->ijk", chi - m, evals))
    return dm, cross + cross.T + dispersion_const @ dispersion_const.T


def cd_sgp_filter(
    drift: Callable[[Array], Array],
    dispersion: Array,
    measurement_cond_m_cov: Callable[[Array], Tuple[Array, Array]],
    sgps: SigmaPoints,
    m0: Array,
    v0: Array,
    dt: FloatScalar,
    ys: Array,
    const_measurement_cov: bool = False,
) -> Tuple[Array, Array, Array]:
    """Continuous-discrete sigma-point filter (RK4 moment ODEs)."""
    vec_drift = jax.vmap(drift)
    vec_meas = jax.vmap(measurement_cond_m_cov)

    def odes(m, v):
        return _cd_sgp_moment_odes(sgps, vec_drift, dispersion, m, v)

    def step(carry, y):
        mf, vf, nell = carry
        mp, vp = rk4_m_cov(odes, mf, vf, dt)
        mf, vf, inc = _sgp_update(sgps, vec_meas, mp, vp, y, const_measurement_cov)
        nell = nell + inc
        return (mf, vf, nell), (mf, vf, nell)

    _, out = jax.lax.scan(step, (m0, v0, 0.0), ys)
    return out


def cd_sgp_smoother(
    drift: Callable[[Array], Array],
    dispersion: Array,
    sgps: SigmaPoints,
    mfs: Array,
    vfs: Array,
    dt: FloatScalar,
) -> Tuple[Array, Array]:
    """Continuous-discrete sigma-point smoother."""
    dt = -dt
    vec_drift = jax.vmap(drift)

    def odes(m, v, mf, vf):
        gamma = dispersion @ dispersion.T
        c, low = jax.scipy.linalg.cho_factor(vf)
        G = jax.scipy.linalg.cho_solve((c, low), gamma)
        dm, dP = _cd_sgp_moment_odes(sgps, vec_drift, dispersion, m, v)
        return dm + G.T @ (m - mf), dP + G.T @ v + v @ G - 2 * gamma

    def step(carry, elem):
        ms, vs = carry
        mf, vf = elem
        ms, vs = rk4_m_cov_backward(odes, ms, vs, mf, vf, dt)
        return (ms, vs), (ms, vs)

    _, (mss, vss) = jax.lax.scan(
        step, (mfs[-1], vfs[-1]), (mfs[:-1], vfs[:-1]), reverse=True
    )
    return _stack_smoothing(mfs, vfs, mss, vss)
