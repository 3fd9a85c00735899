"""Classical filters/smoothers: equivalence ladder on a linear model.

Mirrors reference ``tests/test_classical_filters_smoothers.py``: on a
linear-Gaussian SDE every Gaussian filter (KF, EKF, GHF, cubature,
their continuous-discrete variants) is exact, so all must agree; the
bootstrap PF and the brute-force grid filter converge to the same
answer with method-graded tolerances.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.filters.gaussian import (
    cd_ekf,
    cd_eks,
    cd_sgp_filter,
    cd_sgp_smoother,
    ekf,
    eks,
    kf,
    rts,
    sgp_filter,
    sgp_smoother,
)
from mfs_tpu.filters.grid import brute_force_filter
from mfs_tpu.filters.resampling import multinomial, stratified, systematic
from mfs_tpu.filters.sigma_points import SigmaPoints, gaussian_expectation
from mfs_tpu.filters.smc import bootstrap_filter, particle_filter
from mfs_tpu.utils.gaussian import discretise_lti_sde

# OU model: dX = -X dt + q dW;  Y_k = X_k + r_k.
DT = 1e-2
T = 200
Q_DIFF = 0.7
XI = 0.25
M0, V0 = jnp.array([0.2]), jnp.array([[0.8]])


def _data():
    rng = np.random.RandomState(3)
    xs = [0.2]
    F = math.exp(-DT)
    q = Q_DIFF**2 / 2 * (1 - math.exp(-2 * DT))
    for _ in range(T):
        xs.append(F * xs[-1] + math.sqrt(q) * rng.randn())
    xs = np.asarray(xs[1:])
    return jnp.asarray(xs), jnp.asarray(xs + math.sqrt(XI) * rng.randn(T))


XS, YS = _data()
F_MAT, Q_MAT = discretise_lti_sde(jnp.array([[-1.0]]), jnp.array([[Q_DIFF]]), DT)


@pytest.fixture(scope="module")
def kalman():
    return kf(F_MAT, Q_MAT, jnp.eye(1), XI * jnp.eye(1), M0, V0, YS[:, None])


def _state_cond_m_cov(x, dt):
    return F_MAT @ x, Q_MAT


def _meas_cond_m_cov(x):
    return x, XI * jnp.eye(1)


def test_ekf_equals_kf(kalman):
    mfs, vfs, nell = ekf(_state_cond_m_cov, _meas_cond_m_cov, M0, V0, DT, YS[:, None])
    np.testing.assert_allclose(np.asarray(mfs), np.asarray(kalman[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vfs), np.asarray(kalman[1]), rtol=1e-9)
    np.testing.assert_allclose(float(nell[-1]), float(kalman[2][-1]), rtol=1e-10)


@pytest.mark.parametrize("rule", ["gh", "cubature"])
def test_sgp_filter_equals_kf(kalman, rule):
    sgps = (
        SigmaPoints.gauss_hermite(d=1, order=5)
        if rule == "gh"
        else SigmaPoints.cubature(d=1)
    )
    mfs, vfs, nell = sgp_filter(
        _state_cond_m_cov, _meas_cond_m_cov, sgps, M0, V0, DT, YS[:, None],
        const_measurement_cov=True,
    )
    np.testing.assert_allclose(np.asarray(mfs), np.asarray(kalman[0]), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vfs), np.asarray(kalman[1]), rtol=1e-6)
    np.testing.assert_allclose(float(nell[-1]), float(kalman[2][-1]), rtol=1e-8)


def test_cd_ekf_close_to_kf(kalman):
    mfs, vfs, nell = cd_ekf(
        lambda x: -x,
        lambda x: Q_DIFF * jnp.eye(1),
        _meas_cond_m_cov,
        M0,
        V0,
        DT,
        YS[:, None],
    )
    np.testing.assert_allclose(np.asarray(mfs), np.asarray(kalman[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vfs), np.asarray(kalman[1]), atol=1e-6)


def test_cd_sgp_filter_close_to_kf(kalman):
    sgps = SigmaPoints.gauss_hermite(d=1, order=5)
    mfs, vfs, nell = cd_sgp_filter(
        lambda x: -x,
        Q_DIFF * jnp.eye(1),
        _meas_cond_m_cov,
        sgps,
        M0,
        V0,
        DT,
        YS[:, None],
        const_measurement_cov=True,
    )
    np.testing.assert_allclose(np.asarray(mfs), np.asarray(kalman[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vfs), np.asarray(kalman[1]), atol=1e-6)


def test_smoothers_agree(kalman):
    mfs, vfs, _ = kalman
    ms_rts, vs_rts = rts(F_MAT, Q_MAT, mfs, vfs)
    ms_eks, vs_eks = eks(_state_cond_m_cov, mfs, vfs, DT)
    sgps = SigmaPoints.gauss_hermite(d=1, order=5)
    ms_sgp, vs_sgp = sgp_smoother(_state_cond_m_cov, sgps, mfs, vfs, DT)
    np.testing.assert_allclose(np.asarray(ms_eks), np.asarray(ms_rts), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ms_sgp), np.asarray(ms_rts), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs_sgp), np.asarray(vs_rts), rtol=1e-5, atol=1e-8)
    # smoothing reduces uncertainty vs filtering (except the last step)
    assert np.all(np.asarray(vs_rts)[:-1, 0, 0] <= np.asarray(vfs)[:-1, 0, 0] + 1e-12)
    # CD smoothers integrate the continuous-time ODEs, so they match the
    # discrete RTS only up to the time-discretisation error (~1e-2 here).
    ms_cds, vs_cds = cd_eks(lambda x: -x, lambda x: Q_DIFF * jnp.eye(1), mfs, vfs, DT)
    np.testing.assert_allclose(np.asarray(ms_cds), np.asarray(ms_rts), atol=5e-2)
    ms_csg, _ = cd_sgp_smoother(lambda x: -x, Q_DIFF * jnp.eye(1), sgps, mfs, vfs, DT)
    np.testing.assert_allclose(np.asarray(ms_csg), np.asarray(ms_rts), atol=5e-2)
    np.testing.assert_allclose(np.asarray(ms_csg), np.asarray(ms_cds), atol=1e-6)


@pytest.mark.parametrize("resampler", [systematic, stratified, multinomial])
def test_bootstrap_pf_close_to_kf(kalman, resampler):
    chol_q = jnp.sqrt(Q_MAT[0, 0])

    def transition_sampler(samples, key):
        return F_MAT[0, 0] * samples + chol_q * jax.random.normal(key, samples.shape)

    def meas_pdf(y, x):
        return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    def init_sampler(key, n):
        return M0[0] + jnp.sqrt(V0[0, 0]) * jax.random.normal(key, (n,))

    samples, nell = bootstrap_filter(
        transition_sampler,
        meas_pdf,
        YS,
        init_sampler,
        jax.random.PRNGKey(0),
        5000,
        resampler,
    )
    pf_means = jnp.mean(samples, axis=1)
    np.testing.assert_allclose(
        np.asarray(pf_means), np.asarray(kalman[0][:, 0]), atol=2e-1
    )
    np.testing.assert_allclose(float(nell), float(kalman[2][-1]), rtol=5e-2)


def test_bootstrap_pf_batched_trials(kalman):
    """Batch-first SMC: one call filters an ensemble of trials, each
    resampled independently; every trial tracks the KF."""
    chol_q = jnp.sqrt(Q_MAT[0, 0])
    B = 3

    def transition_sampler(samples, key):
        return F_MAT[0, 0] * samples + chol_q * jax.random.normal(key, samples.shape)

    def meas_pdf(y, x):
        return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    def init_sampler(key, n):
        return M0[0] + jnp.sqrt(V0[0, 0]) * jax.random.normal(key, (B, n))

    ys_b = jnp.broadcast_to(YS[:, None], (YS.shape[0], B))
    samples, nell = bootstrap_filter(
        transition_sampler,
        meas_pdf,
        ys_b,
        init_sampler,
        jax.random.PRNGKey(0),
        4000,
        stratified,
    )
    assert samples.shape == (YS.shape[0], B, 4000)
    assert nell.shape == (B,)
    pf_means = jnp.mean(samples, axis=-1)  # (T, B)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(pf_means[:, b]), np.asarray(kalman[0][:, 0]), atol=2e-1
        )
        np.testing.assert_allclose(float(nell[b]), float(kalman[2][-1]), rtol=5e-2)
    # independent resampling noise => trials differ
    assert float(jnp.max(jnp.abs(pf_means[:, 0] - pf_means[:, 1]))) > 1e-4


def test_particle_filter_optimal_proposal_batched(kalman):
    """Proposal-based SMC with the locally-optimal proposal
    p(x_k | x_{k-1}, y_k) (Gaussian for this linear model) tracks the
    KF; batched trials exercise the inserted particle axis on y."""
    B = 2
    F, Q = F_MAT[0, 0], Q_MAT[0, 0]
    # posterior of x | x_prev, y: precision-weighted combination
    v_opt = 1.0 / (1.0 / Q + 1.0 / XI)
    chol_opt = jnp.sqrt(v_opt)

    def _normal_pdf(x, m, v):
        return jnp.exp(-0.5 * (x - m) ** 2 / v) / jnp.sqrt(2 * jnp.pi * v)

    def proposal_sampler(ancestors, y, key):
        m = v_opt * (F * ancestors / Q + y / XI)
        return m + chol_opt * jax.random.normal(key, ancestors.shape)

    def proposal_density(samples, ancestors, y):
        m = v_opt * (F * ancestors / Q + y / XI)
        return _normal_pdf(samples, m, v_opt)

    def transition_density(samples, ancestors):
        return _normal_pdf(samples, F * ancestors, Q)

    def meas_pdf(y, x):
        return _normal_pdf(y, x, XI)

    def init_sampler(key, n):
        return M0[0] + jnp.sqrt(V0[0, 0]) * jax.random.normal(key, (B, n))

    ys_b = jnp.broadcast_to(YS[:, None], (YS.shape[0], B))
    samples = particle_filter(
        proposal_sampler,
        proposal_density,
        transition_density,
        meas_pdf,
        ys_b,
        init_sampler,
        jax.random.PRNGKey(1),
        4000,
        stratified,
    )
    assert samples.shape == (YS.shape[0], B, 4000)
    pf_means = jnp.mean(samples, axis=-1)  # (T, B)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(pf_means[:, b]), np.asarray(kalman[0][:, 0]), atol=2e-1
        )
    # independent resampling noise => trials differ
    assert float(jnp.max(jnp.abs(pf_means[:, 0] - pf_means[:, 1]))) > 1e-4


def test_continuous_resampling_pf():
    def transition_sampler(samples, key):
        return F_MAT[0, 0] * samples + jnp.sqrt(Q_MAT[0, 0]) * jax.random.normal(
            key, samples.shape
        )

    def meas_pdf(y, x):
        return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    def init_sampler(key, n):
        return M0[0] + jnp.sqrt(V0[0, 0]) * jax.random.normal(key, (n,))

    samples, nell = bootstrap_filter(
        transition_sampler,
        meas_pdf,
        YS[:50],
        init_sampler,
        jax.random.PRNGKey(0),
        2000,
        systematic,
        conti_resampling=True,
    )
    assert bool(jnp.isfinite(samples).all()) and bool(jnp.isfinite(nell))


@pytest.mark.parametrize(
    "method,atol_m",
    [
        ("chapman-euler", 2e-3),
        ("chapman-tme-2", 1e-4),
        ("chapman-tme-3", 1e-4),
        ("kolmogorov", 5e-3),
    ],
)
def test_brute_force_filter_vs_kf(kalman, method, atol_m):
    if method == "kolmogorov":
        # Explicit FD Fokker–Planck: respect the diffusion CFL limit
        # ddt <= dx^2 / (2 gamma) -> coarser grid + more substeps.
        xs_grid = jnp.linspace(-5.0, 5.0, 320)
        integration_steps = 24
    else:
        xs_grid = jnp.linspace(-5.0, 5.0, 1200)
        integration_steps = 4
    v0 = V0[0, 0]
    init_ps = jnp.exp(-0.5 * (xs_grid - M0[0]) ** 2 / v0) / jnp.sqrt(2 * jnp.pi * v0)

    def meas_pdf(y, x):
        return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    pss = brute_force_filter(
        lambda x: -x,
        lambda x: Q_DIFF * jnp.ones_like(x),
        meas_pdf,
        init_ps,
        xs_grid,
        YS[:60],
        DT,
        integration_steps=integration_steps,
        pred_method=method,
    )
    dx = xs_grid[1] - xs_grid[0]
    means = jnp.sum(pss * xs_grid, axis=1) * dx
    np.testing.assert_allclose(
        np.asarray(means), np.asarray(kalman[0][:60, 0]), atol=atol_m
    )


def test_gaussian_expectation_trajectory():
    ms = jnp.linspace(-1, 1, 7)[:, None]
    chols = jnp.full((7, 1, 1), 0.5)
    out = gaussian_expectation(ms, chols, lambda v: v[..., 0] ** 2, d=1, order=10)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ms[:, 0] ** 2 + 0.25), rtol=1e-9
    )


def test_unscented_points_integrate_gaussian():
    sgps = SigmaPoints.unscented(2)
    mean = jnp.array([0.5, -0.3])
    cov = jnp.array([[1.0, 0.2], [0.2, 0.7]])
    chi = sgps.gen_sigma_points(mean, jnp.linalg.cholesky(cov))
    got_mean = jnp.einsum("i,ij->j", sgps.w, chi)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(mean), atol=1e-12)
    centred = chi - mean
    got_cov = jnp.einsum("i,ij,ik->jk", sgps.wc, centred, centred)
    np.testing.assert_allclose(np.asarray(got_cov), np.asarray(cov), atol=1e-10)
