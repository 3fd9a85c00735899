"""1D moment filters vs exact Kalman filter; mode equivalence; batching.

Mirrors the reference's tolerance ladder (reference
``tests/test_filtering.py:82-164``): on the OU / Matérn-1/2 model with
Gaussian measurements, the N = 10 moment filter matches the exact KF to
mean rtol 1e-2, variance rtol 1e-3, nell rtol 1e-5; and the three
moment representations agree to ~10 decimals.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.one_dim.filtering import (
    moment_filter_cms,
    moment_filter_rms,
    moment_filter_scms,
)
from mfs_tpu.one_dim.moments import raw_to_central, raw_to_scaled
from mfs_tpu.sde.transitions import sde_cond_moments_tme
from mfs_tpu.utils.gaussian import normal_raw_moments_all

DT = 1e-2
T = 100
ELL, SIGMA = 1.0, 0.5
XI = 1.0  # measurement noise variance
MEAN0, VAR0 = 0.1, 0.1


def drift(x):
    return -x / ELL


def dispersion(x):
    return math.sqrt(2.0) * SIGMA / math.sqrt(ELL)


def measurement_cond_pdf(y, x):
    return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)


@pytest.fixture(scope="module")
def data():
    """Measurements from a Matérn-1/2 GP plus white noise."""
    rng = np.random.RandomState(666)
    ts = np.linspace(DT, DT * T, T)
    k = SIGMA**2 * np.exp(-np.abs(ts[None, :] - ts[:, None]) / ELL)
    ys = np.linalg.cholesky(k + 1e-12 * np.eye(T)) @ rng.randn(T) + math.sqrt(
        XI
    ) * rng.randn(T)
    return jnp.asarray(ys)


@pytest.fixture(scope="module")
def kalman(data):
    """Exact scalar KF with the exactly discretised OU transition."""
    F = math.exp(-DT / ELL)
    Q = SIGMA**2 * (1 - math.exp(-2 * DT / ELL))

    def step(carry, y):
        mf, vf, nell = carry
        mp, vp = F * mf, F * vf * F + Q
        s = vp + XI
        gain = vp / s
        mf = mp + gain * (y - mp)
        vf = vp - vp * gain
        nell = nell + 0.5 * ((y - mp) ** 2 / s + jnp.log(2 * jnp.pi * s))
        return (mf, vf, nell), (mf, vf, nell)

    _, (mfs, vfs, nells) = jax.lax.scan(step, (MEAN0, VAR0, 0.0), data)
    return mfs, vfs, nells[-1]


def _init_moments(N):
    rms0 = normal_raw_moments_all(MEAN0, VAR0, 2 * N)
    return rms0, raw_to_central(rms0), raw_to_scaled(rms0)


def test_rms_filter_converges_to_kf(data, kalman):
    N = 10
    trans = sde_cond_moments_tme(drift, dispersion, DT, 3, N)
    rms0, _, _ = _init_moments(N)
    rmss, nell = moment_filter_rms(trans.rms, measurement_cond_pdf, rms0, data)
    kf_m, kf_v, kf_nell = kalman
    np.testing.assert_allclose(np.asarray(rmss[:, 1]), np.asarray(kf_m), rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(rmss[:, 2] - rmss[:, 1] ** 2), np.asarray(kf_v), rtol=1e-3
    )
    np.testing.assert_allclose(float(nell), float(kf_nell), rtol=1e-5)


def test_cms_filter_converges_to_kf(data, kalman):
    N = 10
    trans = sde_cond_moments_tme(drift, dispersion, DT, 3, N)
    _, cms0, _ = _init_moments(N)
    cmss, means, nell = moment_filter_cms(
        trans.cms, trans.mean, measurement_cond_pdf, cms0, MEAN0, data
    )
    kf_m, kf_v, kf_nell = kalman
    np.testing.assert_allclose(np.asarray(means), np.asarray(kf_m), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(cmss[:, 2]), np.asarray(kf_v), rtol=1e-3)
    np.testing.assert_allclose(float(nell), float(kf_nell), rtol=1e-5)


def test_scms_filter_converges_to_kf(data, kalman):
    N = 10
    trans = sde_cond_moments_tme(drift, dispersion, DT, 3, N)
    _, _, scms0 = _init_moments(N)
    scmss, means, scales, nell = moment_filter_scms(
        trans.scms,
        trans.mean_var,
        measurement_cond_pdf,
        scms0,
        MEAN0,
        math.sqrt(VAR0),
        data,
    )
    kf_m, kf_v, kf_nell = kalman
    np.testing.assert_allclose(np.asarray(means), np.asarray(kf_m), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(scales**2), np.asarray(kf_v), rtol=1e-3)
    np.testing.assert_allclose(float(nell), float(kf_nell), rtol=1e-5)


def test_mode_equivalence(data):
    """rms / cms / scms are algebraically the same filter (N=4, TME-2)."""
    N = 4
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    rms0, cms0, scms0 = _init_moments(N)
    rmss, nell_r = moment_filter_rms(trans.rms, measurement_cond_pdf, rms0, data)
    cmss, means_c, nell_c = moment_filter_cms(
        trans.cms, trans.mean, measurement_cond_pdf, cms0, MEAN0, data
    )
    scmss, means_s, scales_s, nell_s = moment_filter_scms(
        trans.scms,
        trans.mean_var,
        measurement_cond_pdf,
        scms0,
        MEAN0,
        math.sqrt(VAR0),
        data,
    )
    np.testing.assert_allclose(np.asarray(rmss[:, 1]), np.asarray(means_c), atol=1e-10)
    np.testing.assert_allclose(np.asarray(means_c), np.asarray(means_s), atol=1e-10)
    var_r = rmss[:, 2] - rmss[:, 1] ** 2
    np.testing.assert_allclose(np.asarray(var_r), np.asarray(cmss[:, 2]), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(cmss[:, 2]), np.asarray(scales_s**2), atol=1e-10
    )
    np.testing.assert_allclose(float(nell_r), float(nell_c), atol=1e-9)
    np.testing.assert_allclose(float(nell_c), float(nell_s), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(cmss[:, 3]), np.asarray(scmss[:, 3] * scales_s**3), atol=1e-9
    )


def test_stable_mode_close_to_plain(data):
    N = 4
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    rms0, _, _ = _init_moments(N)
    rmss_a, nell_a = moment_filter_rms(trans.rms, measurement_cond_pdf, rms0, data)
    rmss_b, nell_b = moment_filter_rms(
        trans.rms, measurement_cond_pdf, rms0, data, stable=True
    )
    np.testing.assert_allclose(
        np.asarray(rmss_b[:, 1]), np.asarray(rmss_a[:, 1]), atol=1e-7
    )
    np.testing.assert_allclose(float(nell_b), float(nell_a), atol=1e-6)


def test_batched_filter_matches_per_trial(data):
    """A batch of trials in one scan == independent per-trial runs."""
    N = 6
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    rms0, _, _ = _init_moments(N)
    key = jax.random.PRNGKey(7)
    ys_b = jnp.stack([data, data + 0.1 * jax.random.normal(key, data.shape)], axis=1)
    rms0_b = jnp.stack([rms0, rms0])
    rmss_b, nell_b = moment_filter_rms(trans.rms, measurement_cond_pdf, rms0_b, ys_b)
    assert rmss_b.shape == (T, 2, 2 * N)
    for i in range(2):
        rmss_i, nell_i = moment_filter_rms(
            trans.rms, measurement_cond_pdf, rms0, ys_b[:, i]
        )
        np.testing.assert_allclose(
            np.asarray(rmss_b[:, i]), np.asarray(rmss_i), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(float(nell_b[i]), float(nell_i), rtol=1e-9)


def test_nell_gradient_flows(data):
    """d nell / d(model parameter) matches finite differences."""

    def nell_of_ell(ell):
        trans = sde_cond_moments_tme(
            lambda x: -x / ell, dispersion, DT, 2, 4
        )
        rms0, _, _ = _init_moments(4)
        _, nell = moment_filter_rms(
            trans.rms, measurement_cond_pdf, rms0, data[:30]
        )
        return nell

    g = jax.grad(nell_of_ell)(1.0)
    eps = 1e-5
    fd = (nell_of_ell(1.0 + eps) - nell_of_ell(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_xla_eigh_filter_path(data):
    N = 4
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    rms0, _, _ = _init_moments(N)
    rmss_j, nell_j = moment_filter_rms(trans.rms, measurement_cond_pdf, rms0, data)
    rmss_x, nell_x = moment_filter_rms(
        trans.rms, measurement_cond_pdf, rms0, data, eigh_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(rmss_x[:, 1]), np.asarray(rmss_j[:, 1]), atol=1e-8
    )
    np.testing.assert_allclose(float(nell_x), float(nell_j), atol=1e-7)


def test_taylor_filter_tracks_roughly(data):
    """The quadrature-free Taylor filter (disabled in the reference) is
    biased but must stay finite and loosely track the cms filter on a
    gentle model."""
    N = 3
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    _, cms0, _ = _init_moments(N)
    from mfs_tpu.one_dim.filtering import moment_filter_taylor

    # Low expansion order: the Taylor rule is most stable at order ~2
    # (high-order likelihood derivatives at the mean overweight tails).
    cmss_t, means_t, nell_t = moment_filter_taylor(
        trans.cms, trans.mean, measurement_cond_pdf, cms0, MEAN0, data[:40],
        taylor_order=2,
    )
    cmss_c, means_c, nell_c = moment_filter_cms(
        trans.cms, trans.mean, measurement_cond_pdf, cms0, MEAN0, data[:40]
    )
    assert bool(jnp.isfinite(cmss_t).all())
    assert float(jnp.abs(means_t - means_c).max()) < 0.3


def test_taylor_filter_batches(data):
    """Batched Taylor filter == stacked single-trial runs (the tower is
    nested unit-tangent JVPs, so it must vectorise exactly)."""
    N = 3
    trans = sde_cond_moments_tme(drift, dispersion, DT, 2, N)
    _, cms0, _ = _init_moments(N)
    from mfs_tpu.one_dim.filtering import moment_filter_taylor

    ys = jnp.stack([data[:30], data[10:40], -data[:30]], axis=1)  # (T, 3)
    cms0_b = jnp.broadcast_to(cms0, (3, 2 * N))
    cmss_b, means_b, nell_b = moment_filter_taylor(
        trans.cms, trans.mean, measurement_cond_pdf, cms0_b, MEAN0, ys,
        taylor_order=2,
    )
    assert cmss_b.shape == (30, 3, 2 * N)
    for i in range(3):
        cmss_i, means_i, nell_i = moment_filter_taylor(
            trans.cms, trans.mean, measurement_cond_pdf, cms0, MEAN0,
            ys[:, i], taylor_order=2,
        )
        np.testing.assert_allclose(
            np.asarray(means_b[:, i]), np.asarray(means_i), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(cmss_b[:, i]), np.asarray(cmss_i), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(float(nell_b[i]), float(nell_i), rtol=1e-12)
