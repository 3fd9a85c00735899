"""N-D moment filters: d=1 reduction, product-model factorisation, 2D smoke."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.multi_dims.filtering import (
    moment_filter_nd_cms,
    moment_filter_nd_rms,
    moment_filter_nd_scms,
)
from mfs_tpu.multi_dims.moments import (
    marginalise_moments,
    raw_moments_mvn_kan_all,
    sde_cond_moments_nd_tme,
)
from mfs_tpu.multi_dims.multi_indices import (
    generate_graded_lexico_multi_indices,
    gram_and_hankel_indices_graded_lexico,
)
from mfs_tpu.one_dim.filtering import moment_filter_cms, moment_filter_rms
from mfs_tpu.one_dim.moments import raw_to_central
from mfs_tpu.sde.transitions import sde_cond_moments_tme
from mfs_tpu.utils.gaussian import normal_raw_moments_all

DT = 1e-2
T = 40
ELL, SIGMA, XI = 1.0, 0.5, 1.0
MEAN0, VAR0 = 0.1, 0.1


def _data():
    rng = np.random.RandomState(7)
    return jnp.asarray(0.5 * rng.randn(T) + 0.1)


def _order(N, d):
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    return mis, inds


def test_nd_rms_d1_equals_1d():
    N = 4
    ys = _data()
    drift_1d = lambda x: -x / ELL
    disp_1d = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL)
    trans_1d = sde_cond_moments_tme(drift_1d, disp_1d, DT, 2, N)
    meas_1d = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    rms0 = normal_raw_moments_all(MEAN0, VAR0, 2 * N)
    rmss_1d, nell_1d = moment_filter_rms(trans_1d.rms, meas_1d, rms0, ys)

    mis, inds = _order(N, 1)
    drift_nd = lambda x: -x / ELL
    disp_nd = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL) * jnp.eye(1)
    trans_nd = sde_cond_moments_nd_tme(drift_nd, disp_nd, DT, 2, mis)
    meas_nd = lambda y, x: (
        jnp.exp(-0.5 * (y[..., 0] - x[..., 0]) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    )
    rmss_nd, nell_nd = moment_filter_nd_rms(
        trans_nd.rms, meas_nd, ys[:, None], (mis, inds), rms0
    )
    np.testing.assert_allclose(np.asarray(rmss_nd), np.asarray(rmss_1d), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(nell_nd), float(nell_1d), rtol=1e-9)


def test_nd_cms_product_model_factorises():
    """Two independent identical 1D problems as one 2D problem: marginal
    moments match the 1D filter and nell doubles (reference:
    ``tests/test_filtering.py:244-302``)."""
    N = 3
    ys = _data()
    drift_1d = lambda x: -x / ELL
    disp_1d = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL)
    trans_1d = sde_cond_moments_tme(drift_1d, disp_1d, DT, 2, N)
    meas_1d = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    rms0 = normal_raw_moments_all(MEAN0, VAR0, 2 * N)
    cms0 = raw_to_central(rms0)
    cmss_1d, means_1d, nell_1d = moment_filter_cms(
        trans_1d.cms, trans_1d.mean, meas_1d, cms0, MEAN0, ys
    )

    mis, inds = _order(N, 2)
    drift_nd = lambda x: -x / ELL
    disp_nd = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL) * jnp.eye(2)
    trans_nd = sde_cond_moments_nd_tme(drift_nd, disp_nd, DT, 2, mis)

    def meas_nd(y, x):
        return jnp.prod(
            jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI), axis=-1
        )

    cms0_nd = raw_moments_mvn_kan_all(jnp.zeros(2), VAR0 * jnp.eye(2), mis)
    ys_nd = jnp.stack([ys, ys], axis=-1)
    cmss_nd, means_nd, nell_nd = moment_filter_nd_cms(
        trans_nd.cms,
        trans_nd.mean,
        meas_nd,
        ys_nd,
        (mis, inds),
        cms0_nd,
        MEAN0 * jnp.ones(2),
    )
    # The total-degree 2D basis is not exactly the tensor product of the
    # 1D rules, so factorisation holds to quadrature truncation only.
    np.testing.assert_allclose(float(nell_nd), 2 * float(nell_1d), rtol=1e-5)
    for axis in range(2):
        np.testing.assert_allclose(
            np.asarray(means_nd[:, axis]), np.asarray(means_1d), atol=1e-4
        )
        marg = marginalise_moments(np.asarray(cmss_nd), 2, N, axis)
        np.testing.assert_allclose(marg, np.asarray(cmss_1d), atol=1e-4)


def test_nd_scms_matches_nd_cms():
    """Scaled-central and central ND filters agree."""
    N = 3
    ys = _data()
    mis, inds = _order(N, 2)
    drift_nd = lambda x: -x
    disp_nd = lambda x: 0.7 * jnp.eye(2)
    trans_nd = sde_cond_moments_nd_tme(drift_nd, disp_nd, DT, 2, mis)

    def meas_nd(y, x):
        return jnp.prod(
            jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI), axis=-1
        )

    cms0 = raw_moments_mvn_kan_all(jnp.zeros(2), VAR0 * jnp.eye(2), mis)
    scale0 = jnp.sqrt(VAR0) * jnp.ones(2)
    from mfs_tpu.multi_dims.moments import monomials_nd

    scms0 = cms0 / monomials_nd(scale0, mis)
    ys_nd = jnp.stack([ys, -ys], axis=-1)
    mean0 = MEAN0 * jnp.ones(2)

    cmss, means_c, nell_c = moment_filter_nd_cms(
        trans_nd.cms, trans_nd.mean, meas_nd, ys_nd, (mis, inds), cms0, mean0
    )
    scmss, means_s, scales_s, nell_s = moment_filter_nd_scms(
        trans_nd.scms,
        trans_nd.mean_var,
        meas_nd,
        ys_nd,
        (mis, inds),
        scms0,
        mean0,
        scale0,
    )
    np.testing.assert_allclose(float(nell_s), float(nell_c), atol=1e-8)
    np.testing.assert_allclose(np.asarray(means_s), np.asarray(means_c), atol=1e-8)
    # variances: cms at the doubled-unit indices == scales^2
    var_c = marginalise_moments(np.asarray(cmss), 2, N, 0)[:, 2]
    np.testing.assert_allclose(np.asarray(scales_s[:, 0] ** 2), var_c, rtol=1e-7)


def test_nd_cms_far_from_origin_no_cancellation():
    """Central transition moments at |mean| >> node spread.

    Regression for the binomial-shift formulation (central = T(m) @ raw)
    that catastrophically cancelled in this regime (relative error ~1e2
    at mean ~ 20, spread ~ 0.05); the direct shifted-monomial TME pass
    must track the exact linear-SDE oracle to TME truncation error.
    """
    N = 3
    mis, _ = _order(N, 2)
    # Driftless diffusion: the TME expansion of a degree-(2N-1)
    # polynomial terminates (each generator application lowers the
    # degree by 2), so order 3 is EXACT and the oracle isolates
    # round-off from truncation.
    Bq = jnp.array([[0.1, 0.02], [0.0, 0.08]])
    drift = lambda x: jnp.zeros_like(x)
    disp = lambda x: Bq
    trans = sde_cond_moments_nd_tme(drift, disp, DT, 3, mis)

    mean = jnp.array([20.0, -15.0])
    nodes = mean + 0.05 * jnp.asarray(
        np.random.RandomState(0).randn(4, 2)
    )  # (m, d) cluster far from the origin
    got = trans.cms(nodes, mean)  # (m, z)
    exact = raw_moments_mvn_kan_all(nodes - mean, Bq @ Bq.T * DT, mis)
    scale = jnp.maximum(jnp.abs(exact), 1e-12)
    assert float(jnp.max(jnp.abs(got - exact) / scale)) < 1e-8


def test_nd_cms_nell_gradient_finite_and_correct():
    """d nell / d theta through the full N-D central-moment filter:
    finite (degenerate-eigenvalue JVP guard) and matching central
    finite differences (SURVEY §7 'Differentiating through eigh')."""
    N = 2
    ys = _data()[:6]
    mis, inds = _order(N, 2)
    ys_nd = jnp.stack([ys, -ys], axis=-1)
    cms0 = raw_moments_mvn_kan_all(jnp.zeros(2), VAR0 * jnp.eye(2), mis)
    mean0 = MEAN0 * jnp.ones(2)

    def meas_nd(y, x):
        return jnp.prod(
            jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI), axis=-1
        )

    def nell_of(theta):
        drift = lambda x: -theta * x
        disp = lambda x: 0.7 * jnp.eye(2)
        trans = sde_cond_moments_nd_tme(drift, disp, DT, 2, mis)
        _, _, nell = moment_filter_nd_cms(
            trans.cms, trans.mean, meas_nd, ys_nd, (mis, inds), cms0, mean0
        )
        return nell

    theta0 = 0.8
    g = jax.grad(nell_of)(theta0)
    assert bool(jnp.isfinite(g))
    eps = 1e-4
    fd = (nell_of(theta0 + eps) - nell_of(theta0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-4)


def test_prey_predator_smoke_batched():
    """2D prey–predator short run: finite results, batch == per-trial."""
    from mfs_tpu.models.multi_dims import prey_predator

    N = 2
    mis, inds = _order(N, 2)
    model = prey_predator(mis)
    key = jax.random.PRNGKey(0)
    x0s, xss, yss = model.simulate(key, 2, integration_steps=10)
    ys = yss[:100]  # (T, 2, 1)

    trans = sde_cond_moments_nd_tme(model.drift, model.dispersion, model.dt, 2, mis)
    cms0 = jnp.broadcast_to(model.init_cond.cms, (2,) + model.init_cond.cms.shape)
    mean0 = jnp.broadcast_to(model.init_cond.mean, (2, 2))
    cmss, means, nell = moment_filter_nd_cms(
        trans.cms,
        trans.mean,
        model.measurement_cond_pdf,
        ys,
        (mis, inds),
        cms0,
        mean0,
    )
    assert bool(jnp.isfinite(cmss).all()) and bool(jnp.isfinite(nell).all())
    # per-trial equivalence
    cmss0, means0, nell0 = moment_filter_nd_cms(
        trans.cms,
        trans.mean,
        model.measurement_cond_pdf,
        ys[:, 0],
        (mis, inds),
        model.init_cond.cms,
        model.init_cond.mean,
    )
    np.testing.assert_allclose(np.asarray(cmss[:, 0]), np.asarray(cmss0), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(nell[0]), float(nell0), rtol=1e-8)


def test_nd_cms_product_model_factorises_d3():
    """Three independent identical 1D problems as one 3D problem
    (VERDICT r04 item 3): marginal moments match the 1D filter and
    nell triples.  First end-to-end d=3 filter exercised by the suite
    — the tensor-product quadrature (s^3 nodes) and the d=3 Kan term
    tables both change character beyond d=2."""
    N = 3
    ys = _data()[:20]
    drift_1d = lambda x: -x / ELL
    disp_1d = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL)
    trans_1d = sde_cond_moments_tme(drift_1d, disp_1d, DT, 2, N)
    meas_1d = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    rms0 = normal_raw_moments_all(MEAN0, VAR0, 2 * N)
    cms0 = raw_to_central(rms0)
    cmss_1d, means_1d, nell_1d = moment_filter_cms(
        trans_1d.cms, trans_1d.mean, meas_1d, cms0, MEAN0, ys
    )

    d = 3
    mis, inds = _order(N, d)
    drift_nd = lambda x: -x / ELL
    disp_nd = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL) * jnp.eye(d)
    trans_nd = sde_cond_moments_nd_tme(drift_nd, disp_nd, DT, 2, mis)

    def meas_nd(y, x):
        return jnp.prod(
            jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI), axis=-1
        )

    cms0_nd = raw_moments_mvn_kan_all(jnp.zeros(d), VAR0 * jnp.eye(d), mis)
    ys_nd = jnp.stack([ys, ys, ys], axis=-1)
    cmss_nd, means_nd, nell_nd = moment_filter_nd_cms(
        trans_nd.cms,
        trans_nd.mean,
        meas_nd,
        ys_nd,
        (mis, inds),
        cms0_nd,
        MEAN0 * jnp.ones(d),
    )
    np.testing.assert_allclose(float(nell_nd), 3 * float(nell_1d), rtol=1e-5)
    for axis in range(d):
        np.testing.assert_allclose(
            np.asarray(means_nd[:, axis]), np.asarray(means_1d), atol=1e-4
        )
        marg = marginalise_moments(np.asarray(cmss_nd), d, N, axis)
        np.testing.assert_allclose(marg, np.asarray(cmss_1d), atol=1e-4)


def test_lotka_volterra_3d_smoke_batched():
    """3D food-chain LV short run: finite results, batch == per-trial,
    poly-TME transitions agree with the generic TME factory."""
    from mfs_tpu.models.multi_dims import lotka_volterra_3d
    from mfs_tpu.multi_dims.poly_tme import poly_tme_nd

    N = 2
    mis, inds = _order(N, 3)
    model = lotka_volterra_3d(mis)
    key = jax.random.PRNGKey(0)
    x0s, xss, yss = model.simulate(key, 2, integration_steps=10)
    ys = yss[:60]  # (T, 2, 1)

    trans = sde_cond_moments_nd_tme(model.drift, model.dispersion, model.dt, 2, mis)
    cms0 = jnp.broadcast_to(model.init_cond.cms, (2,) + model.init_cond.cms.shape)
    mean0 = jnp.broadcast_to(model.init_cond.mean, (2, 3))
    cmss, means, nell = moment_filter_nd_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        ys, (mis, inds), cms0, mean0,
    )
    assert bool(jnp.isfinite(cmss).all()) and bool(jnp.isfinite(nell).all())
    # per-trial equivalence
    cmss0, means0, nell0 = moment_filter_nd_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        ys[:, 0], (mis, inds), model.init_cond.cms, model.init_cond.mean,
    )
    np.testing.assert_allclose(
        np.asarray(cmss[:, 0]), np.asarray(cmss0), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(float(nell[0]), float(nell0), rtol=1e-8)
    # closed-form polynomial TME (drift quadratic, dispersion linear)
    # matches the generic jet-based TME factory on the same model
    poly = poly_tme_nd(
        model.drift, model.dispersion, model.dt, 2, mis,
        drift_deg=2, dispersion_deg=1,
    )
    cmss_p, means_p, nell_p = moment_filter_nd_cms(
        poly.cms, poly.mean, model.measurement_cond_pdf,
        ys[:, 0], (mis, inds), model.init_cond.cms, model.init_cond.mean,
        predict_fn=poly.predict_cms,
    )
    np.testing.assert_allclose(float(nell_p), float(nell0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(means_p), np.asarray(means0), atol=1e-6
    )
