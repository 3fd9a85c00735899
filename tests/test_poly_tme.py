"""Polynomial-TME (matmul tower) vs the autodiff TME factory.

The two implement the same expansion (Taylor moment expansion of
monomials through the SDE generator), one by closed-form operator
algebra, one by nested JVPs — agreement to near machine precision on a
polynomial model is the correctness bar.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.multi_dims import (
    generate_graded_lexico_multi_indices,
    sde_cond_moments_nd_tme,
)
from mfs_tpu.multi_dims.poly_tme import poly_tme_nd, poly_coefficients
from mfs_tpu.models import prey_predator


@pytest.fixture(scope="module")
def setup():
    N = 3
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    model = prey_predator(mis)
    dt = 1e-3
    order = 2
    auto = sde_cond_moments_nd_tme(model.drift, model.dispersion, dt, order, mis)
    poly = poly_tme_nd(model.drift, model.dispersion, dt, order, mis,
                       drift_deg=2, dispersion_deg=1)
    key = jax.random.PRNGKey(0)
    nodes = 1.0 + 0.3 * jax.random.normal(key, (4, 9, 2))  # (B, n, d)
    return auto, poly, nodes, mis


def test_poly_coefficients_exact():
    def f(x):
        return jnp.array([1.5 + 2.0 * x[0] - x[1] ** 2 + 3.0 * x[0] * x[1],
                          x[0] ** 2]).reshape(-1)

    coefs, mis = poly_coefficients(f, 2, 2)
    # graded-lex for d=2, deg<=2: (0,0),(0,1),(1,0),(0,2),(1,1),(2,0)
    np.testing.assert_allclose(coefs[0], [1.5, -0.0, 2.0, -1.0, 3.0, 0.0],
                               atol=1e-12)
    np.testing.assert_allclose(coefs[1], [0, 0, 0, 0, 0, 1.0], atol=1e-12)


def test_rms_matches_autodiff(setup):
    auto, poly, nodes, _ = setup
    a = auto.rms(nodes)
    p = poly.rms(nodes)
    np.testing.assert_allclose(p, a, rtol=1e-9, atol=1e-11)


def test_cms_matches_autodiff(setup):
    auto, poly, nodes, _ = setup
    mean = jnp.array([[1.0, 1.2]] * 4)
    a = auto.cms(nodes, mean)
    p = poly.cms(nodes, mean)
    np.testing.assert_allclose(p, a, rtol=1e-9, atol=1e-11)


def test_scms_matches_autodiff(setup):
    auto, poly, nodes, _ = setup
    mean = jnp.array([[1.0, 1.2]] * 4)
    scale = jnp.array([[0.4, 0.7]] * 4)
    a = auto.scms(nodes, mean, scale)
    p = poly.scms(nodes, mean, scale)
    np.testing.assert_allclose(p, a, rtol=1e-9, atol=1e-11)


def test_mean_var_matches_autodiff(setup):
    auto, poly, nodes, _ = setup
    am = auto.mean(nodes)
    pm = poly.mean(nodes)
    np.testing.assert_allclose(pm, am, rtol=1e-10, atol=1e-12)
    amv, avv = auto.mean_var(nodes)
    pmv, pvv = poly.mean_var(nodes)
    np.testing.assert_allclose(pmv, amv, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(pvv, avv, rtol=1e-8, atol=1e-12)


def test_predict_cms_fused_matches_manual(setup):
    auto, poly, nodes, mis = setup
    B, n, d = nodes.shape
    key = jax.random.PRNGKey(1)
    w = jax.random.uniform(key, (B, n)) + 0.1
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    mean_old = jnp.array([[1.0, 1.1]] * B)

    pred_mean, pred_cms = poly.predict_cms(w, nodes, mean_old)

    # manual: the filter's two-einsum predict with the autodiff factory
    man_mean = jnp.einsum("bnd,bn->bd", auto.mean(nodes), w)
    man_cms = jnp.einsum("bnz,bn->bz", auto.cms(nodes, man_mean), w)
    np.testing.assert_allclose(pred_mean, man_mean, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(pred_cms, man_cms, rtol=1e-8, atol=1e-11)


def test_predict_scms_fused_matches_manual(setup):
    auto, poly, nodes, mis = setup
    B, n, d = nodes.shape
    key = jax.random.PRNGKey(2)
    w = jax.random.uniform(key, (B, n)) + 0.1
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    mean_old = jnp.array([[1.0, 1.1]] * B)
    scale_old = jnp.array([[0.4, 0.7]] * B)

    pm, ps, pscms = poly.predict_scms(w, nodes, mean_old, scale_old)

    # manual: the filter's law-of-total-variance predict with the
    # autodiff factory
    cond_means, cond_vars = auto.mean_var(nodes)
    man_mean = jnp.einsum("bnd,bn->bd", cond_means, w)
    second = jnp.einsum("bnd,bn->bd", cond_vars + cond_means**2, w)
    man_scale = jnp.sqrt(second - man_mean**2)
    man_scms = jnp.einsum(
        "bnz,bn->bz", auto.scms(nodes, man_mean, man_scale), w
    )
    np.testing.assert_allclose(pm, man_mean, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ps, man_scale, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(pscms, man_scms, rtol=1e-8, atol=1e-11)


def test_scms_filter_fused_predict_matches_autodiff(setup):
    """End-to-end: moment_filter_nd_scms with the fused poly predict vs
    the per-node autodiff factory."""
    from mfs_tpu.multi_dims import (
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_scms,
    )

    auto, poly, _, mis = setup
    N = 3
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    model = prey_predator(mis)
    B, T = 2, 10
    _, xss, yss = model.simulate(jax.random.PRNGKey(4), B)
    ys = yss[:T]
    from mfs_tpu.multi_dims.moments import monomials_nd

    ic = model.init_cond
    scale0_1 = jnp.sqrt(jnp.diagonal(ic.cov))
    scms0_1 = ic.cms / monomials_nd(scale0_1, mis)
    scms0 = jnp.broadcast_to(scms0_1, (B,) + scms0_1.shape)
    mean0 = jnp.broadcast_to(ic.mean, (B, 2))
    scale0 = jnp.broadcast_to(scale0_1, (B, 2))

    ref_out = moment_filter_nd_scms(
        auto.scms, auto.mean_var, model.measurement_cond_pdf, ys,
        (mis, inds), scms0, mean0, scale0,
    )
    poly_out = moment_filter_nd_scms(
        auto.scms, auto.mean_var, model.measurement_cond_pdf, ys,
        (mis, inds), scms0, mean0, scale0, predict_fn=poly.predict_scms,
    )
    np.testing.assert_allclose(poly_out[3], ref_out[3], rtol=1e-9)  # nell
    np.testing.assert_allclose(poly_out[1], ref_out[1], rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(poly_out[2], ref_out[2], rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(poly_out[0], ref_out[0], rtol=1e-6, atol=1e-9)


def test_filter_fused_predict_matches_autodiff(setup):
    """End-to-end: moment_filter_nd_cms with the fused poly predict vs
    the per-node autodiff factory — nell agreement well under 1e-7."""
    from mfs_tpu.multi_dims import (
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_cms,
    )

    auto, poly, _, mis = setup
    N = 3
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    model = prey_predator(mis)
    B, T = 2, 10
    _, xss, yss = model.simulate(jax.random.PRNGKey(3), B)
    ys = yss[:T]
    ic = model.init_cond
    cms0 = jnp.broadcast_to(ic.cms, (B,) + ic.cms.shape)
    mean0 = jnp.broadcast_to(ic.mean, (B, 2))

    ref_out = moment_filter_nd_cms(
        auto.cms, auto.mean, model.measurement_cond_pdf, ys,
        (mis, inds), cms0, mean0,
    )
    poly_out = moment_filter_nd_cms(
        auto.cms, auto.mean, model.measurement_cond_pdf, ys,
        (mis, inds), cms0, mean0, predict_fn=poly.predict_cms,
    )
    np.testing.assert_allclose(poly_out[2], ref_out[2], rtol=1e-9)  # nell
    np.testing.assert_allclose(poly_out[1], ref_out[1], rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(poly_out[0], ref_out[0], rtol=1e-6, atol=1e-9)


def test_rejects_non_polynomial():
    mis = generate_graded_lexico_multi_indices(2, 3)
    with pytest.raises(ValueError):
        poly_tme_nd(lambda x: jnp.tanh(x), lambda x: jnp.diag(x), 1e-2, 2,
                    mis, drift_deg=2, dispersion_deg=1)
