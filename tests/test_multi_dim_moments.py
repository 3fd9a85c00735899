"""Kan–Magnus moments vs MGF-differentiation, Monte-Carlo, and 1D formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.multi_dims.moments import (
    central_moments_mvn_kan,
    extract_cov,
    extract_mean,
    marginalise_moments,
    moments_nd_uniform,
    monomials_nd,
    raw_moments_mvn_kan,
    raw_moments_mvn_kan_all,
    raw_moments_mvn_mgf,
    sde_cond_moments_nd_euler_maruyama,
    sde_cond_moments_nd_tme,
    sde_cond_moments_nd_tme_normal,
)
from mfs_tpu.multi_dims.multi_indices import (
    generate_graded_lexico_multi_indices,
)
from mfs_tpu.utils.gaussian import discretise_lti_sde, normal_raw_moments_all

MEAN = jnp.array([0.3, -0.6])
COV = jnp.array([[1.2, 0.4], [0.4, 0.9]])


def test_kan_vs_mgf():
    mis = generate_graded_lexico_multi_indices(2, 4)
    got = raw_moments_mvn_kan_all(MEAN, COV, mis)
    for z, mi in enumerate(mis):
        oracle = raw_moments_mvn_mgf(MEAN, COV, mi)
        np.testing.assert_allclose(float(got[z]), float(oracle), rtol=1e-9, atol=1e-12)


def test_kan_vs_1d_formulas():
    """d=1 Kan equals the Normal moment recurrence."""
    mis = np.arange(8).reshape(-1, 1)
    got = raw_moments_mvn_kan_all(MEAN[:1], COV[:1, :1], mis)
    expected = normal_raw_moments_all(MEAN[0], COV[0, 0], 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-10)


def test_kan_vs_monte_carlo():
    key = jax.random.PRNGKey(0)
    chol = jnp.linalg.cholesky(COV)
    xs = MEAN + jax.random.normal(key, (400_000, 2)) @ chol.T
    mis = generate_graded_lexico_multi_indices(2, 3)
    got = np.asarray(raw_moments_mvn_kan_all(MEAN, COV, mis))
    mc = np.asarray(jnp.mean(monomials_nd(xs, mis), axis=0))
    np.testing.assert_allclose(got, mc, atol=2e-2)


def test_central_kan_odd_zero_even_positive():
    assert float(central_moments_mvn_kan(COV, [1, 2])) == 0.0
    v = float(central_moments_mvn_kan(COV, [2, 0]))
    np.testing.assert_allclose(v, float(COV[0, 0]), rtol=1e-12)
    v22 = float(central_moments_mvn_kan(COV, [2, 2]))
    expected = COV[0, 0] * COV[1, 1] + 2 * COV[0, 1] ** 2
    np.testing.assert_allclose(v22, float(expected), rtol=1e-10)


def test_kan_batched():
    mis = generate_graded_lexico_multi_indices(2, 3)
    means = jnp.stack([MEAN, -MEAN])
    covs = jnp.stack([COV, 2 * COV])
    got = raw_moments_mvn_kan_all(means, covs, mis)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(got[b]),
            np.asarray(raw_moments_mvn_kan_all(means[b], covs[b], mis)),
            rtol=1e-12,
        )


def test_gram_matrix_pd():
    """Gram matrices of a Gaussian moment vector are symmetric PD."""
    from mfs_tpu.multi_dims.multi_indices import (
        gram_and_hankel_indices_graded_lexico,
    )

    N, d = 3, 2
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    ms = raw_moments_mvn_kan_all(MEAN, COV, mis)
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    G = np.asarray(ms)[inds[0]]
    np.testing.assert_allclose(G, G.T, rtol=1e-12)
    assert np.linalg.eigvalsh(G).min() > 0


def test_extract_and_marginalise():
    N, d = 3, 2
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    ms = raw_moments_mvn_kan_all(MEAN, COV, mis)
    np.testing.assert_allclose(np.asarray(extract_mean(ms, d)), np.asarray(MEAN), rtol=1e-12)
    second = extract_cov(ms, d)
    np.testing.assert_allclose(
        np.asarray(second), np.asarray(COV + jnp.outer(MEAN, MEAN)), rtol=1e-10
    )
    marg = marginalise_moments(ms, d, N, 0)
    expected = normal_raw_moments_all(MEAN[0], COV[0, 0], 2 * N)
    np.testing.assert_allclose(np.asarray(marg), np.asarray(expected), rtol=1e-10)


def test_uniform_moments():
    got = moments_nd_uniform([(-1.0, 2.0), (0.0, 1.0)], [2, 1])
    expected = ((2.0**3) - (-1.0) ** 3) / (3 * 3.0) * 0.5
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@pytest.mark.parametrize("factory_name", ["em", "tme_normal", "tme"])
def test_nd_transition_factories_vs_exact_lti(factory_name):
    """All ND factories reproduce exact LTI transition moments."""
    dt = 1e-2
    A = jnp.array([[-1.0, 0.2], [0.0, -0.5]])
    B = jnp.array([[0.8, 0.0], [0.1, 0.6]])
    F, Q = discretise_lti_sde(A, B, dt)
    mis = generate_graded_lexico_multi_indices(2, 5)

    drift = lambda x: A @ x if x.ndim == 1 else x @ A.T
    disp = lambda x: B
    if factory_name == "em":
        fac = sde_cond_moments_nd_euler_maruyama(drift, disp, dt, mis)
        tol = 0.05
    elif factory_name == "tme_normal":
        fac = sde_cond_moments_nd_tme_normal(drift, disp, dt, 3, mis)
        tol = 1e-5
    else:
        fac = sde_cond_moments_nd_tme(drift, disp, dt, 3, mis)
        tol = 1e-5

    nodes = jnp.array([[0.4, -0.2], [-1.0, 0.7], [0.0, 0.0]])
    got = np.asarray(fac.rms(nodes))
    for i, x in enumerate(np.asarray(nodes)):
        exact = raw_moments_mvn_kan_all(F @ x, Q, mis)
        np.testing.assert_allclose(got[i], np.asarray(exact), atol=tol, rtol=tol)

    # Central/scaled identities (closure-agnostic).
    mean_ref = jnp.array([0.1, -0.1])
    cms = np.asarray(fac.cms(nodes, mean_ref))
    scale_ref = jnp.array([2.0, 0.5])
    scms = np.asarray(fac.scms(nodes, mean_ref, scale_ref))
    denom = np.asarray(monomials_nd(scale_ref, mis))
    np.testing.assert_allclose(scms, cms / denom, rtol=1e-9, atol=1e-12)

    m, v = fac.mean_var(nodes)
    for i, x in enumerate(np.asarray(nodes)):
        np.testing.assert_allclose(np.asarray(m[i]), np.asarray(F @ x), atol=tol)
        np.testing.assert_allclose(np.asarray(v[i]), np.diag(np.asarray(Q)), atol=tol, rtol=tol)
