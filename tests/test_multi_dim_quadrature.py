"""N-D moment quadrature: moment reproduction, d=1 reduction, oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.filters.sigma_points import SigmaPoints
from mfs_tpu.multi_dims.moments import (
    monomials_nd,
    moments_nd_uniform,
    raw_moments_mvn_kan_all,
)
from mfs_tpu.multi_dims.multi_indices import (
    generate_graded_lexico_multi_indices,
    gram_and_hankel_indices_graded_lexico,
)
from mfs_tpu.multi_dims.quadrature import moment_quadrature_nd
from mfs_tpu.one_dim.quadrature import moment_quadrature
from mfs_tpu.utils.gaussian import normal_raw_moments_all

MEAN = jnp.array([0.3, -0.6])
COV = jnp.array([[1.2, 0.4], [0.4, 0.9]])


def _gaussian_setup(N, d=2, mean=MEAN, cov=COV):
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    ms = raw_moments_mvn_kan_all(mean, cov, mis)
    return mis, inds, ms


@pytest.mark.parametrize("N", [2, 3, 4])
def test_moment_reproduction(N):
    """The rule integrates every moment it was built from, exactly."""
    mis, inds, ms = _gaussian_setup(N)
    w, x = moment_quadrature_nd(ms, inds)
    got = jnp.einsum("m,mz->z", w, monomials_nd(x, mis))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ms), rtol=1e-9, atol=1e-9)


def test_weights_sum_to_one():
    _, inds, ms = _gaussian_setup(3)
    w, _ = moment_quadrature_nd(ms, inds)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-10)


def test_d1_reduces_to_1d_quadrature():
    N = 5
    rms = normal_raw_moments_all(0.7, 2.3, 2 * N)
    inds = gram_and_hankel_indices_graded_lexico(N, 1)
    w_nd, x_nd = moment_quadrature_nd(rms, inds, sort_nodes=True)
    w_1d, x_1d = moment_quadrature(rms, sort_nodes=True)
    np.testing.assert_allclose(np.asarray(w_nd), np.asarray(w_1d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_nd[:, 0]), np.asarray(x_1d), atol=1e-12)


def test_mode_invariance_nd():
    """raw / central / scaled give the same rule for even-N bases."""
    N = 3
    mis, inds, rms = _gaussian_setup(N)
    cms = raw_moments_mvn_kan_all(jnp.zeros(2), COV, mis)
    scale = jnp.sqrt(jnp.diagonal(COV))
    scms = cms / monomials_nd(scale, mis)
    w1, x1 = moment_quadrature_nd(rms, inds)
    w2, x2 = moment_quadrature_nd(cms, inds, mean=MEAN)
    w3, x3 = moment_quadrature_nd(scms, inds, mean=MEAN, scale=scale)
    # Same integral of smooth monomials (node orderings may differ).
    for mi_test in [(1, 0), (0, 1), (2, 1), (3, 2)]:
        vals = [
            float(jnp.einsum("m,m->", w, monomials_nd(x, np.array([mi_test]))[:, 0]))
            for w, x in [(w1, x1), (w2, x2), (w3, x3)]
        ]
        np.testing.assert_allclose(vals[1], vals[0], rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(vals[2], vals[0], rtol=1e-7, atol=1e-9)


def test_uniform_cube_moments():
    N, d = 3, 2
    bounds = [(-1.0, 2.0), (0.0, 1.0)]
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    ms = jnp.array([moments_nd_uniform(bounds, mi) for mi in mis])
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    w, x = moment_quadrature_nd(ms, inds)
    got = jnp.einsum("m,mz->z", w, monomials_nd(x, mis))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ms), rtol=1e-8, atol=1e-10)


def test_vs_closed_form_gaussian_expectations():
    """Moment rule and tensor-GH both approximate closed-form Gaussian
    expectations of non-polynomials (they are *different* rules, so each
    is checked against the truth, not against the other)."""
    N = 4
    mis, inds, ms = _gaussian_setup(N)
    w, x = moment_quadrature_nd(ms, inds)
    sgps = SigmaPoints.gauss_hermite(d=2, order=7)
    chol = jnp.linalg.cholesky(COV)
    chi = sgps.gen_sigma_points(MEAN, chol)

    m0, v0 = float(MEAN[0]), float(COV[0, 0])
    # E[sin(X0) X1] = sin-moment chain through E[X1 | X0].
    rho = float(COV[0, 1] / COV[0, 0])
    e_sin = np.sin(m0) * np.exp(-v0 / 2)
    e_xsin = (m0 * np.sin(m0) + v0 * np.cos(m0)) * np.exp(-v0 / 2)
    truth_sin = float(MEAN[1]) * e_sin + rho * (e_xsin - m0 * e_sin)
    # E[exp(0.3 X0)] lognormal mean.
    truth_exp = np.exp(0.3 * m0 + 0.09 * v0 / 2)

    for fn, truth, tol in [
        (lambda u: jnp.sin(u[..., 0]) * u[..., 1], truth_sin, 3e-2),
        (lambda u: jnp.exp(0.3 * u[..., 0]), truth_exp, 1e-3),
    ]:
        got_moment = float(jnp.einsum("m,m->", w, fn(x)))
        got_gh = float(jnp.einsum("m,m->", sgps.w, fn(chi)))
        np.testing.assert_allclose(got_moment, truth, atol=tol)
        np.testing.assert_allclose(got_gh, truth, atol=tol)


def test_batched_nd_quadrature():
    N = 3
    mis, inds, _ = _gaussian_setup(N)
    means = jnp.stack([MEAN, -0.5 * MEAN])
    covs = jnp.stack([COV, 0.5 * COV])
    ms_b = raw_moments_mvn_kan_all(means, covs, mis)
    wb, xb = moment_quadrature_nd(ms_b, inds)
    for b in range(2):
        w, x = moment_quadrature_nd(ms_b[b], inds)
        np.testing.assert_allclose(np.asarray(wb[b]), np.asarray(w), atol=1e-12)
        np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(x), atol=1e-12)


def test_stable_mode_nd():
    N = 3
    mis, inds, ms = _gaussian_setup(N)
    w1, x1 = moment_quadrature_nd(ms, inds)
    w2, x2 = moment_quadrature_nd(ms, inds, stable=True)
    got1 = jnp.einsum("m,mz->z", w1, monomials_nd(x1, mis))
    got2 = jnp.einsum("m,mz->z", w2, monomials_nd(x2, mis))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got1), rtol=1e-7, atol=1e-8)
