"""TME expansion vs exact linear-SDE oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.sde import tme
from mfs_tpu.sde.transitions import (
    sde_cond_moments_euler,
    sde_cond_moments_tme,
    sde_cond_moments_tme_normal,
)
from mfs_tpu.utils.gaussian import discretise_lti_sde, normal_raw_moments_all

LAM, SIGMA, DT = 0.8, 1.3, 0.01


def _ou_exact(x, dt=DT):
    m = x * np.exp(-LAM * dt)
    v = SIGMA**2 / (2 * LAM) * (1 - np.exp(-2 * LAM * dt))
    return m, v


def test_mean_and_var_1d_vs_exact_ou():
    xs = jnp.linspace(-2.0, 2.0, 9)
    m, v = tme.mean_and_var_1d(xs, DT, lambda x: -LAM * x, lambda x: SIGMA, order=3)
    m_true, v_true = _ou_exact(np.asarray(xs))
    np.testing.assert_allclose(np.asarray(m), m_true, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v), v_true, rtol=1e-6)


def test_expectation_1d_polynomial_vs_exact():
    xs = jnp.linspace(-1.5, 1.5, 5)
    got = tme.expectation_1d(
        lambda u: u**3, xs, DT, lambda x: -LAM * x, lambda x: SIGMA, order=3
    )
    m_true, v_true = _ou_exact(np.asarray(xs))
    expected = m_true**3 + 3 * m_true * v_true  # E[X^3] Gaussian
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-7)


def test_mean_and_cov_nd_vs_exact_lti():
    A = jnp.array([[0.0, 1.0], [-2.0, -1.0]])
    B = jnp.array([[0.0], [1.5]])
    F, Q = discretise_lti_sde(A, B, DT)
    x0 = jnp.array([0.3, -0.2])
    m, c = tme.mean_and_cov(x0, DT, lambda x: A @ x, lambda x: B, order=3)
    # Order-3 truncation: residual is O(dt^4).
    np.testing.assert_allclose(np.asarray(m), np.asarray(F @ x0), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(c), np.asarray(Q), atol=1e-7)


def test_factories_match_exact_ou_moments():
    """All three factory flavours agree with exact OU transition moments."""
    xs = jnp.linspace(-2.0, 2.0, 7)
    m_true, v_true = _ou_exact(np.asarray(xs))
    exact_rms = np.asarray(
        normal_raw_moments_all(jnp.asarray(m_true), jnp.asarray(v_true), 8)
    )

    import math

    drift, disp = (lambda x: -LAM * x), (lambda x: SIGMA)
    mean_ref = jnp.asarray(0.1)
    # Binomial shift: E[(X - c)^n] = sum_j C(n, j) (-c)^{n-j} E[X^j].
    shift = np.zeros((8, 8))
    for n in range(8):
        for j in range(n + 1):
            shift[n, j] = math.comb(n, j) * (-float(mean_ref)) ** (n - j)

    for factory, tol in [
        (sde_cond_moments_tme(drift, disp, DT, 3, 4), 2e-5),
        (sde_cond_moments_tme_normal(drift, disp, DT, 3, 4), 2e-5),
        (sde_cond_moments_euler(drift, disp, DT, 4), 0.07),
    ]:
        rms = np.asarray(factory.rms(xs))
        np.testing.assert_allclose(rms, exact_rms, atol=tol)
        # cms must be the exact binomial shift of rms (closure-agnostic
        # identity), scms the exact per-order rescale of cms.
        cms = np.asarray(factory.cms(xs, mean_ref))
        np.testing.assert_allclose(cms, rms @ shift.T, rtol=1e-7, atol=1e-9)
        scms = np.asarray(factory.scms(xs, mean_ref, jnp.asarray(2.0)))
        np.testing.assert_allclose(scms, cms / 2.0 ** np.arange(8), rtol=1e-12)
        m, v = factory.mean_var(xs)
        np.testing.assert_allclose(np.asarray(m), m_true, atol=tol)
        np.testing.assert_allclose(np.asarray(v), v_true, atol=max(tol, 1e-4))


def test_tme_order1_equals_euler_mean_var():
    xs = jnp.linspace(-1.0, 1.0, 5)
    drift, disp = (lambda x: jnp.tanh(x)), (lambda x: jnp.ones_like(x))
    m1, v1 = tme.mean_and_var_1d(xs, DT, drift, disp, order=1)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(xs + jnp.tanh(xs) * DT), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), DT, rtol=1e-12)


def test_expectation_vectorised_matches_scalar_calls():
    """One vector-valued expansion == per-order scalar expansions."""
    drift, disp = (lambda x: jnp.tanh(x)), (lambda x: jnp.ones_like(x))
    x = jnp.asarray(0.47)

    def mono_all(u):
        return jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)

    vec = tme.expectation_1d(mono_all, x, DT, drift, disp, order=3)
    for n in range(4):
        scalar = tme.expectation_1d(
            lambda u, _n=n: u**_n, x, DT, drift, disp, order=3
        )
        np.testing.assert_allclose(float(vec[n]), float(scalar), rtol=1e-12)
