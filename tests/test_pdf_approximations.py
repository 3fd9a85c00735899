"""Density recovery from moments, with assertions the reference skipped."""
import math

import jax.numpy as jnp
import numpy as np
import scipy.stats

from mfs_tpu.one_dim.moments import (
    raw_to_central,
    raw_to_scaled,
    sms_to_cumulants,
    characteristic_fn,
)
from mfs_tpu.one_dim.pdf_approximations import (
    edgeworth,
    gram_charlier,
    inverse_fourier,
    legendre_poly_expansion,
    saddle_point,
    truncated_cumulant_generating_function,
)
from mfs_tpu.utils.gaussian import GaussianSum1D, normal_raw_moments_all

MEAN, VAR = 0.25, 1.4


def test_truncated_cgf_matches_normal_cgf():
    rms = normal_raw_moments_all(MEAN, VAR, 16)
    for z in [-0.4, 0.0, 0.3, 0.7]:
        got = float(truncated_cumulant_generating_function(z, rms))
        expected = z * MEAN + 0.5 * VAR * z**2
        np.testing.assert_allclose(got, expected, atol=5e-4)


def test_gram_charlier_reproduces_normal():
    rms = normal_raw_moments_all(MEAN, VAR, 12)
    scms = raw_to_scaled(rms)
    ks = sms_to_cumulants(scms, MEAN, jnp.sqrt(VAR))
    pdf = gram_charlier(ks)
    xs = jnp.linspace(-4, 4, 101)
    expected = scipy.stats.norm.pdf(np.asarray(xs), MEAN, math.sqrt(VAR))
    np.testing.assert_allclose(np.asarray(pdf(xs)), expected, rtol=1e-9, atol=1e-12)


def test_gram_charlier_bimodal():
    """On a bimodal Gaussian sum the series approximates the true pdf."""
    gs = GaussianSum1D.new(
        means=jnp.array([-1.0, 1.0]),
        variances=jnp.array([0.4, 0.4]),
        weights=jnp.array([0.5, 0.5]),
        N=5,
    )
    ks = sms_to_cumulants(gs.scms, gs.mean, jnp.sqrt(gs.variance))
    pdf = gram_charlier(ks)
    xs = jnp.linspace(-3.5, 3.5, 201)
    got = np.asarray(pdf(xs))
    truth = np.asarray(gs.pdf(xs))
    assert np.abs(got - truth).max() < 0.06
    # mass approximately 1
    np.testing.assert_allclose(np.trapezoid(got, np.asarray(xs)), 1.0, atol=1e-2)


def test_edgeworth_normal_exact_and_skew_correction():
    # On an exact Normal every correction vanishes.
    rms = normal_raw_moments_all(MEAN, VAR, 10)
    ks = sms_to_cumulants(raw_to_scaled(rms), MEAN, jnp.sqrt(VAR))
    pdf = edgeworth(ks, order=2)
    xs = jnp.linspace(-3, 3, 61)
    expected = scipy.stats.norm.pdf(np.asarray(xs), MEAN, math.sqrt(VAR))
    np.testing.assert_allclose(np.asarray(pdf(xs)), expected, rtol=1e-7, atol=1e-9)

    # On a Gamma the order-2 Edgeworth beats the plain Normal.
    k_shape, theta = 9.0, 0.5
    mean = k_shape * theta
    var = k_shape * theta**2
    cums = jnp.asarray(
        [mean, var] + [math.factorial(n - 1) * k_shape * theta**n for n in range(3, 7)]
    )
    pdf = edgeworth(cums, order=2)
    xs = jnp.linspace(1.0, 9.0, 161)
    truth = scipy.stats.gamma.pdf(np.asarray(xs), k_shape, scale=theta)
    base = scipy.stats.norm.pdf(np.asarray(xs), mean, math.sqrt(var))
    err_edge = np.abs(np.asarray(pdf(xs)) - truth).max()
    err_base = np.abs(base - truth).max()
    assert err_edge < 0.4 * err_base


def test_legendre_expansion_uniform_and_poly_density():
    # Uniform on [-1, 1]: constant density 1/2.
    rms = jnp.asarray([1.0 / (p + 1) if p % 2 == 0 else 0.0 for p in range(10)])
    pdf = legendre_poly_expansion(rms, -1.0, 1.0)
    xs = jnp.linspace(-0.95, 0.95, 41)
    np.testing.assert_allclose(np.asarray(pdf(xs)), 0.5, rtol=1e-8)

    # Quadratic density p(x) = 3/2 x^2 on [-1, 1].
    rms2 = jnp.asarray(
        [3.0 / (2 * (p + 3)) * (1 - (-1) ** (p + 3)) for p in range(10)]
    )
    pdf2 = legendre_poly_expansion(rms2, -1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(pdf2(xs)), 1.5 * np.asarray(xs) ** 2, atol=1e-8
    )


def test_saddle_point_approximates_normal():
    rms = normal_raw_moments_all(MEAN, VAR, 12)
    scms = raw_to_scaled(rms)
    pdf = saddle_point(scms, MEAN, jnp.sqrt(VAR))
    xs = jnp.linspace(-1.5, 2.0, 29)
    expected = scipy.stats.norm.pdf(np.asarray(xs), MEAN, math.sqrt(VAR))
    np.testing.assert_allclose(np.asarray(pdf(xs)), expected, rtol=2e-2, atol=1e-3)


def test_inverse_fourier_roundtrip():
    # Exact Gaussian characteristic function over a wide z window.
    zs = jnp.linspace(-10, 10, 2001)
    cfs = jnp.exp(1j * zs * MEAN - VAR * zs**2 / 2)
    xs = jnp.linspace(-2, 2, 21)
    got = inverse_fourier(xs, cfs, zs)
    expected = scipy.stats.norm.pdf(np.asarray(xs), MEAN, math.sqrt(VAR))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)

    # Moment-based CF is only trustworthy on a narrow z window
    # (reference protocol: z in [-2, 2]): check consistency there.
    rms = normal_raw_moments_all(MEAN, VAR, 20)
    zs_n = jnp.linspace(-2, 2, 201)
    cf_moment = characteristic_fn(zs_n, rms)
    cf_exact = jnp.exp(1j * zs_n * MEAN - VAR * zs_n**2 / 2)
    np.testing.assert_allclose(np.asarray(cf_moment), np.asarray(cf_exact), atol=5e-4)
