"""Moment conversions, cumulants, characteristic functions."""
import jax.numpy as jnp
import numpy as np

from mfs_tpu.one_dim.moments import (
    central_to_raw,
    characteristic_fn,
    characteristic_from_pdf,
    raw_to_central,
    raw_to_scaled,
    scaled_to_central,
    sms_to_cumulants,
)
from mfs_tpu.utils.gaussian import normal_raw_moments_all

MEAN, VAR = -0.4, 1.9


def test_raw_central_roundtrip():
    rms = normal_raw_moments_all(MEAN, VAR, 10)
    cms = raw_to_central(rms)
    # Gaussian central moments: 0, 0, v, 0, 3v^2, 0, 15v^3, ...
    np.testing.assert_allclose(float(cms[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(float(cms[1]), 0.0, atol=1e-10)
    np.testing.assert_allclose(float(cms[2]), VAR, rtol=1e-10)
    np.testing.assert_allclose(float(cms[4]), 3 * VAR**2, rtol=1e-9)
    np.testing.assert_allclose(float(cms[6]), 15 * VAR**3, rtol=1e-9)
    back = central_to_raw(cms, rms[1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(rms), rtol=1e-9)


def test_scaled_central_roundtrip():
    rms = normal_raw_moments_all(MEAN, VAR, 8)
    scms = raw_to_scaled(rms)
    np.testing.assert_allclose(float(scms[2]), 1.0, rtol=1e-12)
    cms = scaled_to_central(scms, jnp.sqrt(VAR))
    np.testing.assert_allclose(np.asarray(cms), np.asarray(raw_to_central(rms)), rtol=1e-9)


def test_conversions_batched():
    rms = normal_raw_moments_all(jnp.array([0.1, -0.7]), jnp.array([1.0, 0.5]), 8)
    cms = raw_to_central(rms)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(cms[i]), np.asarray(raw_to_central(rms[i])), rtol=1e-10
        )


def test_cumulants_of_normal():
    """Normal cumulants: k1 = mean, k2 = var, k_{>=3} = 0."""
    rms = normal_raw_moments_all(MEAN, VAR, 10)
    scms = raw_to_scaled(rms)
    ks = sms_to_cumulants(scms, MEAN, jnp.sqrt(VAR))
    np.testing.assert_allclose(float(ks[0]), MEAN, rtol=1e-10)
    np.testing.assert_allclose(float(ks[1]), VAR, rtol=1e-8)
    assert np.abs(np.asarray(ks[2:])).max() < 1e-6


def test_cumulants_of_exponential():
    """Exponential(1): raw moments n!, cumulants k_n = (n-1)!."""
    import math

    rms = jnp.array([math.factorial(n) * 1.0 for n in range(8)])
    mean = rms[1]
    cms = raw_to_central(rms)
    scale = jnp.sqrt(cms[2])
    scms = cms / scale ** jnp.arange(8)
    ks = sms_to_cumulants(scms, mean, scale)
    expected = [math.factorial(n - 1) for n in range(1, 8)]
    np.testing.assert_allclose(np.asarray(ks), expected, rtol=1e-6)


def test_characteristic_fn_gaussian():
    rms = normal_raw_moments_all(MEAN, VAR, 20)
    zs = jnp.linspace(-1.0, 1.0, 21)
    got = characteristic_fn(zs, rms)
    expected = np.exp(1j * np.asarray(zs) * MEAN - VAR * np.asarray(zs) ** 2 / 2)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_characteristic_from_pdf_gaussian():
    xs = jnp.linspace(-12, 12, 4001)
    ps = jnp.exp(-((xs - MEAN) ** 2) / (2 * VAR)) / jnp.sqrt(2 * jnp.pi * VAR)
    zs = jnp.linspace(-2.0, 2.0, 11)
    got = characteristic_from_pdf(zs, ps, xs)
    expected = np.exp(1j * np.asarray(zs) * MEAN - VAR * np.asarray(zs) ** 2 / 2)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-7)
