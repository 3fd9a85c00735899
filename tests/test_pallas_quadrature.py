"""Double-float arithmetic and the fused quadrature kernel (CPU oracle).

The kernel body itself is validated on CPU through ``run_kernel_as_jnp``
(the identical code path, minus the Pallas runtime); the compiled
Mosaic kernel is exercised on real TPU hardware by the bench/driver.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfs_tpu.ops.doublefloat as dfm
from mfs_tpu.ops.doublefloat import DF
from mfs_tpu.ops.pallas_quadrature import run_kernel_as_jnp
from mfs_tpu.one_dim.quadrature import moment_quadrature
from mfs_tpu.utils.gaussian import normal_raw_moments_all


def test_doublefloat_ops_vs_f64():
    rng = np.random.RandomState(0)
    x = rng.randn(512) * np.exp(rng.randn(512))
    y = rng.randn(512) * np.exp(rng.randn(512))
    X, Y = dfm.from_f64(jnp.asarray(x)), dfm.from_f64(jnp.asarray(y))

    def relerr(got, true):
        return float(np.max(np.abs(np.asarray(got) - true) / (np.abs(true) + 1e-300)))

    assert relerr(dfm.to_f64(dfm.mul(X, Y)), x * y) < 1e-13
    assert relerr(dfm.to_f64(dfm.div(X, Y)), x / y) < 1e-13
    assert relerr(dfm.to_f64(dfm.sqrt(dfm.from_f64(jnp.abs(jnp.asarray(x))))),
                  np.sqrt(np.abs(x))) < 1e-13
    # Cancellation-free add: x + y*y can cancel by ~1e4 for some draws,
    # which amplifies the inputs' own 48-bit representation error past
    # any implementable bound; |x| + y*y has condition number 1, so this
    # isolates the arithmetic itself.
    ax = np.abs(x)
    AX = dfm.from_f64(jnp.asarray(ax))
    assert relerr(dfm.to_f64(dfm.add(AX, dfm.mul(Y, Y))), ax + y * y) < 1e-13
    # Under cancellation the error must stay small relative to the
    # *operand* scale (condition-adjusted bound).
    got = np.asarray(dfm.to_f64(dfm.add(X, dfm.mul(Y, Y))))
    scale = np.abs(x) + y * y
    assert float(np.max(np.abs(got - (x + y * y)) / scale)) < 1e-13


def test_doublefloat_survives_jit():
    """The error-free transforms must survive XLA's simplifier
    (this environment compiles with --xla_allow_excess_precision)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(256) + 0.5)
    X = dfm.from_f64(x)

    @jax.jit
    def chain(xh, xl):
        acc = DF(xh, xl)
        xx = DF(xh, xl)
        for _ in range(30):
            acc = dfm.div(dfm.add(acc, dfm.mul(xx, acc)), dfm.add(dfm.df(1.0), xx))
        return acc.hi, acc.lo

    got = dfm.to_f64(DF(*chain(X.hi, X.lo)))
    assert float(jnp.abs(got - x).max()) < 1e-11


@pytest.mark.parametrize("N", [3, 4])
def test_kernel_body_matches_xla_quadrature(N):
    means = jnp.linspace(-1.0, 1.0, 5)
    varis = jnp.linspace(0.4, 1.2, 5)
    ms = (
        0.55 * normal_raw_moments_all(means, varis, 2 * N)
        + 0.45 * normal_raw_moments_all(means + 0.5, varis * 0.7, 2 * N)
    )
    w_ref, x_ref = moment_quadrature(ms, sort_nodes=True)

    msd = dfm.from_f64(ms.T)
    B = ms.shape[0]
    mean_in = jnp.zeros((2, B), jnp.float32)
    scale_in = jnp.concatenate(
        [jnp.ones((1, B), jnp.float32), jnp.zeros((1, B), jnp.float32)]
    )
    wh, wl, xh, xl = jax.jit(
        lambda a, b, c, d: run_kernel_as_jnp(N, a, b, c, d)
    )(msd.hi, msd.lo, mean_in, scale_in)
    w_p = dfm.to_f64(DF(wh, wl)).T
    x_p = dfm.to_f64(DF(xh, xl)).T
    order = jnp.argsort(x_p, axis=-1)
    w_p = jnp.take_along_axis(w_p, order, axis=-1)
    x_p = jnp.take_along_axis(x_p, order, axis=-1)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref), atol=5e-12)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref), atol=5e-8)
    # moment reproduction through the double-f32 rule
    for p in range(2 * N):
        got = jnp.sum(w_p * x_p**p, axis=-1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ms[:, p]), rtol=1e-7, atol=1e-9
        )


def test_kernel_body_equilibration_N8():
    """The equilibrated kernel body on ill-conditioned central-mode
    moment vectors (small variances give the raw Hankel a geometric
    condition blow-up the van der Sluis scaling must remove).  Runs the
    oracle eagerly — jit-compiling the unrolled N=8 body takes minutes
    on CPU while the eager run takes seconds, and the jit/simplifier
    survival of the transforms is covered by the smaller jitted tests.
    The full N=15 production size is validated on hardware by
    ``tools/tpu_accuracy_check.py``."""
    N = 8
    means = jnp.zeros(4)
    varis = jnp.array([0.05, 0.2, 1.0, 3.0])
    ms = (
        0.5 * normal_raw_moments_all(means, varis, 2 * N)
        + 0.5 * normal_raw_moments_all(means + 0.3 * jnp.sqrt(varis), varis * 0.6, 2 * N)
    )
    w_ref, x_ref = moment_quadrature(ms, sort_nodes=True)

    msd = dfm.from_f64(ms.T)
    B = ms.shape[0]
    mean_in = jnp.zeros((2, B), jnp.float32)
    scale_in = jnp.concatenate(
        [jnp.ones((1, B), jnp.float32), jnp.zeros((1, B), jnp.float32)]
    )
    wh, wl, xh, xl = run_kernel_as_jnp(N, msd.hi, msd.lo, mean_in, scale_in)
    w_p = dfm.to_f64(DF(wh, wl)).T
    x_p = dfm.to_f64(DF(xh, xl)).T
    order = jnp.argsort(x_p, axis=-1)
    w_p = jnp.take_along_axis(w_p, order, axis=-1)
    x_p = jnp.take_along_axis(x_p, order, axis=-1)
    # moment reproduction through the double-f32 rule
    for p in range(2 * N):
        got = jnp.sum(w_p * x_p**p, axis=-1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ms[:, p]), rtol=1e-10, atol=1e-14
        )
    # and agreement with the f64 XLA path on nodes
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref), atol=5e-6)


def test_kernel_body_affine_map():
    N = 3
    ms_c = normal_raw_moments_all(jnp.zeros(3), jnp.ones(3), 2 * N)
    mean = jnp.array([0.5, -1.0, 2.0])
    scale = jnp.array([2.0, 0.5, 1.5])
    w_ref, x_ref = moment_quadrature(ms_c, mean, scale, sort_nodes=True)
    msd = dfm.from_f64(ms_c.T)
    mean_df = dfm.from_f64(mean[None])
    scale_df = dfm.from_f64(scale[None])
    mean_in = jnp.concatenate([mean_df.hi, mean_df.lo], axis=0)
    scale_in = jnp.concatenate([scale_df.hi, scale_df.lo], axis=0)
    wh, wl, xh, xl = jax.jit(
        lambda a, b, c, d: run_kernel_as_jnp(N, a, b, c, d)
    )(msd.hi, msd.lo, mean_in, scale_in)
    x_p = dfm.to_f64(DF(xh, xl)).T
    x_p = jnp.sort(x_p, axis=-1)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref), atol=1e-11)
