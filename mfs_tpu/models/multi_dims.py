"""Multidimensional test models (counterpart of reference
``mfs/multi_dims/ss_models.py``)."""
import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mfs_tpu.typings import Array
from mfs_tpu.utils.gaussian import GaussianSumND


def satellite_orbital_stability(a=1.0, b=1.0, c=1.0):
    """Drift/dispersion of the satellite orbital-stability SDE
    (reference: ``mfs/multi_dims/ss_models.py:28-37``; unused in the
    experiments but part of the model zoo)."""

    def drift(x: Array) -> Array:
        return jnp.array([x[1], -b * x[1] - jnp.sin(x[0]) - c * jnp.sin(2 * x[0])])

    def dispersion(x: Array) -> Array:
        return jnp.array([[0.0, 0.0], [0.0, -a * b * x[1] - b * jnp.sin(x[0])]])

    return drift, dispersion


class ModelND(NamedTuple):
    dt: float
    T: int
    ts: Array
    init_cond: GaussianSumND
    drift: Callable
    dispersion: Callable
    emission: Callable
    measurement_cond_pdf: Callable
    simulate: Callable  # (key, nsamples, integration_steps) -> (x0s, xss, yss)


def prey_predator(multi_indices) -> ModelND:
    """2D stochastic Lotka–Volterra with Bernoulli prey observations.

        dX_1 = X_1 (alp - beta X_2) dt + sigma X_1 dW_1,
        dX_2 = X_2 (delta X_1 - gamma) dt + sigma X_2 dW_2,
        Y_k ~ Bernoulli(logistic(X_1^3 - 1)).

    Reference: ``mfs/multi_dims/ss_models.py:40-95`` (Milstein
    simulation with the diagonal multiplicative-noise correction).
    The simulator generates whole ensembles in one scan.
    """
    dt = 1e-3
    T = 2000
    ts = jnp.linspace(dt, dt * T, T)
    alp, beta, delta, gamma, sigma = 4.0, 4.0, 4.0, 4.0, 0.1

    means = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    covs = jnp.array([[[1.0, 0.0], [0.0, 1.0]], [[2.0, 0.0], [0.0, 2.0]]]) * 0.001
    weights = jnp.array([0.5, 0.5])
    gs = GaussianSumND.new(means, covs, weights, multi_indices)

    def drift(x):
        return x * (x[..., ::-1] * jnp.array([-beta, delta]) + jnp.array([alp, -gamma]))

    def dispersion(x):
        return jnp.diag(sigma * x)

    def emission(x):
        return 1.0 / (1.0 + jnp.exp(-(x**3) + 1.0))

    def measurement_cond_pdf(y, x):
        p = emission(x[..., 0])
        return jnp.where(y[..., 0] == 1, p, 1.0 - p)

    @partial(jax.jit, static_argnums=(1, 2))
    def simulate(key: Array, nsamples: int = 1, integration_steps: int = 100):
        key_x0, key_w, key_y = jax.random.split(key, 3)
        ddt = dt / integration_steps
        x0s = gs.sampler(key_x0, nsamples)  # (n, 2)
        dws = math.sqrt(ddt) * jax.random.normal(
            key_w, (T, integration_steps, nsamples, 2)
        )

        def milstein(x, dw):
            # diagonal multiplicative noise: Milstein correction term.
            return (
                x
                + drift(x) * ddt
                + sigma * x * dw
                + 0.5 * sigma**2 * x * (dw**2 - ddt)
            )

        def substeps(x, dws_t):
            x, _ = jax.lax.scan(lambda xc, dw: (milstein(xc, dw), None), x, dws_t)
            return x, x

        _, xss = jax.lax.scan(substeps, x0s, dws)  # (T, n, 2)
        yss = jax.random.bernoulli(key_y, emission(xss[..., 0])).astype(xss.dtype)
        return x0s, xss, yss[..., None]  # ys: (T, n, 1)

    return ModelND(
        dt=dt,
        T=T,
        ts=ts,
        init_cond=gs,
        drift=drift,
        dispersion=dispersion,
        emission=emission,
        measurement_cond_pdf=measurement_cond_pdf,
        simulate=simulate,
    )


def lotka_volterra_3d(multi_indices) -> ModelND:
    """3D stochastic Lotka–Volterra food chain, Bernoulli prey sensor.

        dX_1 = X_1 (alp - beta X_2) dt           + sigma X_1 dW_1,
        dX_2 = X_2 (delta X_1 - gamma - eps X_3) dt + sigma X_2 dW_2,
        dX_3 = X_3 (zeta X_2 - eta) dt           + sigma X_3 dW_3,
        Y_k ~ Bernoulli(logistic(X_1^3 - 1)).

    The first *three*-dimensional member of the model zoo (the
    reference's N-D machinery is general-d,
    ``mfs/multi_dims/ss_models.py`` ships only 2D models): prey X_1,
    intermediate predator X_2, apex predator X_3.  Parameters satisfy
    the coexistence constraint ``alp/beta = eta/zeta`` so (1, 1, 1) is
    a neutrally-stable equilibrium; the noise keeps the chain
    oscillating around it.  Drift is quadratic and the dispersion
    diagonal-linear, so the closed-form polynomial TME transitions
    (``mfs_tpu.multi_dims.poly_tme``) apply with drift_deg=2,
    dispersion_deg=1, exactly as for the 2D prey–predator model.
    Simulation uses the diagonal-noise Milstein correction
    (counterpart of ``mfs/multi_dims/ss_models.py:40-95``).
    """
    dt = 1e-3
    T = 2000
    ts = jnp.linspace(dt, dt * T, T)
    alp, beta, delta, gamma, eps, zeta, eta = 4.0, 4.0, 4.0, 2.0, 2.0, 4.0, 4.0
    sigma = 0.1

    means = jnp.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    covs = jnp.array([jnp.eye(3), 2.0 * jnp.eye(3)]) * 0.001
    weights = jnp.array([0.5, 0.5])
    gs = GaussianSumND.new(means, covs, weights, multi_indices)

    def drift(x):
        x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
        return jnp.stack(
            [
                x1 * (alp - beta * x2),
                x2 * (delta * x1 - gamma - eps * x3),
                x3 * (zeta * x2 - eta),
            ],
            axis=-1,
        )

    def dispersion(x):
        return jnp.diag(sigma * x)

    def emission(x):
        return 1.0 / (1.0 + jnp.exp(-(x**3) + 1.0))

    def measurement_cond_pdf(y, x):
        p = emission(x[..., 0])
        return jnp.where(y[..., 0] == 1, p, 1.0 - p)

    @partial(jax.jit, static_argnums=(1, 2))
    def simulate(key: Array, nsamples: int = 1, integration_steps: int = 100):
        key_x0, key_w, key_y = jax.random.split(key, 3)
        ddt = dt / integration_steps
        x0s = gs.sampler(key_x0, nsamples)  # (n, 3)
        dws = math.sqrt(ddt) * jax.random.normal(
            key_w, (T, integration_steps, nsamples, 3)
        )

        def milstein(x, dw):
            return (
                x
                + drift(x) * ddt
                + sigma * x * dw
                + 0.5 * sigma**2 * x * (dw**2 - ddt)
            )

        def substeps(x, dws_t):
            x, _ = jax.lax.scan(lambda xc, dw: (milstein(xc, dw), None), x, dws_t)
            return x, x

        _, xss = jax.lax.scan(substeps, x0s, dws)  # (T, n, 3)
        yss = jax.random.bernoulli(key_y, emission(xss[..., 0])).astype(xss.dtype)
        return x0s, xss, yss[..., None]  # ys: (T, n, 1)

    return ModelND(
        dt=dt,
        T=T,
        ts=ts,
        init_cond=gs,
        drift=drift,
        dispersion=dispersion,
        emission=emission,
        measurement_cond_pdf=measurement_cond_pdf,
        simulate=simulate,
    )
