"""Resampling kernels for sequential Monte Carlo.

Standard systematic / stratified / multinomial index resamplers
(inverse-CDF by ``searchsorted`` over the weight cumsum) plus the
sorted-interpolation continuous resampler that makes the particle
likelihood differentiable (Malik–Pitt / Corenflos et al.).  Functional
parity with reference ``mfs/classical_filters_smoothers/resampling.py``.
"""
import jax
import jax.numpy as jnp

from mfs_tpu.typings import Array


def _inverse_cdf(weights: Array, us: Array) -> Array:
    n = weights.shape[0]
    idx = jnp.searchsorted(jnp.cumsum(weights), us)
    return jnp.clip(idx, 0, n - 1)


def systematic(weights: Array, key: Array) -> Array:
    """Systematic resampling: one shared uniform offset per sweep."""
    n = weights.shape[0]
    u = jax.random.uniform(key, ())
    return _inverse_cdf(weights, (jnp.arange(n, dtype=weights.dtype) + u) / n)


def stratified(weights: Array, key: Array) -> Array:
    """Stratified resampling: one uniform per stratum."""
    n = weights.shape[0]
    us = jax.random.uniform(key, (n,))
    return _inverse_cdf(weights, (jnp.arange(n, dtype=weights.dtype) + us) / n)


def multinomial(weights: Array, key: Array) -> Array:
    """Multinomial resampling with sorted uniforms (Chopin's trick)."""
    n = weights.shape[0]
    es = -jnp.log(jax.random.uniform(key, (n + 1,)))
    z = jnp.cumsum(es)
    sorted_us = z[:-1] / z[-1]
    return _inverse_cdf(weights, sorted_us)


def continuous_resampling(samples: Array, weights: Array, nsamples: int, key: Array) -> Array:
    """Differentiable 1D resampling by inverse-CDF interpolation.

    Sorts the particles, builds a piecewise-linear CDF from midpoint-
    averaged weights, and interpolates stratified uniforms through it,
    so gradients flow to both samples and weights.
    """
    order = jnp.argsort(samples)
    xs, ws = samples[order], weights[order]
    half = 0.5 * ws
    cdf_steps = jnp.concatenate([half[:1], half[1:] + half[:-1]])
    cdf = jnp.cumsum(cdf_steps)
    us = (jax.random.uniform(key, (nsamples,)) + jnp.arange(nsamples)) / nsamples
    return jnp.interp(us, cdf, xs)
