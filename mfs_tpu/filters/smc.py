"""Particle filters (sequential Monte Carlo).

Bootstrap and proposal-based particle filters (counterpart of reference
``mfs/classical_filters_smoothers/smc.py``).  The particle axis is a
plain array axis, so everything vmaps/shards over additional trial
axes; on TPU the per-step work is one fused elementwise+gather pass
over (trials, particles).
"""
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mfs_tpu.filters.resampling import continuous_resampling
from mfs_tpu.typings import Array, FloatScalar


def bootstrap_filter(
    transition_sampler: Callable[[Array, Array], Array],
    measurement_cond_pdf: Callable[[Array, Array], Array],
    ys: Array,
    init_sampler: Callable[[Array, int], Array],
    key: Array,
    nsamples: int,
    resampling: Callable[[Array, Array], Array],
    conti_resampling: bool = False,
) -> Tuple[Array, FloatScalar]:
    """Bootstrap particle filter.

    Parameters
    ----------
    transition_sampler : ((n, dx), key) -> (n, dx)
        Propagates particles through the transition kernel.
    measurement_cond_pdf : (y, (n, dx)) -> (n,)
        Likelihood of y at each particle.
    ys : Array (T, dy)
    init_sampler : (key, n) -> (n, dx)
    nsamples : int
    resampling : ((n,), key) -> (n,) integer indices.
    conti_resampling : bool
        Use the differentiable continuous resampler (1D states only).

    Returns
    -------
    samples : Array (T, n, dx), nell : scalar
    """

    def step(carry, elem):
        samples, nell = carry
        y, k = elem
        samples = transition_sampler(samples, k)
        weights = measurement_cond_pdf(y, samples)
        nell = nell - jnp.log(jnp.mean(weights))
        weights = weights / jnp.sum(weights)
        k_res, _ = jax.random.split(k)
        if conti_resampling:
            samples = continuous_resampling(samples, weights, nsamples, k_res)
        else:
            samples = jnp.take(samples, resampling(weights, k_res), axis=0)
        return (samples, nell), samples

    init = init_sampler(key, nsamples)
    keys = jax.random.split(key, ys.shape[0])
    (_, nell), samples = jax.lax.scan(step, (init, 0.0), (ys, keys))
    return samples, nell


def particle_filter(
    proposal_sampler: Callable[[Array, Array, Array], Array],
    proposal_density: Callable[[Array, Array, Array], Array],
    transition_density: Callable[[Array, Array], Array],
    measurement_cond_pdf: Callable[[Array, Array], Array],
    ys: Array,
    init_sampler: Callable[[Array, int], Array],
    key: Array,
    nsamples: int,
    resampling: Callable[[Array, Array], Array],
) -> Array:
    """Proposal-based SMC (importance weights corrected by the
    transition/proposal density ratio).

    Returns the resampled particle trajectories (T, n, dx).
    """

    def step(ancestors, elem):
        y, k = elem
        samples = proposal_sampler(ancestors, y, k)
        weights = (
            measurement_cond_pdf(y, samples)
            * transition_density(samples, ancestors)
            / proposal_density(samples, ancestors, y)
        )
        weights = weights / jnp.sum(weights)
        k_res, _ = jax.random.split(k)
        samples = jnp.take(samples, resampling(weights, k_res), axis=0)
        return samples, samples

    init = init_sampler(key, nsamples)
    keys = jax.random.split(key, ys.shape[0])
    _, samples = jax.lax.scan(step, init, (ys, keys))
    return samples
