"""SDE trajectory simulation (reference: ``mfs/utils.py:190-249``).

Batch-first: ``simulate_sde`` simulates either one trajectory or, given
a batch of initial states and keys, a whole ensemble in one fused scan
— no Python loop over Monte-Carlo trials.
"""
from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from mfs_tpu.typings import Array, FloatScalar


def simulate_sde(
    m_and_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    x0: Union[FloatScalar, Array],
    dt: FloatScalar,
    T: int,
    key: Array,
    diagonal_cov: bool = False,
    integration_steps: int = 1,
) -> Array:
    """Simulate an SDE with conditional-Gaussian increments on a uniform grid.

    Parameters
    ----------
    m_and_cov : ((d,), float) -> ((d,), (d, d))
        Conditional mean and covariance of the transition over a small
        step; typically a TME or Euler approximation.
    x0 : Array (d,) or scalar
        Initial state.
    dt : float
        Observation-time interval.
    T : int
        Number of observation times.
    key : Array
        PRNG key.
    diagonal_cov : bool
        If True the covariance is interpreted as diagonal and a sqrt is
        used instead of a Cholesky factorisation.
    integration_steps : int
        Sub-steps per observation interval.

    Returns
    -------
    Array (T, d)
        Trajectory at observation times.
    """
    x0 = jnp.atleast_1d(x0)
    d = x0.shape[0]
    ddt = dt / integration_steps

    key, _ = jax.random.split(key)
    eps = jax.random.normal(key, (T, integration_steps, d), dtype=x0.dtype)

    def substep(x, e):
        m, cov = m_and_cov(x, ddt)
        if diagonal_cov:
            x_next = m + jnp.sqrt(cov) @ e
        else:
            x_next = m + jax.lax.linalg.cholesky(cov) @ e
        return x_next, None

    def step(x, es):
        x, _ = jax.lax.scan(substep, x, es)
        return x, x

    _, traj = jax.lax.scan(step, x0, eps)
    return traj


def simulate_sde_ensemble(
    m_and_cov: Callable[[Array, FloatScalar], Tuple[Array, Array]],
    x0s: Array,
    dt: FloatScalar,
    T: int,
    keys: Array,
    diagonal_cov: bool = False,
    integration_steps: int = 1,
) -> Array:
    """Simulate B independent trajectories at once.

    Parameters
    ----------
    x0s : Array (B, d)
    keys : Array (B, 2) — one PRNG key per trajectory.

    Returns
    -------
    Array (B, T, d)
    """
    sim = lambda x0, key: simulate_sde(
        m_and_cov, x0, dt, T, key, diagonal_cov, integration_steps
    )
    return jax.vmap(sim)(x0s, keys)
