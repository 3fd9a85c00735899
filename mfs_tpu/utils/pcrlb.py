"""Posterior Cramér–Rao lower bound by Monte-Carlo.

Tichavsky-style recursion (reference: ``mfs/utils.py:431-492``): the
information-matrix recursion is driven by MC averages of vmapped
Hessians of the transition and likelihood log-densities.
"""
from typing import Callable

import jax
import jax.numpy as jnp

from mfs_tpu.typings import Array, FloatScalar


def posterior_cramer_rao(
    state_trajectories: Array,
    measurements: Array,
    j0: Array,
    logpdf_transition: Callable[[Array, Array], FloatScalar],
    logpdf_likelihood: Callable[[Array, Array], FloatScalar],
) -> Array:
    """Inverse PCRLB matrices J_k along a trajectory ensemble.

    Parameters
    ----------
    state_trajectories : Array (T + 1, N, dx)
        MC state trajectories including the initial time.
    measurements : Array (T, N, dy)
        MC measurements.
    j0 : Array (dx, dx)
        Initial information matrix -E[Hess log p(x0)].
    logpdf_transition : ((dx,), (dx,)) -> float
        log p(x_k | x_{k-1}); first argument is x_k.
    logpdf_likelihood : ((dy,), (dx,)) -> float
        log p(y_k | x_k); first argument is y_k.

    Returns
    -------
    Array (T, dx, dx)
        The information matrices J_k (PCRLB = J_k^{-1}).
    """
    h_tt_trans = jax.vmap(jax.hessian(logpdf_transition, argnums=0))
    h_ts_trans = jax.vmap(jax.jacfwd(jax.jacrev(logpdf_transition, argnums=1), argnums=0))
    h_ss_trans = jax.vmap(jax.hessian(logpdf_transition, argnums=1))
    h_tt_lik = jax.vmap(jax.hessian(logpdf_likelihood, argnums=1))

    def step(j, elem):
        y, x_t, x_s = elem
        d11 = -jnp.mean(h_ss_trans(x_t, x_s), axis=0)
        d12 = -jnp.mean(h_ts_trans(x_t, x_s), axis=0)
        d22 = -jnp.mean(h_tt_trans(x_t, x_s) + h_tt_lik(y, x_t), axis=0)
        j_next = d22 - d12.T @ jnp.linalg.solve(j + d11, d12)
        return j_next, j_next

    _, js = jax.lax.scan(
        step, j0, (measurements, state_trajectories[1:], state_trajectories[:-1])
    )
    return js
