"""Combinatorial polynomials evaluated at trace time.

These mirror the capabilities of the reference utilities (reference:
``mfs/utils.py:252-337``) but are implemented with iterative dynamic
programming instead of Python recursion, so high orders neither blow
the recursion depth nor balloon the traced graph.

All functions here operate on *static* integer orders; the numeric
inputs may be traced JAX arrays, so everything stays jittable and
differentiable.
"""
import math
from functools import lru_cache
from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.typings import Array, FloatScalar


def gamma(x: FloatScalar) -> Array:
    """Jittable continuous gamma function via ``lgamma``
    (reference: ``mfs/utils.py:27-28``)."""
    return jnp.exp(jax.lax.lgamma(x))


def factorial(n: FloatScalar) -> Array:
    """Jittable continuous factorial ``gamma(n + 1)``."""
    return gamma(n + 1.0)


def binom(n: FloatScalar, k: FloatScalar) -> Array:
    """Jittable continuous binomial coefficient."""
    return factorial(n) / (factorial(k) * factorial(n - k))


def vmap_list_of_funcs(funcs: Sequence[Callable]) -> Callable:
    """vmap a list of callables via ``lax.switch``:
    ``z(x) = stack([f(x) for f in funcs])`` executed vectorised
    (reference: ``mfs/utils.py:170-187``)."""

    def select(ind, x):
        return jax.lax.switch(ind, list(funcs), x)

    def vmapped(x):
        return jax.vmap(select, in_axes=(0, None))(jnp.arange(len(funcs)), x)

    return vmapped


@lru_cache(maxsize=None)
def _pascal_np(s: int) -> np.ndarray:
    """Lower-triangular Pascal matrix ``P[n, j] = C(n, j)`` of size s."""
    p = np.zeros((s, s), dtype=np.float64)
    p[:, 0] = 1.0
    for n in range(1, s):
        for j in range(1, n + 1):
            p[n, j] = p[n - 1, j - 1] + p[n - 1, j]
    return p


def pascal_lower(s: int) -> np.ndarray:
    """Binomial-coefficient matrix, a compilation constant (NumPy)."""
    return _pascal_np(s)


def partial_bell(n: int, k: int, xs: Union[Array, Sequence[float]]) -> FloatScalar:
    """Partial (incomplete) Bell polynomial ``B_{n,k}(x_1, ..., x_{n-k+1})``.

    Iterative DP over the triangular table of the recurrence

        B_{n,k} = sum_{i=1}^{n-k+1} C(n-1, i-1) x_i B_{n-i, k-1},

    replacing the reference's exponential-time Python recursion
    (reference: ``mfs/utils.py:252-282``).  ``xs`` is 1-indexed as in
    the mathematical convention: ``xs[0]`` is x_1.
    """
    if n == 0 and k == 0:
        return 1.0
    if n == 0 or k == 0:
        return 0.0
    if k > n:
        return 0.0
    # table[m][j] = B_{m, j}; entries outside j <= m <= n stay 0.
    # B_{n,k} depends only on x_1..x_{n-k+1}; callers may provide exactly
    # that many entries, so missing higher x's are treated as zero (they
    # cannot contribute to the requested value).
    table = [[0.0] * (k + 1) for _ in range(n + 1)]
    table[0][0] = 1.0
    for j in range(1, k + 1):
        for m in range(j, n + 1):
            acc = 0.0
            for i in range(1, m - j + 2):
                if i - 1 >= len(xs):
                    break
                prev = table[m - i][j - 1]
                if isinstance(prev, float) and prev == 0.0:
                    continue
                acc = acc + math.comb(m - 1, i - 1) * xs[i - 1] * prev
            table[m][j] = acc
    return table[n][k]


def complete_bell(n: int, xs: Union[Array, Sequence[float]]) -> FloatScalar:
    """Complete Bell polynomial ``B_n = sum_k B_{n,k}``."""
    if n == 0:
        return 1.0
    return sum(partial_bell(n, k, xs) for k in range(1, n + 1))


def hermite_probabilist(n: int, x: FloatScalar) -> FloatScalar:
    """Probabilists' Hermite polynomial He_n(x), three-term recurrence.

    Iterative (reference uses recursion: ``mfs/utils.py:311-337``).
    Works elementwise on arrays.
    """
    if n == 0:
        return jnp.ones_like(x) if hasattr(x, "shape") else 1.0
    h_prev, h = (1.0, x)
    for m in range(1, n):
        h_prev, h = h, x * h - m * h_prev
    return h


def hermite_probabilist_all(n_max: int, x: Array) -> Array:
    """All of He_0(x), ..., He_{n_max}(x) stacked on a new last axis.

    One pass of the three-term recurrence computes every order — the
    batched building block for Gram–Charlier series evaluation.

    Returns shape ``x.shape + (n_max + 1,)``.
    """
    x = jnp.asarray(x)
    hs = [jnp.ones_like(x)]
    if n_max >= 1:
        hs.append(x)
    for m in range(1, n_max):
        hs.append(x * hs[-1] - m * hs[-2])
    return jnp.stack(hs, axis=-1)
