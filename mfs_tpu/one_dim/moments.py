"""1D moment algebra: mode conversions, cumulants, characteristic fns.

Counterpart of reference ``mfs/one_dim/moments.py:77-138,258-343``.
Conversions are single masked matrix contractions built from static
Pascal triangles — batched over leading axes — instead of the
reference's doubly-vmapped ``lax.cond`` summands.
"""
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mfs_tpu.one_dim.quadrature import moment_quadrature
from mfs_tpu.typings import Array, FloatScalar
from mfs_tpu.utils.combinatorics import partial_bell, pascal_lower


def _powers(x: Array, num: int) -> Array:
    """[1, x, x^2, ..., x^{num-1}] along a new last axis, exact for any
    sign of x (iterated products, no pow/log)."""
    x = jnp.asarray(x)
    out = [jnp.ones_like(x)]
    for _ in range(num - 1):
        out.append(out[-1] * x)
    return jnp.stack(out, axis=-1)


def _binomial_shift_matrix(s: int, shift: Array) -> Array:
    """Matrix ``M[n, j] = C(n, j) shift^{n-j}`` (lower triangular).

    ``shift`` may carry batch axes; returns (..., s, s).
    """
    binom = jnp.asarray(pascal_lower(s))
    expo = np.arange(s)[:, None] - np.arange(s)[None, :]  # n - j
    mask = expo >= 0
    pows = _powers(shift, s)  # (..., s)
    powmat = pows[..., np.where(mask, expo, 0)]  # (..., s, s)
    return jnp.where(mask, binom * powmat, 0.0)


def raw_to_central(rms: Array) -> Array:
    """E[X^n] -> E[(X - E X)^n] for all n at once (batched)."""
    s = rms.shape[-1]
    mean = rms[..., 1]
    M = _binomial_shift_matrix(s, -mean)
    return jnp.einsum("...nj,...j->...n", M, rms)


def central_to_raw(cms: Array, mean: FloatScalar) -> Array:
    """E[(X - mean)^n] -> E[X^n] for all n at once (batched)."""
    s = cms.shape[-1]
    M = _binomial_shift_matrix(s, jnp.asarray(mean))
    return jnp.einsum("...nj,...j->...n", M, cms)


def raw_to_scaled(rms: Array, scale: FloatScalar = None) -> Array:
    """E[X^n] -> E[((X - mean)/scale)^n]; default scale = std."""
    if scale is None:
        scale = jnp.sqrt(rms[..., 2] - rms[..., 1] ** 2)
    return raw_to_central(rms) / _powers(jnp.asarray(scale), rms.shape[-1])


def scaled_to_central(sms: Array, scale: FloatScalar) -> Array:
    """E[((X - mean)/scale)^n] -> E[(X - mean)^n]."""
    return sms * _powers(jnp.asarray(scale), sms.shape[-1])


def sms_to_cumulants(sms: Array, mean: FloatScalar, scale: FloatScalar) -> Array:
    """Cumulants k_1..k_{2n-1} from scaled central moments.

    Faà di Bruno via partial Bell polynomials of the central moments
    (reference: ``mfs/one_dim/moments.py:258-306``).  Trace-safe in
    mean/scale: k_1 = mean + cms[1] covers both the centred
    (cms[1] = 0) and the raw-with-zero-mean conventions.
    """
    cms = scaled_to_central(sms, scale)
    xs = cms[1:]

    def nth(n: int):
        if n == 1:
            return mean + cms[1]
        return sum(
            (-1) ** (k - 1) * math.factorial(k - 1) * partial_bell(n, k, xs)
            for k in range(1, n + 1)
        )

    return jnp.stack([jnp.asarray(nth(n)) for n in range(1, sms.shape[-1])])


def characteristic_fn(
    zs: Array, ms: Array, mean: FloatScalar = 0.0, scale: FloatScalar = 1.0
) -> Array:
    """Characteristic function at locations ``zs`` via moment quadrature.

    ``E[e^{izX}] ≈ Σ_j w_j e^{i z x_j}``; one quadrature serves all
    evaluation points (reference evaluates pointwise:
    ``mfs/one_dim/moments.py:309-337``).

    Returns shape ``ms.shape[:-1] + zs.shape``.
    """
    zs = jnp.asarray(zs)
    weights, nodes = moment_quadrature(ms, mean, scale)
    zflat = zs.reshape(-1)
    vals = jnp.sum(
        weights[..., None] * jnp.exp(1.0j * nodes[..., None] * zflat), axis=-2
    )
    return vals.reshape(ms.shape[:-1] + zs.shape)


def characteristic_from_pdf(zs: Array, ps: Array, xs: Array) -> Array:
    """Characteristic function by trapezoid integration of a gridded pdf."""
    zs = jnp.asarray(zs)
    integrand = jnp.exp(1.0j * zs.reshape((-1, 1)) * xs) * ps
    out = jnp.trapezoid(integrand, xs, axis=-1)
    return out.reshape(zs.shape)
