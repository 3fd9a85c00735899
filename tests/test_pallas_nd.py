"""CPU oracle for the fused N-D quadrature eigenpair kernel.

Runs the kernel body as plain jnp (eager — the unrolled graph is slow
to jit-compile on CPU) and checks eigen-residuals, orthonormality, and
full moment reproduction against the XLA path.  The compiled Mosaic
kernel is exercised on hardware by the N-D filter probes and the
prey-predator experiment (``--eigh-impl pallas``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfs_tpu.ops.doublefloat as dfm
from mfs_tpu.ops.doublefloat import DF
from mfs_tpu.ops.pallas_quadrature_nd import run_nd_kernel_as_jnp
from mfs_tpu.multi_dims import (
    generate_graded_lexico_multi_indices,
    gram_and_hankel_indices_graded_lexico,
)
from mfs_tpu.multi_dims.quadrature import moment_quadrature_nd
from mfs_tpu.multi_dims.moments import monomials_nd, raw_moments_mvn_kan


@pytest.mark.parametrize("N", [2, 3])
def test_nd_kernel_body_eigenpairs_and_moments(N):
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    inds = np.asarray(gram_and_hankel_indices_graded_lexico(N, 2))
    d, s = inds.shape[0] - 1, inds.shape[1]
    B = 4
    rng = np.random.RandomState(0)
    ms = []
    for _ in range(B):
        mean = rng.randn(2) * 0.3
        A = rng.randn(2, 2) * 0.4
        cov = A @ A.T + 0.5 * np.eye(2)
        ms.append([raw_moments_mvn_kan(mean, cov, mi) for mi in mis])
    ms = jnp.asarray(np.asarray(ms, dtype=np.float64))

    msd = dfm.from_f64(ms.T)
    va_h, va_l, ve_h, ve_l = run_nd_kernel_as_jnp(
        d, s, inds[0], inds[1:], msd.hi, msd.lo
    )
    vals = dfm.to_f64(DF(va_h, va_l)).T.reshape(B, d, s)
    vecs = dfm.to_f64(DF(ve_h, ve_l)).T.reshape(B, d, s, s)

    # eigen-residual and orthonormality against the XLA-computed K
    G = ms[..., inds[0]]
    Hs = ms[..., inds[1:]]
    R = jax.lax.linalg.cholesky(G)
    Rb = jnp.broadcast_to(R[..., None, :, :], Hs.shape)
    Ks = jax.lax.linalg.triangular_solve(
        Rb,
        jax.lax.linalg.triangular_solve(Rb, Hs, left_side=True, lower=True),
        left_side=False, lower=True, transpose_a=True,
    )
    Ks = 0.5 * (Ks + jnp.swapaxes(Ks, -1, -2))
    resid = jnp.einsum("bdij,bdjk->bdik", Ks, vecs) - vecs * vals[..., None, :]
    orth = jnp.einsum("bdki,bdkj->bdij", vecs, vecs) - jnp.eye(s)
    assert float(jnp.max(jnp.abs(resid))) < 1e-12
    assert float(jnp.max(jnp.abs(orth))) < 1e-13

    # full quadrature through the pallas branch's weight assembly
    import mfs_tpu.ops.pallas_quadrature_nd as pqnd

    orig = pqnd.nd_eigh_pallas
    pqnd.nd_eigh_pallas = lambda m, i, **kw: (vals, vecs)
    try:
        w_p, x_p = moment_quadrature_nd(ms, inds, eigh_impl="pallas")
    finally:
        pqnd.nd_eigh_pallas = orig
    got = jnp.einsum("bmz,bm->bz", monomials_nd(x_p, mis), w_p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ms), atol=5e-12)


def test_nd_kernel_gate():
    mis = generate_graded_lexico_multi_indices(2, 2 * 6 - 1)
    inds = gram_and_hankel_indices_graded_lexico(6, 2)  # s = 21 > MAX_S
    from mfs_tpu.ops.pallas_quadrature_nd import nd_eigh_pallas

    with pytest.raises(ValueError):
        nd_eigh_pallas(jnp.zeros((2, mis.shape[0])), inds)
