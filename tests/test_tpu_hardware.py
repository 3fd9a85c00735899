"""On-TPU validation of the compiled Mosaic kernels (marker: tpu).

Pytest form of ``tools/tpu_accuracy_check.py`` (VERDICT r02 item 5):
run on a TPU host with

    MFS_TPU_TESTS_TPU=1 python -m pytest tests/test_tpu_hardware.py -v

Skipped automatically when no TPU device is visible (the CPU suite
forces the cpu backend in conftest unless MFS_TPU_TESTS_TPU=1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.one_dim.quadrature import moment_quadrature
from mfs_tpu.utils.gaussian import normal_raw_moments_all

_HAS_TPU = any(d.platform not in ("cpu",) for d in jax.devices())

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not _HAS_TPU, reason="no TPU device visible"),
]


def _mixture_moments(n_orders: int, b: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(rng.randn(b) * 0.3)
    varis = jnp.asarray(0.5 + rng.rand(b))
    return (
        0.6 * normal_raw_moments_all(means, varis, n_orders)
        + 0.4 * normal_raw_moments_all(means + 0.3, varis * 0.8, n_orders)
    )


def test_mosaic_quadrature_accuracy():
    """Compiled kernel at production size: agrees with the XLA f64 path
    and reproduces the input moments to double-f32 precision."""
    N, B = 15, 1024
    ms = _mixture_moments(2 * N, B)

    @jax.jit
    def compare(ms):
        w_r, x_r = moment_quadrature(ms, sort_nodes=True, eigh_impl="refined")
        w_p, x_p = moment_quadrature(ms, eigh_impl="pallas")
        order = jnp.argsort(x_p, axis=-1)
        x_p = jnp.take_along_axis(x_p, order, axis=-1)
        w_p = jnp.take_along_axis(w_p, order, axis=-1)
        pows = jnp.arange(2 * N)
        got_r = jnp.einsum("bpn,bn->bp", x_r[..., None, :] ** pows[:, None], w_r)
        got_p = jnp.einsum("bpn,bn->bp", x_p[..., None, :] ** pows[:, None], w_p)
        rel = lambda got: jnp.max(jnp.abs(got - ms) / (jnp.abs(ms) + 1e-30))
        return (
            jnp.max(jnp.abs(x_p - x_r)),
            jnp.max(jnp.abs(w_p - w_r)),
            rel(got_r),
            rel(got_p),
        )

    dx, dw, err_r, err_p = jax.block_until_ready(compare(ms))
    assert float(err_p) < 1e-7, "Mosaic kernel lost double-f32 precision"
    assert float(dx) < 1e-4 and float(dw) < 1e-5


def test_mosaic_gradient_path():
    """Gradients through the fused kernel match the pure-XLA path.

    The m_0 component is excluded: the fused kernel's weights carry the
    measure mass (sum w = m_0, the Christoffel convention) while the
    XLA path returns the normalized rule (sum w = 1), so their m_0
    sensitivities legitimately differ.  Filters always pass normalized
    moments (m_0 = 1 with zero tangent), where the two conventions are
    identical primal AND tangent.
    """
    ms = _mixture_moments(16, 8)

    def loss(m, impl):
        w, x = moment_quadrature(m, eigh_impl=impl)
        return jnp.sum(w * jnp.tanh(x))

    g_p = jax.jit(jax.grad(lambda m: loss(m, "pallas")))(ms)
    g_r = jax.jit(jax.grad(lambda m: loss(m, "refined")))(ms)
    gdiff = float(
        jnp.max(
            jnp.abs(g_p[..., 1:] - g_r[..., 1:])
            / (jnp.abs(g_r[..., 1:]) + 1e-12)
        )
    )
    assert gdiff < 1e-5, f"fused-kernel gradient diverged: {gdiff:.3e}"


def test_mosaic_nd_eigh():
    """Compiled N-D eigenpair kernel: residual check at 2D N=3."""
    import mfs_tpu.ops.pallas_quadrature_nd as pqnd
    from mfs_tpu.multi_dims.multi_indices import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
    )
    from mfs_tpu.multi_dims.moments import raw_moments_mvn_kan_all

    N, d, B = 3, 2, 256
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    rng = np.random.RandomState(0)
    mean = jnp.asarray(0.3 * rng.randn(B, d))
    a = rng.randn(B, d, d)
    cov = jnp.asarray(np.einsum("bij,bkj->bik", a, a) * 0.1 + 0.5 * np.eye(d))
    ms = raw_moments_mvn_kan_all(mean, cov, mis)

    vals_p, vecs_p = pqnd.nd_eigh_pallas(ms, inds, block_b=256)
    G = ms[..., np.asarray(inds)[0]]
    R = jax.lax.linalg.cholesky(G)
    Hs = ms[..., np.asarray(inds)[1:]]
    for m in range(d):
        inner = jax.lax.linalg.triangular_solve(
            R, Hs[:, m], left_side=True, lower=True
        )
        K = jax.lax.linalg.triangular_solve(
            R, inner, left_side=False, lower=True, transpose_a=True
        )
        K = 0.5 * (K + jnp.swapaxes(K, -1, -2))
        resid = jnp.einsum("bij,bjk->bik", K, vecs_p[:, m]) - vals_p[
            :, m, None, :
        ] * vecs_p[:, m]
        assert float(jnp.max(jnp.abs(resid))) < 1e-8
