"""Batched Jacobi eigensolver: accuracy, batching, gradients."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.ops.eigh import eigh_batched


@pytest.mark.parametrize("n", [2, 3, 5, 8, 15, 16, 31])
def test_eigh_reconstruction_and_orthogonality(n):
    key = jax.random.PRNGKey(n)
    a = jax.random.normal(key, (11, n, n))
    a = a + jnp.swapaxes(a, -1, -2)
    vals, vecs = eigh_batched(a)
    recon = jnp.einsum("bik,bk,bjk->bij", vecs, vals, vecs)
    scale = jnp.abs(a).max()
    assert jnp.abs(recon - a).max() / scale < 1e-13
    gram = jnp.einsum("bki,bkj->bij", vecs, vecs)
    assert jnp.abs(gram - jnp.eye(n)).max() < 1e-13


def test_eigh_matches_numpy_eigenvalues():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 9, 9)
    a = a + np.swapaxes(a, -1, -2)
    vals, _ = eigh_batched(jnp.asarray(a), sort=True)
    expected = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-12, atol=1e-12)


def test_eigh_sorted_vectors_consistent():
    rng = np.random.RandomState(1)
    a = rng.randn(7, 7)
    a = a + a.T
    vals, vecs = eigh_batched(jnp.asarray(a), sort=True)
    w_np, v_np = np.linalg.eigh(a)
    np.testing.assert_allclose(np.asarray(vals), w_np, rtol=1e-12, atol=1e-12)
    # Compare eigenvectors up to sign.
    for i in range(7):
        v = np.asarray(vecs[:, i])
        ref = v_np[:, i]
        assert min(np.abs(v - ref).max(), np.abs(v + ref).max()) < 1e-10


def test_eigh_jvp_matches_finite_differences():
    rng = np.random.RandomState(2)
    a0 = rng.randn(6, 6)

    def f(a):
        a = a + a.T
        vals, vecs = eigh_batched(a)
        return jnp.sum(jnp.sort(vals) * jnp.arange(6)) + jnp.sum(
            vecs[0, :] ** 2 * jnp.arange(6)
        )

    g = jax.grad(f)(jnp.asarray(a0))
    eps = 1e-6
    for i, j in itertools.product(range(0, 6, 2), range(0, 6, 3)):
        e = np.zeros((6, 6))
        e[i, j] = eps
        fd = (f(jnp.asarray(a0 + e)) - f(jnp.asarray(a0 - e))) / (2 * eps)
        assert abs(float(g[i, j]) - float(fd)) < 1e-6


def test_eigh_under_vmap_and_jit():
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (5, 4, 10, 10))
    a = a + jnp.swapaxes(a, -1, -2)
    vals, vecs = jax.jit(jax.vmap(eigh_batched))(a)
    recon = jnp.einsum("bcik,bck,bcjk->bcij", vecs, vals, vecs)
    assert jnp.abs(recon - a).max() < 1e-12
