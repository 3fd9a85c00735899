"""The *pallas_call* path itself, in interpret mode on CPU.

``tests/test_pallas_quadrature.py`` validates the kernel body as a jnp
oracle; these tests run the identical body through ``pl.pallas_call``
(``interpret=True``), so block slicing, padding, ref indexing, and the
kernel wrappers are exercised by the CPU suite — a Mosaic-independent
regression net for the compiled-kernel plumbing (the hardware lowering
is checked by ``tests/test_tpu_hardware.py`` on a TPU host).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfs_tpu.ops.pallas_quadrature as pq
import mfs_tpu.ops.pallas_quadrature_nd as pqnd
from mfs_tpu.one_dim.quadrature import moment_quadrature
from mfs_tpu.utils.gaussian import normal_raw_moments_all

# The interpret-mode kernels inline several thousand double-f32 ops
# into one XLA graph; CPU compiles take minutes each.
pytestmark = pytest.mark.slow


def _mixture_moments(n_orders: int, b: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(rng.randn(b) * 0.3)
    varis = jnp.asarray(0.5 + rng.rand(b))
    return (
        0.6 * normal_raw_moments_all(means, varis, n_orders)
        + 0.4 * normal_raw_moments_all(means + 0.3, varis * 0.8, n_orders)
    )


def test_interpret_quadrature_matches_xla():
    N, B = 4, 8
    ms = _mixture_moments(2 * N, B)
    # jit: the interpret-mode pallas executor dispatches the kernel body
    # op-by-op in eager mode (minutes on a 1-core host); compiled it is
    # a plain XLA program.
    w_p, x_p = jax.jit(
        lambda m: pq.moment_quadrature_pallas(m, block_b=8, interpret=True)
    )(ms)
    w_r, x_r = moment_quadrature(ms, sort_nodes=True, eigh_impl="refined")
    order = jnp.argsort(x_p, axis=-1)
    x_p = jnp.take_along_axis(x_p, order, axis=-1)
    w_p = jnp.take_along_axis(w_p, order, axis=-1)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_r), atol=1e-9)


def test_interpret_end_to_end_filter(monkeypatch):
    """Full Beneš filter with eigh_impl='pallas' through pallas_call
    interpret mode: nell and moments agree with the refined XLA path."""
    monkeypatch.setattr(pq, "INTERPRET", True)
    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_rms
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    N, B, T = 3, 2, 4
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )
    key = jax.random.PRNGKey(0)
    ys = jax.random.bernoulli(key, 0.5, (T, B)).astype(jnp.float64)
    rms0 = jnp.broadcast_to(model.init_cond.rms, (B, 2 * N))

    rmss_p, nell_p = jax.jit(
        lambda r0, y: moment_filter_rms(
            trans.rms, model.measurement_cond_pdf, r0, y, eigh_impl="pallas"
        )
    )(rms0, ys)
    rmss_r, nell_r = moment_filter_rms(
        trans.rms, model.measurement_cond_pdf, rms0, ys,
        stable=True, eigh_impl="refined",
    )
    np.testing.assert_allclose(
        np.asarray(nell_p), np.asarray(nell_r), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(rmss_p), np.asarray(rmss_r), rtol=1e-6, atol=1e-9
    )


def test_implicit_jvp_matches_finite_differences(monkeypatch):
    """The fused quadrature's implicit-function JVP (confluent
    Vandermonde solve at the primal nodes) against central finite
    differences of the pallas primal, in all three input slots."""
    monkeypatch.setattr(pq, "INTERPRET", True)
    N, B = 3, 4
    rng = np.random.RandomState(3)
    ms = _mixture_moments(2 * N, B, seed=3) * 1.3  # m0 != 1 on purpose
    dms = jnp.asarray(rng.randn(B, 2 * N)) * jnp.abs(ms) * 0.1
    mean = jnp.full(B, 0.1)
    scale = jnp.full(B, 1.2)
    dmean = jnp.asarray(rng.randn(B))
    dscale = jnp.asarray(rng.randn(B)) * 0.1

    f = jax.jit(
        lambda m, mu, sc: pq.moment_quadrature_pallas(
            m, mu, sc, block_b=B, interpret=True
        )
    )
    (_, _), (dw_i, dx_i) = jax.jit(
        lambda p, t: jax.jvp(pq.moment_quadrature_fused, p, t)
    )((ms, mean, scale), (dms, dmean, dscale))
    eps = 1e-6
    wp, xp = f(ms + eps * dms, mean + eps * dmean, scale + eps * dscale)
    wm, xm = f(ms - eps * dms, mean - eps * dmean, scale - eps * dscale)
    np.testing.assert_allclose(
        np.asarray(dw_i), np.asarray((wp - wm) / (2 * eps)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dx_i), np.asarray((xp - xm) / (2 * eps)), atol=1e-6
    )


def test_nd_k_kernel_oracle_matches_xla():
    """The column-layout K-builder kernel body (jnp oracle; the
    compiled kernel is validated on hardware by
    ``tests/test_tpu_hardware.py`` — pallas interpret mode hangs XLA's
    CPU compiler on the N-D kernels, so the interpret plumbing is
    covered by the 1D tests above only)."""
    from mfs_tpu.multi_dims.multi_indices import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
    )
    from mfs_tpu.multi_dims.moments import raw_moments_mvn_kan_all
    import mfs_tpu.ops.doublefloat as dfm

    N, d, B = 5, 2, 4  # s = 15: above the fused kernel's MAX_S gate
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    s = inds.shape[1]
    rng = np.random.RandomState(0)
    mean = jnp.asarray(0.3 * rng.randn(B, d))
    a = rng.randn(B, d, d)
    cov = jnp.asarray(
        np.einsum("bij,bkj->bik", a, a) * 0.1 + 0.5 * np.eye(d)
    )
    ms = raw_moments_mvn_kan_all(mean, cov, mis)

    # run the kernel body as jnp via the _ArrayRef shim
    z = ms.shape[-1]
    ms_df = dfm.from_f64(jnp.asarray(ms).T)
    key = tuple(int(v) for v in np.asarray(inds, np.int64).reshape(-1))
    oh = jnp.asarray(pqnd._nd_onehots(key, d, s, z).reshape(-1, z))
    outs = [pqnd._ArrayRef(shape=(d * s * s, B)) for _ in range(2)]
    pqnd._nd_k_kernel(
        d, s, pqnd._ArrayRef(oh),
        pqnd._ArrayRef(ms_df.hi.astype(jnp.float32)),
        pqnd._ArrayRef(ms_df.lo.astype(jnp.float32)),
        *outs,
    )
    Ks = dfm.to_f64(dfm.DF(outs[0].value, outs[1].value))
    Ks = Ks.T.reshape(B, d, s, s)

    G = ms[..., np.asarray(inds)[0]]
    R = jax.lax.linalg.cholesky(G)
    Hs = ms[..., np.asarray(inds)[1:]]
    Rb = jnp.broadcast_to(R[:, None], Hs.shape)
    Ko = jax.lax.linalg.triangular_solve(
        Rb,
        jax.lax.linalg.triangular_solve(Rb, Hs, left_side=True, lower=True),
        left_side=False, lower=True, transpose_a=True,
    )
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(Ko), atol=1e-10)


def test_interpret_quadrature_jitter():
    """Gram jitter: regularised kernel stays close at benign inputs and
    the jittered build is a distinct compiled program (lru key)."""
    N, B = 4, 8
    ms = _mixture_moments(2 * N, B)
    w0, x0 = jax.jit(
        lambda m: pq.moment_quadrature_pallas(m, block_b=8, interpret=True)
    )(ms)
    w1, x1 = jax.jit(
        lambda m: pq.moment_quadrature_pallas(
            m, block_b=8, interpret=True, jitter=1e-6
        )
    )(ms)
    assert bool(jnp.isfinite(w1).all() and jnp.isfinite(x1).all())
    # jitter=1e-6 on the unit-diagonal equilibrated Gram perturbs the
    # rule by O(jitter) at well-conditioned inputs...
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-4)
    # ...but must actually regularise (not be a silent no-op).
    assert float(jnp.max(jnp.abs(x1 - x0))) > 0.0


def test_filter_quad_jitter_kwarg(monkeypatch):
    """quad_jitter reaches the kernel through the public filter API."""
    monkeypatch.setattr(pq, "INTERPRET", True)
    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    N, B, T = 3, 2, 4
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )
    ic = model.init_cond
    xs = model.simulate(jax.random.PRNGKey(0), B)[:, :T]
    ys = jax.random.bernoulli(
        jax.random.PRNGKey(1), model.emission(xs)
    ).astype(xs.dtype).T
    cms0 = jnp.broadcast_to(ic.cms, (B, 2 * N))
    mean0 = ic.mean * jnp.ones(B)
    import mfs_tpu.ops.pallas_quadrature as _pq

    _pq._build_kernel.cache_clear()
    cmss0, _, nell0 = moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        cms0, mean0, ys, eigh_impl="pallas",
    )
    cmss1, _, nell1 = moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        cms0, mean0, ys, eigh_impl="pallas", quad_jitter=1e-7,
    )
    assert bool(jnp.isfinite(cmss1).all() and jnp.isfinite(nell1).all())
    np.testing.assert_allclose(
        np.asarray(nell1), np.asarray(nell0), rtol=1e-4
    )


def test_staged_k_builder_interpret(monkeypatch):
    """Staged multi-call K-builder == monolithic kernel, including the
    panelled left-looking LDL and chunked solves (production triggers
    are s > 28 / s > 36; forced here at s = 6 so interpret mode stays
    cheap)."""
    import numpy as _np

    from mfs_tpu.multi_dims.multi_indices import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
    )
    from mfs_tpu.multi_dims.moments import raw_moments_mvn_kan_all

    monkeypatch.setattr(pqnd, "_LDL_MAX_S_SINGLE", 4)   # force panels
    monkeypatch.setattr(pqnd, "_STAGED_ROWOPS", 12)     # force chunking
    pqnd._build_staged_kernels.cache_clear()
    try:
        N, d, B = 3, 2, 4
        mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
        inds = gram_and_hankel_indices_graded_lexico(N, d)
        rng = _np.random.RandomState(0)
        cov = _np.eye(d) * 0.5 + 0.1
        ms1 = raw_moments_mvn_kan_all(jnp.zeros(d), jnp.asarray(cov), mis)
        ms = jnp.broadcast_to(ms1, (B,) + ms1.shape) * (
            1.0 + 0.01 * jnp.asarray(rng.rand(B))[:, None]
        )
        K_staged = pqnd.nd_k_pallas_staged(
            ms, inds, block_b=8, interpret=True
        )
        K_mono = pqnd.nd_k_pallas(ms, inds, block_b=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(K_staged), np.asarray(K_mono), rtol=0, atol=1e-12
        )
    finally:
        pqnd._build_staged_kernels.cache_clear()
