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


def test_fused_grad_vs_finite_difference():
    """Filter-likelihood gradient through the fused kernel (implicit-
    function JVP) vs f64 central finite differences — the VERIFY-drive
    assertion promoted to the pytest tier (VERDICT r03 item 7)."""
    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.sde import sde_cond_moments_euler

    N, B, T = 8, 64, 30
    model = benes_bernoulli(N=N)
    xs = model.simulate(jax.random.PRNGKey(0), B)[:, :T]
    ys = jax.random.bernoulli(
        jax.random.PRNGKey(1), model.emission(xs)
    ).astype(xs.dtype).T
    ic = model.init_cond

    def nell_of(theta):
        trans = sde_cond_moments_euler(
            lambda u: jnp.tanh(theta * u), model.dispersion, model.dt, N
        )
        _, _, nell = moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            jnp.broadcast_to(ic.cms, (B, 2 * N)), ic.mean * jnp.ones(B),
            ys, eigh_impl="pallas",
        )
        return jnp.sum(nell)

    g = float(jax.jit(jax.grad(nell_of))(jnp.asarray(1.0)))
    eps = 1e-5
    f = jax.jit(nell_of)
    fd = (float(f(jnp.asarray(1.0 + eps))) - float(f(jnp.asarray(1.0 - eps)))) / (
        2 * eps
    )
    assert abs(g - fd) / (abs(fd) + 1e-12) < 1e-4, (g, fd)


def test_nd_pallas_vs_refined_nell():
    """2D prey-predator nell agreement between the compiled ND pallas
    path and the refined XLA path on hardware (small shapes)."""
    from mfs_tpu.models import prey_predator
    from mfs_tpu.multi_dims import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_cms,
        poly_tme_nd,
    )

    N, B, T = 3, 64, 30
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    model = prey_predator(mis)
    poly = poly_tme_nd(
        model.drift, model.dispersion, model.dt, 2, mis,
        drift_deg=2, dispersion_deg=1,
    )
    ic = model.init_cond
    _, _, yss = model.simulate(jax.random.PRNGKey(2), B)
    ys = yss[:T]
    cms0 = jnp.broadcast_to(ic.cms, (B,) + ic.cms.shape)
    mean0 = jnp.broadcast_to(ic.mean, (B, 2))

    nells = {}
    for impl in ("pallas", "refined"):
        _, _, nell = jax.jit(
            lambda c0, m0, y, impl=impl: moment_filter_nd_cms(
                poly.cms, poly.mean, model.measurement_cond_pdf, y,
                (mis, inds), c0, m0, eigh_impl=impl,
                predict_fn=poly.predict_cms,
            )
        )(cms0, mean0, ys)
        nells[impl] = np.asarray(nell)
    finite = np.isfinite(nells["pallas"]) & np.isfinite(nells["refined"])
    assert finite.mean() > 0.9
    rel = np.max(
        np.abs(nells["pallas"][finite] - nells["refined"][finite])
        / (np.abs(nells["refined"][finite]) + 1e-12)
    )
    assert rel < 1e-6, f"nell disagreement {rel:.2e}"


def test_rescue_round_trip():
    """Two-tier rescue on hardware: diverged fused-kernel trials are
    recovered by the robust path and spliced back (small N=13 batch —
    large enough that some trials genuinely diverge sometimes, but the
    assertion holds either way)."""
    import contextlib

    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.parallel.ensemble import rescue_diverged
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    N, B, T = 13, 128, 60
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )
    xs = model.simulate(jax.random.PRNGKey(3), B)[:, :T]
    ys = jax.random.bernoulli(
        jax.random.PRNGKey(4), model.emission(xs)
    ).astype(xs.dtype).T
    ic = model.init_cond

    def make_run(impl, device=None):
        def run(ys_in):
            ctx = (
                jax.default_device(device)
                if device is not None
                else contextlib.nullcontext()
            )
            if device is not None:
                ys_in = jax.device_put(jnp.asarray(ys_in), device)
            with ctx:
                n = ys_in.shape[1]
                mss, means, nell = jax.jit(
                    lambda y, impl=impl: moment_filter_cms(
                        trans.cms, trans.mean, model.measurement_cond_pdf,
                        jnp.broadcast_to(ic.cms, (n, 2 * N)),
                        ic.mean * jnp.ones(n), y,
                        stable=(impl != "pallas"), eigh_impl=impl,
                    )
                )(ys_in)
                return dict(moments=mss, means=means, nell=nell)

        return run

    def finite_fn(out):
        m = out["moments"]
        return np.asarray(
            jnp.isfinite(m.reshape(m.shape[0], m.shape[1], -1)).all(axis=(0, 2))
        )

    fast = make_run("pallas")
    robust = make_run("xla", device=jax.devices("cpu")[0])
    merged, finite, rescued = rescue_diverged(
        fast, robust, ys, finite_fn,
        {"moments": 1, "means": 1, "nell": 0},
    )
    raw_finite = finite_fn(fast(ys))
    # rescue never loses trials, and whatever it rescued is now finite
    assert finite.sum() >= raw_finite.sum()
    assert rescued == int(finite.sum() - raw_finite.sum())
    assert np.isfinite(merged["nell"][finite]).all()


def test_auto_dispatch_on_tpu():
    """On the TPU platform the measured policy routes production
    batches to the fused kernel and passes explicit choices through."""
    from mfs_tpu.ops.dispatch import resolve_impl_1d, resolve_impl_nd

    assert resolve_impl_1d(15, 4096) == "pallas"
    assert resolve_impl_nd(6, 512) == "pallas"
    assert resolve_impl_1d(15, 4096, "xla") == "xla"


def test_jitter_rescue_tier_on_tpu():
    """Round-5 rescue design on hardware: the Gram-jittered fused
    kernel (quad_jitter=1e-8) as the first robust tier recovers every
    trial the clean kernel loses at N=15 (measured 265/265 at B=4096,
    tools/PROBE_RESCUE3.json), with the host-f64 pass as an (unused in
    practice) final fallback."""
    import contextlib

    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.parallel.ensemble import rescue_diverged
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    N, B, T = 15, 512, 100
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )
    xs = model.simulate(jax.random.PRNGKey(11), 8)
    ys = jax.random.bernoulli(
        jax.random.PRNGKey(12), model.emission(jnp.tile(xs, (B // 8, 1)))
    ).astype(jnp.float64).T[:T]
    ic = model.init_cond

    def make_run(impl, device=None, jitter=0.0):
        def run(ys_in):
            ctx = (
                jax.default_device(device)
                if device is not None
                else contextlib.nullcontext()
            )
            if device is not None:
                ys_in = jax.device_put(jnp.asarray(ys_in), device)
            with ctx:
                n = ys_in.shape[1]
                mss, means, nell = jax.jit(
                    lambda y, impl=impl: moment_filter_cms(
                        trans.cms, trans.mean, model.measurement_cond_pdf,
                        jnp.broadcast_to(ic.cms, (n, 2 * N)),
                        ic.mean * jnp.ones(n), y,
                        stable=(impl != "pallas"), eigh_impl=impl,
                        quad_jitter=jitter,
                    )
                )(ys_in)
                return dict(moments=mss, means=means, nell=nell)

        return run

    def finite_fn(out):
        m = out["moments"]
        return np.asarray(
            jnp.isfinite(m.reshape(m.shape[0], m.shape[1], -1)).all(axis=(0, 2))
        )

    fast = make_run("pallas")
    tiers = [
        make_run("pallas", jitter=1e-8),
        make_run("xla", device=jax.devices("cpu")[0]),
    ]
    merged, finite, rescued = rescue_diverged(
        fast, tiers, ys, finite_fn,
        {"moments": 1, "means": 1, "nell": 0},
    )
    raw_finite = finite_fn(fast(ys))
    assert raw_finite.sum() < B, "expected some tier-0 losses at N=15"
    assert finite.all(), (
        f"jitter+host tiers left {B - finite.sum()} of {B} trials diverged"
    )
    assert rescued == int(B - raw_finite.sum())
    assert np.isfinite(merged["nell"]).all()
