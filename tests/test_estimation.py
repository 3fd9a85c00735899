"""Parameter estimation through the differentiable filter + PCRLB."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from mfs_tpu.estimation import fit_mle_optax, fit_mle_scipy
from mfs_tpu.filters.gaussian import kf
from mfs_tpu.one_dim.filtering import moment_filter_rms
from mfs_tpu.sde.transitions import _normal_closure_factory
from mfs_tpu.utils.gaussian import normal_raw_moments_all
from mfs_tpu.utils.pcrlb import posterior_cramer_rao

# Discrete linear-Gaussian model with unknown transition coefficient.
F_TRUE, Q_VAR, XI = 0.85, 0.3, 0.4
M0, V0 = 0.0, 1.0
T = 300
N = 4


def _simulate(key):
    ks, ko = jax.random.split(key)
    steps = jax.random.normal(ks, (T,))
    noise = jax.random.normal(ko, (T,))
    xs = []
    x = M0
    for t in range(T):
        x = F_TRUE * x + math.sqrt(Q_VAR) * steps[t]
        xs.append(x)
    xs = jnp.stack(xs)
    return xs, xs + math.sqrt(XI) * noise


def _nell_fn(ys):
    rms0 = normal_raw_moments_all(M0, V0, 2 * N)

    def meas_pdf(y, x):
        return jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    def nell(params):
        f = jnp.tanh(params[0])  # keep |F| < 1
        trans = _normal_closure_factory(
            lambda x: (f * x, Q_VAR * jnp.ones_like(x)), 2 * N
        )
        _, out = moment_filter_rms(trans.rms, meas_pdf, rms0, ys)
        return out

    return nell


def test_mle_scipy_recovers_coefficient():
    _, ys = _simulate(jax.random.PRNGKey(11))
    nell = _nell_fn(ys)
    res = fit_mle_scipy(nell, jnp.array([0.1]))
    f_hat = float(jnp.tanh(res.x[0]))
    assert abs(f_hat - F_TRUE) < 0.1, f_hat
    # The fitted nell beats the initial guess.
    assert res.fun < float(nell(jnp.array([0.1])))


def test_mle_optax_matches_scipy():
    _, ys = _simulate(jax.random.PRNGKey(11))
    nell = _nell_fn(ys)
    params, losses = fit_mle_optax(nell, jnp.array([0.1]), num_steps=40)
    res = fit_mle_scipy(nell, jnp.array([0.1]))
    np.testing.assert_allclose(float(losses[-1]), res.fun, rtol=1e-5)
    np.testing.assert_allclose(
        float(jnp.tanh(params[0])), float(jnp.tanh(res.x[0])), atol=1e-3
    )


def test_mle_optax_chunked_matches_single_dispatch():
    """Segmented dispatches (chunk_steps) must retrace the exact same
    optimiser trajectory as the one-scan run — the optimiser state is
    the carry, so splitting is purely a dispatch-size choice."""
    _, ys = _simulate(jax.random.PRNGKey(11))
    nell = _nell_fn(ys)
    p_full, l_full = fit_mle_optax(nell, jnp.array([0.1]), num_steps=12)
    p_chunk, l_chunk = fit_mle_optax(
        nell, jnp.array([0.1]), num_steps=12, chunk_steps=4
    )
    np.testing.assert_allclose(np.asarray(p_chunk), np.asarray(p_full), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(l_chunk), np.asarray(l_full), rtol=1e-12)
    assert l_chunk.shape == (12,)

    import pytest

    with pytest.raises(ValueError):
        fit_mle_optax(nell, jnp.array([0.1]), num_steps=12, chunk_steps=5)


def test_pcrlb_matches_kf_covariance():
    """On a linear-Gaussian model the PCRLB equals the KF covariance."""
    key = jax.random.PRNGKey(5)
    n_mc = 4000
    t_len = 25
    ks, ko = jax.random.split(key)
    x0 = M0 + jnp.sqrt(V0) * jax.random.normal(ks, (n_mc, 1))
    steps = jax.random.normal(ko, (t_len, n_mc, 1))
    noise = jax.random.normal(jax.random.PRNGKey(6), (t_len, n_mc, 1))
    xs = [x0]
    for t in range(t_len):
        xs.append(F_TRUE * xs[-1] + math.sqrt(Q_VAR) * steps[t])
    trajs = jnp.stack(xs)  # (T + 1, n, 1)
    ys = trajs[1:] + math.sqrt(XI) * noise

    logpdf_trans = lambda xt, xs_: -0.5 * (xt[0] - F_TRUE * xs_[0]) ** 2 / Q_VAR
    logpdf_lik = lambda y, x: -0.5 * (y[0] - x[0]) ** 2 / XI
    js = posterior_cramer_rao(
        trajs, ys, jnp.array([[1.0 / V0]]), logpdf_trans, logpdf_lik
    )
    pcrlb = 1.0 / np.asarray(js)[:, 0, 0]

    _, vfs, _ = kf(
        jnp.array([[F_TRUE]]),
        jnp.array([[Q_VAR]]),
        jnp.array([[1.0]]),
        jnp.array([[XI]]),
        jnp.array([M0]),
        jnp.array([[V0]]),
        ys[:, 0],
    )
    np.testing.assert_allclose(pcrlb, np.asarray(vfs)[:, 0, 0], rtol=1e-6)


def test_lbfgs_batched_per_trial_convergence():
    """Per-trial batched L-BFGS: every independent problem reaches its
    own optimum (checked vs closed-form), converged trials freeze, the
    host loop early-stops."""
    from mfs_tpu.estimation import lbfgs_batched

    B, p = 12, 2
    opts = jax.random.normal(jax.random.PRNGKey(0), (B, p)) * 2.0
    curv = 0.5 + jax.random.uniform(jax.random.PRNGKey(1), (B, p)) * 6.0

    def nell(P):
        return jnp.sum(curv * (P - opts) ** 2, -1)

    P, info = lbfgs_batched(
        nell, jnp.zeros((B, p)), max_steps=100, chunk_steps=10, gtol=1e-10
    )
    assert bool(np.asarray(info["converged"]).all())
    # pure quadratic: the optimum is `opts` exactly
    np.testing.assert_allclose(np.asarray(P), np.asarray(opts), atol=1e-9)
    # early stop: nowhere near the 100-step cap
    assert info["segments_run"] < 10


def test_fit_mle_batched_matches_closed_form():
    """vmapped-optax driver agrees with the hand-vectorised one."""
    from mfs_tpu.estimation import fit_mle_batched, lbfgs_batched

    B, p = 6, 2
    opts = jnp.linspace(-1.0, 2.0, B * p).reshape(B, p)

    def per_trial(q, o):
        return jnp.sum((q - o) ** 2) + 0.1 * jnp.sum(jnp.cos(q))

    P1, info1 = fit_mle_batched(
        per_trial, jnp.zeros((B, p)), opts, max_steps=60, chunk_steps=10,
        gtol=1e-9,
    )
    P2, info2 = lbfgs_batched(
        lambda P: jax.vmap(per_trial)(P, opts), jnp.zeros((B, p)),
        max_steps=60, chunk_steps=10, gtol=1e-9,
    )
    assert bool(np.asarray(info1["converged"]).all())
    assert bool(np.asarray(info2["converged"]).all())
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-6)
