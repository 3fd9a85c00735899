"""Trial-sharding over a device mesh (8 virtual CPU devices)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfs_tpu.one_dim.filtering import moment_filter_rms
from mfs_tpu.parallel import (
    replicate,
    run_ensemble_filter,
    shard_trials,
    sharded_nell_grad,
    trial_mesh,
)
from mfs_tpu.sde.transitions import sde_cond_moments_tme
from mfs_tpu.utils.gaussian import normal_raw_moments_all

DT, T, N, B = 1e-2, 30, 4, 16
XI = 1.0


def _model():
    drift = lambda x: -x
    disp = lambda x: 0.7
    trans = sde_cond_moments_tme(drift, disp, DT, 2, N)
    meas = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    return trans, meas


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(T, B) * 0.6)


def test_mesh_has_eight_devices():
    mesh = trial_mesh()
    assert math.prod(mesh.devices.shape) == 8


def test_sharded_filter_matches_unsharded(data):
    trans, meas = _model()
    rms0 = jnp.broadcast_to(normal_raw_moments_all(0.1, 0.5, 2 * N), (B, 2 * N))

    def filter_fn(r0, ys):
        return moment_filter_rms(trans.rms, meas, r0, ys)

    mesh = trial_mesh()
    rmss_sh, nell_sh = run_ensemble_filter(filter_fn, rms0, data, mesh)
    # sharding metadata: trial axis split over the mesh
    assert "trials" in str(rmss_sh.sharding)
    rmss, nell = jax.jit(filter_fn)(rms0, data)
    np.testing.assert_allclose(np.asarray(rmss_sh), np.asarray(rmss), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(nell_sh), np.asarray(nell), rtol=1e-12)


def test_sharded_nell_grad_matches_local(data):
    trans_builder = lambda theta: sde_cond_moments_tme(
        lambda x: -theta * x, lambda x: 0.7, DT, 2, N
    )
    meas = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)
    rms0 = jnp.broadcast_to(normal_raw_moments_all(0.1, 0.5, 2 * N), (B, 2 * N))

    def nell_fn(theta, ys):
        trans = trans_builder(theta)
        _, nell = moment_filter_rms(trans.rms, meas, rms0, ys)
        return nell  # (B,)

    mesh = trial_mesh()
    loss_sh, grad_sh = sharded_nell_grad(nell_fn, jnp.asarray(1.0), data, mesh)
    loss, grad = jax.value_and_grad(lambda t: jnp.mean(nell_fn(t, data)))(
        jnp.asarray(1.0)
    )
    np.testing.assert_allclose(float(loss_sh), float(loss), rtol=1e-12)
    np.testing.assert_allclose(float(grad_sh), float(grad), rtol=1e-10)


def test_shard_and_replicate_placement():
    mesh = trial_mesh()
    x = jnp.zeros((B, 3))
    xs = shard_trials(x, mesh)
    assert "trials" in str(xs.sharding)
    r = replicate(jnp.zeros(3), mesh)
    assert r.sharding.is_fully_replicated


def test_rescue_diverged_splices_robust_trials():
    from mfs_tpu.parallel.ensemble import rescue_diverged

    T, n, m = 4, 8, 3
    ys = jnp.arange(T * n, dtype=jnp.float64).reshape(T, n)
    bad = np.array([1, 5, 6])

    def run_fast(ys_in):
        mss = jnp.broadcast_to(ys_in[..., None], (T, ys_in.shape[1], m)) + 0.0
        mss = mss.at[:, :, :].set(mss)
        cols = jnp.isin(ys_in[0], ys[0, bad])
        mss = jnp.where(cols[None, :, None], jnp.nan, mss)
        return dict(moments=mss, nell=jnp.where(cols, jnp.nan, ys_in[0]))

    def run_robust(ys_in):
        # Rescues all but the trial whose first observation is ys[0, 6].
        mss = jnp.broadcast_to(ys_in[..., None], (T, ys_in.shape[1], m)) + 1.0
        cols = ys_in[0] == ys[0, 6]
        mss = jnp.where(cols[None, :, None], jnp.nan, mss)
        return dict(moments=mss, nell=jnp.where(cols, jnp.nan, -ys_in[0]))

    def finite_fn(out):
        mss = out["moments"]
        return np.asarray(jnp.isfinite(mss).all(axis=(0, 2)))

    merged, finite, rescued = rescue_diverged(
        run_fast, run_robust, ys, finite_fn, {"moments": 1, "nell": 0}
    )
    assert rescued == 2
    assert finite.sum() == n - 1 and not finite[6]
    # Untouched trials keep the fast output; rescued ones carry robust.
    np.testing.assert_allclose(merged["nell"][0], ys[0, 0])
    np.testing.assert_allclose(merged["nell"][1], -ys[0, 1])
    np.testing.assert_allclose(merged["nell"][5], -ys[0, 5])
    assert np.isnan(merged["nell"][6])
    np.testing.assert_allclose(
        np.asarray(merged["moments"])[:, 5],
        np.broadcast_to(np.asarray(ys)[:, 5, None] + 1.0, (T, m)),
    )
    np.testing.assert_allclose(
        np.asarray(merged["moments"])[:, 0],
        np.broadcast_to(np.asarray(ys)[:, 0, None], (T, m)),
    )

    # All-finite fast path returns untouched outputs, zero rescued.
    def run_ok(ys_in):
        return dict(
            moments=jnp.broadcast_to(ys_in[..., None], (T, ys_in.shape[1], m)),
            nell=ys_in[0],
        )

    merged2, finite2, rescued2 = rescue_diverged(
        run_ok, run_robust, ys, finite_fn, {"moments": 1, "nell": 0}
    )
    assert rescued2 == 0 and finite2.all()
