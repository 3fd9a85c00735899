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
