"""Verify drive: flagship Beneš–Bernoulli flow on the real TPU.

Run from anywhere: ``JAX_PLATFORMS='' python tools/verify_drive.py``.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mfs_tpu; mfs_tpu.enable_x64()
import jax, jax.numpy as jnp, numpy as np

print("devices:", jax.devices(), flush=True)

from mfs_tpu.models import benes_bernoulli
from mfs_tpu.sde import sde_cond_moments_tme_normal
from mfs_tpu.one_dim.filtering import (
    moment_filter_rms, moment_filter_cms, moment_filter_scms,
)
from mfs_tpu.filters.grid import brute_force_filter

key = jax.random.PRNGKey(0)
model8 = benes_bernoulli(N=8)
xs = model8.simulate(key, 1)[0]
ys = jax.random.bernoulli(jax.random.PRNGKey(1), model8.emission(xs)).astype(xs.dtype)

# truth
grid = jnp.linspace(-6.0, 6.0, 2000)
init_ps = jnp.exp(-0.5 * (grid - model8.init_cond.mean) ** 2
                  / model8.init_cond.variance)
init_ps = init_ps / jnp.trapezoid(init_ps, grid)
pss = brute_force_filter(
    model8.drift, model8.dispersion, model8.measurement_cond_pdf,
    init_ps, grid, ys, model8.dt, integration_steps=100,
    pred_method="chapman-tme-3",
)
true_means = jnp.trapezoid(pss * grid, grid, axis=-1)
true_vars = jnp.trapezoid(pss * grid**2, grid, axis=-1) - true_means**2

for N in (3, 5, 8, 11):
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 3, N)
    rmss, nell = moment_filter_rms(
        trans.rms, model.measurement_cond_pdf, model.init_cond.rms, ys,
        eigh_impl="auto",
    )
    means = rmss[..., 1]; var = rmss[..., 2] - means**2
    rmse = float(jnp.sqrt(jnp.mean((means - true_means) ** 2)))
    print(f"N={N:2d} finite={bool(jnp.isfinite(rmss).all())} "
          f"mean-RMSE vs grid={rmse:.5f} nell={float(nell):.6f}", flush=True)

# mode agreement at N=8 + the new quad_jitter path
model = model8
trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 3, 8)
ic = model.init_cond
_, nell_r = moment_filter_rms(trans.rms, model.measurement_cond_pdf, ic.rms, ys)
_, _, nell_c = moment_filter_cms(
    trans.cms, trans.mean, model.measurement_cond_pdf, ic.cms, ic.mean, ys)
_, _, _, nell_s = moment_filter_scms(
    trans.scms, trans.mean_var, model.measurement_cond_pdf,
    ic.scms, ic.mean, jnp.sqrt(ic.variance), ys)
print(f"nell rms/cms/scms: {float(nell_r):.12f} {float(nell_c):.12f} "
      f"{float(nell_s):.12f}", flush=True)

_, _, nell_j = moment_filter_cms(
    trans.cms, trans.mean, model.measurement_cond_pdf, ic.cms, ic.mean, ys,
    eigh_impl="pallas", quad_jitter=1e-8)
print(f"nell cms jitter1e-8: {float(nell_j):.12f} "
      f"(dev {abs(float(nell_j)-float(nell_c)):.2e})", flush=True)

# N=15 ill-conditioned regime, batched, kernel + jittered kernel
N = 15
model = benes_bernoulli(N=N)
trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 2, N)
B = 512
xss = model.simulate(jax.random.PRNGKey(2), 8)
probs = model.emission(jnp.tile(xss, (B // 8, 1)))
ysb = jax.random.bernoulli(jax.random.PRNGKey(3), probs).astype(jnp.float64).T
cms0 = jnp.broadcast_to(model.init_cond.cms, (B, 2 * N))
mean0 = model.init_cond.mean * jnp.ones(B)
cmss, means, nell = moment_filter_cms(
    trans.cms, trans.mean, model.measurement_cond_pdf, cms0, mean0, ysb,
    eigh_impl="pallas")
fin = np.asarray(jnp.isfinite(cmss[-1]).all(-1) & jnp.isfinite(nell))
cmss_j, means_j, nell_j = moment_filter_cms(
    trans.cms, trans.mean, model.measurement_cond_pdf, cms0, mean0, ysb,
    eigh_impl="pallas", quad_jitter=1e-8)
fin_j = np.asarray(jnp.isfinite(cmss_j[-1]).all(-1) & jnp.isfinite(nell_j))
print(f"N=15 B=512 kernel finite {fin.sum()}/{B}; jitter1e-8 finite "
      f"{fin_j.sum()}/{B}; union {np.maximum(fin, fin_j).sum()}/{B}", flush=True)
print("PASS" if fin_j.sum() == B else "CHECK", flush=True)
