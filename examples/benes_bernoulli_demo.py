"""Walkthrough: filtering the Beneš–Bernoulli model with moments.

Script equivalent of the reference's ``examples/benes_bernoulli.ipynb``:
simulate, filter in all three moment modes, recover the posterior
density from the filtered moments, and compare against the brute-force
grid truth.  Run: ``python examples/benes_bernoulli_demo.py``.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from mfs_tpu.filters.grid import brute_force_filter
from mfs_tpu.models import benes_bernoulli
from mfs_tpu.one_dim.filtering import (
    moment_filter_cms,
    moment_filter_rms,
    moment_filter_scms,
)
from mfs_tpu.one_dim.moments import sms_to_cumulants
from mfs_tpu.one_dim.pdf_approximations import gram_charlier
from mfs_tpu.sde import sde_cond_moments_tme_normal

N = 8
model = benes_bernoulli(N=N)

# --- simulate one trajectory + measurements --------------------------------
key = jax.random.PRNGKey(0)
xs = model.simulate(key, 1)[0]  # (T,)
ys = jax.random.bernoulli(jax.random.PRNGKey(1), model.emission(xs)).astype(xs.dtype)

# --- the three moment representations are the same filter ------------------
trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 3, N)
ic = model.init_cond

rmss, nell_r = moment_filter_rms(trans.rms, model.measurement_cond_pdf, ic.rms, ys)
cmss, means_c, nell_c = moment_filter_cms(
    trans.cms, trans.mean, model.measurement_cond_pdf, ic.cms, ic.mean, ys
)
scmss, means_s, scales_s, nell_s = moment_filter_scms(
    trans.scms, trans.mean_var, model.measurement_cond_pdf,
    ic.scms, ic.mean, jnp.sqrt(ic.variance), ys,
)
print(f"nell  raw={float(nell_r):.6f}  central={float(nell_c):.6f}  "
      f"scaled={float(nell_s):.6f}   (identical up to rounding)")

# --- posterior density at the final time ------------------------------------
ks = sms_to_cumulants(scmss[-1], means_s[-1], scales_s[-1])
pdf = gram_charlier(ks)
grid = jnp.linspace(-4.0, 4.0, 1000)
truth = brute_force_filter(
    model.drift, model.dispersion, model.measurement_cond_pdf,
    ic.pdf(grid), grid, ys, model.dt, integration_steps=50,
    pred_method="chapman-tme-3",
)[-1]
err = float(jnp.abs(pdf(grid) - truth).max())
print(f"Gram–Charlier recovery of p(x_T | y_1:T): max error vs grid truth {err:.4f}")

# --- a 512-trial ensemble is just a batch axis ------------------------------
B = 512
xss = model.simulate(jax.random.PRNGKey(2), B)
yss = jax.random.bernoulli(jax.random.PRNGKey(3), model.emission(xss)).astype(xss.dtype)
rms0 = jnp.broadcast_to(ic.rms, (B, 2 * N))
rmss_b, nells = jax.jit(
    lambda r0, y: moment_filter_rms(trans.rms, model.measurement_cond_pdf, r0, y)
)(rms0, jnp.swapaxes(yss, 0, 1))
print(f"ensemble of {B} trials: moments {rmss_b.shape}, mean nell {float(nells.mean()):.3f}")
