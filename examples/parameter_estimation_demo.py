"""Walkthrough: maximum-likelihood parameter estimation via the
differentiable moment-filter likelihood.

Script equivalent of the reference's
``examples/parameter_estimation.ipynb`` (reference
``examples/README.md:3-7``): the moment filter returns a negative
log-likelihood that is differentiable in the model parameters, so MLE
is plain gradient descent through the whole filter — no particle
smoothing, no EM.

Model: the Well–Poisson SDE (reference ``mfs/one_dim/ss_models.py:59-93``)

    dX = X (1 - p1 X^2) dt + dW,     Y_k ~ Poisson(softplus(p2 X_k)),

with unknown (p1, p2); true values (3, 3).  Run:
``python examples/parameter_estimation_demo.py``
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from mfs_tpu.models import well_poisson
from mfs_tpu.one_dim.filtering import moment_filter_cms
from mfs_tpu.sde import sde_cond_moments_euler

TRUE_P1, TRUE_P2 = 3.0, 3.0
N = 4  # moment order: 2N-1 = 7 moments carried
T = 1000

# --- simulate data at the true parameters ----------------------------------
dt, T_full, ts, ic, drift, disp, emission, meas_pmf, simulate = well_poisson(
    TRUE_P1, N=N
)
key_sim, key_meas = jax.random.split(jax.random.PRNGKey(0))
xs = simulate(key_sim, 1, 20)[0, :T]
ys = jax.random.poisson(key_meas, emission(xs, TRUE_P2)).astype(xs.dtype)


# --- the differentiable negative log-likelihood ----------------------------
def nell(params):
    # softplus keeps both parameters positive during optimisation
    p1 = jnp.logaddexp(0.0, params[0])
    p2 = jnp.logaddexp(0.0, params[1])
    trans = sde_cond_moments_euler(lambda u: drift(u, p1), disp, dt, N)
    _, _, out = moment_filter_cms(
        trans.cms, trans.mean,
        lambda y, u: meas_pmf(y, u, p2),
        ic.cms, ic.mean, ys,
    )
    return out


# --- quasi-Newton MLE straight through the filter --------------------------
# BFGS (the reference drives SciPy L-BFGS-B through jaxopt:
# ``dardel/parameter_estimation/mf.py:37-73``); the nell surface is
# nearly flat in p1, where first-order methods crawl.
from jax.scipy.optimize import minimize

params0 = jnp.array([0.5, 0.5])  # softplus^-1 starting guess ~ (0.97, 0.97)
res = minimize(nell, params0, method="BFGS", options=dict(maxiter=200))
params = res.x
print(f"BFGS: converged={bool(res.success)} iters={int(res.nit)} "
      f"nell={float(res.fun):.4f}")

p_hat = jnp.logaddexp(0.0, params)
print(f"\nMLE:   p1={float(p_hat[0]):.4f}  p2={float(p_hat[1]):.4f}")
print(f"truth: p1={TRUE_P1:.4f}  p2={TRUE_P2:.4f}")

# Single-trajectory MLEs are high-variance here (especially p1 — the
# drift parameter is only weakly identified through the Poisson
# emission); what the optimiser guarantees is a likelihood at least as
# good as the truth's.  The Monte-Carlo distribution over many
# trajectories concentrates at the truth: run
# ``experiments/parameter_estimation.py --trials 100`` and
# ``postprocessing/plot_parameter_estimation.py`` to see it.
truth_inv = jnp.log(jnp.expm1(jnp.array([TRUE_P1, TRUE_P2])))
nell_truth = float(nell(truth_inv))
print(f"nell at MLE:   {float(res.fun):.4f}")
print(f"nell at truth: {nell_truth:.4f}")
assert float(res.fun) <= nell_truth + 1e-6, (
    "the fitted likelihood must be at least as good as the truth's"
)
print("OK")
