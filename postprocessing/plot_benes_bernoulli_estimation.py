"""Beneš–Bernoulli filtering demonstration (paper Fig. 5).

Self-contained — no prior experiment runs needed (like the reference's
``plot_benes_bernoulli_estimation.py``): simulate one trajectory,
filter it with the moment filter at N=8, recover the filtering PDFs
from the moments (Gram–Charlier), and compare against the brute-force
grid truth at a few snapshot times plus the mean trajectory.
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib.pyplot as plt

from postprocessing import common


def main():
    common.setup_jax()
    import mfs_tpu

    mfs_tpu.enable_x64()
    import jax
    import jax.numpy as jnp

    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.one_dim.moments import sms_to_cumulants
    from mfs_tpu.one_dim.pdf_approximations import gram_charlier
    from mfs_tpu.filters.grid import brute_force_filter
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    N = 8
    model = benes_bernoulli(N=N)
    xs = model.simulate(jax.random.PRNGKey(0), 1)[0]
    ys = jax.random.bernoulli(
        jax.random.PRNGKey(1), model.emission(xs)
    ).astype(xs.dtype)

    trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 2, N)
    cmss, means, _ = jax.jit(
        lambda y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            model.init_cond.cms, model.init_cond.mean, y,
        )
    )(ys)

    grid = jnp.linspace(-4.0, 4.0, 1500)
    pss = brute_force_filter(
        model.drift, model.dispersion, model.measurement_cond_pdf,
        model.init_cond.pdf(grid), grid, ys, model.dt,
        integration_steps=100, pred_method="chapman-tme-3",
    )
    dx = float(grid[1] - grid[0])
    bf_means = np.asarray(jnp.sum(pss * grid, axis=-1) * dx)

    snapshots = [9, 39, 69, 99]
    fig, axes = plt.subplots(1, len(snapshots) + 1, figsize=(16, 3.2))
    for ax, k in zip(axes[:-1], snapshots):
        cums = sms_to_cumulants(cmss[k], means[k], 1.0)
        pdf_k = gram_charlier(cums)(grid)
        ax.plot(np.asarray(grid), np.asarray(pss[k]), "k-", label="truth (grid)")
        ax.plot(np.asarray(grid), np.asarray(pdf_k), "C0--",
                label=f"moment filter N={N}")
        ax.axvline(float(xs[k]), color="C3", lw=0.8, label="state")
        ax.set_title(f"t = {float(model.ts[k]):.2f}")
        ax.set_xlim(-3, 3)
    axes[0].legend(fontsize=7)

    ax = axes[-1]
    ts = np.asarray(model.ts)
    ax.plot(ts, np.asarray(xs), "C3-", lw=0.8, label="true state")
    ax.plot(ts, np.asarray(means), "C0-", label="moment-filter mean")
    ax.plot(ts, bf_means, "k--", lw=0.8, label="grid-truth mean")
    ax.set_xlabel("t")
    ax.legend(fontsize=7)
    ax.set_title("filtering means")
    common.savefig(fig, "benes_bernoulli_estimation")

    err = float(np.max(np.abs(np.asarray(means) - bf_means)))
    print(f"max |mf mean - grid mean| over T: {err:.5f}")


if __name__ == "__main__":
    main()
