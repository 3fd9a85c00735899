"""Prey–predator 2D filtering demonstration.

Self-contained — no prior experiment runs needed (like the reference's
``plot_prey_predator_estimation.py``): simulate one 2D stochastic
Lotka–Volterra trajectory, filter with ``moment_filter_nd_cms`` at
N=3, and plot the filtered means against the true populations.
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

    from mfs_tpu.models import prey_predator
    from mfs_tpu.multi_dims import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_cms,
        sde_cond_moments_nd_tme,
    )

    N, T = 3, 1000
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    model = prey_predator(mis)
    _, xss, yss = model.simulate(jax.random.PRNGKey(0), 1)
    xs, ys = xss[:T, 0], yss[:T, 0]

    trans = sde_cond_moments_nd_tme(
        model.drift, model.dispersion, model.dt, 2, mis
    )
    ic = model.init_cond
    cmss, means, nell = jax.jit(
        lambda y: moment_filter_nd_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf, y,
            (mis, inds), ic.cms, ic.mean,
        )
    )(ys)
    means = np.asarray(means)
    ts = np.asarray(model.ts)[:T]

    fig, axes = plt.subplots(1, 2, figsize=(10, 3.6))
    labels = ["prey $X_1$", "predator $X_2$"]
    for d, ax in enumerate(axes):
        ax.plot(ts, np.asarray(xs[:, d]), "C3-", lw=0.9, label="truth")
        ax.plot(ts, means[:, d], "C0--", lw=1.1, label=f"moment filter N={N}")
        ax.set_xlabel("t")
        ax.set_title(labels[d])
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    common.savefig(fig, "prey_predator_estimation")
    err = np.abs(means - np.asarray(xs))
    print(f"mean abs error: {err.mean():.5f}, nell: {float(nell):.3f}")


if __name__ == "__main__":
    main()
