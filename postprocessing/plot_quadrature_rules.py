"""Moment-matched quadrature rule visualisation (paper Fig. 1).

Self-contained: for a bimodal Gaussian-sum density, build the
moment-matched Gauss quadrature at several orders N and overlay the
nodes/weights on the true density — the visual statement that the rule
places its nodes where the distribution lives.

Counterpart of reference ``reproduce_paper_plots/plot_quadrature_rules.py``.
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
    import jax.numpy as jnp

    from mfs_tpu.one_dim.quadrature import moment_quadrature
    from mfs_tpu.utils.gaussian import GaussianSum1D

    Ns = [3, 5, 8, 12]
    gs = GaussianSum1D.new(
        means=jnp.array([-1.2, 1.0]),
        variances=jnp.array([0.3, 0.2]),
        weights=jnp.array([0.4, 0.6]),
        N=max(Ns),
    )
    grid = jnp.linspace(-4.0, 4.0, 800)
    pdf = gs.pdf(grid)

    fig, axes = plt.subplots(1, len(Ns), figsize=(4 * len(Ns), 3), sharey=True)
    for ax, N in zip(axes, Ns):
        w, x = moment_quadrature(gs.rms[: 2 * N], sort_nodes=True)
        ax.plot(np.asarray(grid), np.asarray(pdf), "k-", lw=1)
        ax.stem(np.asarray(x), np.asarray(w), basefmt=" ")
        ax.set_title(f"N = {N} ({N} nodes)")
        ax.set_xlim(-4, 4)
        # the rule reproduces the first 2N moments exactly
        errs = [
            abs(float(jnp.sum(w * x**p) - gs.rms[p]))
            for p in range(2 * N)
        ]
        print(f"N={N}: max moment reproduction error {max(errs):.2e}")
    axes[0].set_ylabel("density / weight")
    common.savefig(fig, "quadrature_rules")


if __name__ == "__main__":
    main()
