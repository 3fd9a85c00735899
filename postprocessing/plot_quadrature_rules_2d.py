"""2D moment-matched quadrature visualisation (paper Fig. 2).

Self-contained: for a correlated 2D Gaussian, build the N-D
moment-matched quadrature and scatter its nodes (sized by weight) over
the density contours.

Counterpart of reference
``reproduce_paper_plots/plot_quadrature_rules_2d.py``.
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

    from mfs_tpu.multi_dims import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
    )
    from mfs_tpu.multi_dims.moments import raw_moments_mvn_kan
    from mfs_tpu.multi_dims.quadrature import moment_quadrature_nd

    mean = np.array([0.5, -0.3])
    cov = np.array([[1.0, 0.6], [0.6, 0.8]])

    fig, axes = plt.subplots(1, 3, figsize=(13, 4), sharex=True, sharey=True)
    for ax, N in zip(axes, (2, 3, 4)):
        mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
        inds = gram_and_hankel_indices_graded_lexico(N, 2)
        ms = jnp.asarray(
            [raw_moments_mvn_kan(mean, cov, mi) for mi in mis]
        )
        w, nodes = moment_quadrature_nd(ms, inds)
        w, nodes = np.asarray(w), np.asarray(nodes)

        # density contours
        g = np.linspace(-3, 3.5, 120)
        X, Y = np.meshgrid(g, g)
        P = np.stack([X - mean[0], Y - mean[1]], axis=-1)
        icov = np.linalg.inv(cov)
        dens = np.exp(-0.5 * np.einsum("...i,ij,...j->...", P, icov, P))
        ax.contour(X, Y, dens, levels=6, colors="gray", linewidths=0.7)
        keep = w > 1e-12
        ax.scatter(
            nodes[keep, 0], nodes[keep, 1], s=2e3 * w[keep],
            c="C0", alpha=0.75, edgecolors="k", linewidths=0.4,
        )
        ax.set_title(f"N = {N}: {int(keep.sum())} nodes w > 1e-12")
        # moment reproduction check: E[X1], E[X2], E[X1 X2]
        got = nodes.T @ w
        print(f"N={N}: node-weighted mean {got} vs {mean}, total w {w.sum():.6f}")
    common.savefig(fig, "quadrature_rules_2d")


if __name__ == "__main__":
    main()
