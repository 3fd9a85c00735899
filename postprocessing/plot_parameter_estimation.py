"""Parameter-estimation study summary (paper Fig. 6).

Reads ``experiments/parameter_estimation.py`` artifacts (per-trial MLE
estimates of the Well–Poisson parameters) and shows their Monte-Carlo
distribution against the true values, with divergence accounting.

Counterpart of reference
``reproduce_paper_plots/plot_parameter_estimation.py``.
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib.pyplot as plt

from postprocessing import common


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--N", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--true-p1", type=float, default=3.0)
    p.add_argument("--true-p2", type=float, default=3.0)
    args = p.parse_args()

    data = common.load("parameter_estimation", f"mf_N{args.N}_s{args.seed}")
    p_hat = np.asarray(data["p_hat"])  # (trials, 2)
    kept, ndiv = common.rm_divergent(p_hat)
    print(f"trials: {p_hat.shape[0]}, divergent: {ndiv}")
    for i, truth in enumerate((args.true_p1, args.true_p2)):
        est = kept[:, i]
        print(
            f"p{i + 1}: mean={est.mean():.4f} std={est.std():.4f} "
            f"(truth {truth})"
        )

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6))
    for i, (ax, truth) in enumerate(zip(axes, (args.true_p1, args.true_p2))):
        ax.hist(kept[:, i], bins=30, color="C0", alpha=0.8)
        ax.axvline(truth, color="C3", lw=2, label="truth")
        ax.axvline(kept[:, i].mean(), color="k", ls="--", lw=1.2, label="MC mean")
        ax.set_xlabel(f"$\\hat{{p}}_{i + 1}$")
        ax.legend(fontsize=8)
    fig.suptitle(f"Well–Poisson MLE, N={args.N}, {kept.shape[0]} trials")
    common.savefig(fig, "parameter_estimation")


if __name__ == "__main__":
    main()
