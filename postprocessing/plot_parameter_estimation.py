"""Parameter-estimation study summary (paper Fig. 6).

Reads the ``experiments/parameter_estimation*.py`` artifacts (per-trial
MLE estimates of the Well–Poisson parameters, for the moment filter AND
the GHF/EKF/PF baseline estimators on identical trials) and shows their
Monte-Carlo distributions against the true values, with divergence
accounting and a per-method mean±std table.

Counterpart of reference
``reproduce_paper_plots/plot_parameter_estimation.py`` (which overlays
the same three estimator families).
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

    methods = [("mf", f"mf_N{args.N}_s{args.seed}", f"MF (N={args.N})")]
    for m in ("ghf", "ekf", "pf"):
        methods.append((m, f"{m}_s{args.seed}", m.upper()))

    results = {}
    for key, name, label in methods:
        try:
            data = common.load("parameter_estimation", name)
        except FileNotFoundError:
            print(f"[skip] no artifact for {name}")
            continue
        p_hat = np.asarray(data["p_hat"])  # (trials, 2)
        kept, ndiv = common.rm_divergent(p_hat)
        results[key] = (kept, ndiv, label)
        print(f"{label}: trials={p_hat.shape[0]} divergent={ndiv}")
        for i, truth in enumerate((args.true_p1, args.true_p2)):
            est = kept[:, i]
            print(
                f"  p{i + 1}: mean={est.mean():.4f} std={est.std():.4f} "
                f"(truth {truth})"
            )

    fig, axes = plt.subplots(1, 2, figsize=(9.5, 3.8))
    colors = {"mf": "C0", "ghf": "C1", "ekf": "C2", "pf": "C4"}
    for i, (ax, truth) in enumerate(zip(axes, (args.true_p1, args.true_p2))):
        for key, (kept, _, label) in results.items():
            lo, hi = np.percentile(kept[:, i], [0.5, 99.5])
            ax.hist(
                np.clip(kept[:, i], lo, hi), bins=40, histtype="step",
                lw=1.6, density=True, color=colors.get(key, "k"),
                label=f"{label} ({kept[:, i].mean():.2f}"
                      f"±{kept[:, i].std():.2f})",
            )
        ax.axvline(truth, color="C3", lw=2, label="truth")
        ax.set_xlabel(f"$\\hat{{p}}_{i + 1}$")
        ax.legend(fontsize=7)
    ntr = max((k[0].shape[0] for k in results.values()), default=0)
    fig.suptitle(f"Well–Poisson MLE, {ntr} identical trials per estimator")
    common.savefig(fig, "parameter_estimation")


if __name__ == "__main__":
    main()
