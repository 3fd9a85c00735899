"""Convergence of the moment filter to the exact Kalman filter (Fig. 3).

Reads ``experiments/convergence.py`` artifacts (per-N filtered
means/variances plus the exact KF reference on the OU / Matérn-1/2
model) and plots absolute mean/variance errors and the Gaussian KL
divergence against the moment order N.

Counterpart of reference ``reproduce_paper_plots/plot_convergence.py``.
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib.pyplot as plt

from postprocessing import common


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--Ns", type=int, nargs="+", default=[2, 3, 4, 6, 8, 10])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", choices=["raw", "central"], default="central")
    args = p.parse_args()

    rows = []
    for N in args.Ns:
        data = common.load("convergence", f"mf_N{N}_{args.mode}_s{args.seed}")
        means, variances = np.asarray(data["means"]), np.asarray(data["variances"])
        kf_m, kf_v = np.asarray(data["kf_m"]), np.asarray(data["kf_v"])
        _, ndiv = common.rm_divergent(means.T)
        fin = np.isfinite(means).all(axis=0) & np.isfinite(variances).all(axis=0)
        m, v = means[:, fin], variances[:, fin]
        km, kv = kf_m[:, fin], kf_v[:, fin]
        kl = 0.5 * (np.log(kv / v) + (v + (m - km) ** 2) / kv - 1.0)
        rows.append(dict(
            N=N, divergent=ndiv,
            abs_mean_err=float(np.mean(np.abs(m - km))),
            abs_var_err=float(np.mean(np.abs(v - kv))),
            gauss_kl=float(np.mean(kl)),
        ))
        print(rows[-1])

    Ns = [r["N"] for r in rows]
    fig, ax = plt.subplots(figsize=(5.5, 4))
    ax.semilogy(Ns, [r["abs_mean_err"] for r in rows], "o-", label="|mean error|")
    ax.semilogy(Ns, [r["abs_var_err"] for r in rows], "s-", label="|variance error|")
    ax.semilogy(Ns, [r["gauss_kl"] for r in rows], "^-", label="Gaussian KL")
    ax.set_xlabel("moment order N")
    ax.set_ylabel("error vs exact Kalman filter")
    ax.set_title("Moment-filter convergence (OU model)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    common.savefig(fig, "convergence")


if __name__ == "__main__":
    main()
