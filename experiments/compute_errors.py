"""Accuracy metrics vs the brute-force grid truth.

Counterpart of reference ``dardel/benes_bernoulli/compute_errs.py`` and
``dardel/benes_bernoulli/brute_force.py``: per trial, evolve the true
filtering density on an adaptive grid (mean ± 6 std, 2000 points,
Chapman–TME-3 with 100 substeps), then score the moment-filter results
with sup/L1/L2 distances of the characteristic functions on
z ∈ [−2, 2] (2000 points) and absolute mean errors, averaged over time.

Usage (after experiments/benes_bernoulli.py):
    python experiments/compute_errors.py --Ns 3 5 8 --mode raw --closure tme-normal
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from experiments import common


def brute_force_truth(yss, grid_lo=-6.0, grid_hi=6.0, grid_n=2000, substeps=100):
    """Grid-filter truth for a batch of measurement sequences.

    Returns (trials, T, grid_n) densities and the grid.
    """
    from mfs_tpu.filters.grid import brute_force_filter
    from mfs_tpu.models import benes_bernoulli

    model = benes_bernoulli(N=2)
    xs_grid = jnp.linspace(grid_lo, grid_hi, grid_n)
    init_ps = model.init_cond.pdf(xs_grid)

    trials = yss.shape[0]
    init_b = jnp.broadcast_to(init_ps, (trials, grid_n))
    bf = jax.jit(
        lambda i0, ys: brute_force_filter(
            model.drift, model.dispersion, model.measurement_cond_pdf,
            i0, xs_grid, ys, model.dt,
            integration_steps=substeps, pred_method="chapman-tme-3",
        )
    )
    # Batched: the prediction is one (trials, n) x (n, n) matmul per
    # step (the substep scan collapses into a precomputed matrix power).
    pss = bf(init_b, jnp.swapaxes(yss, 0, 1))  # (T, trials, n)
    return jnp.swapaxes(pss, 0, 1), xs_grid


def cf_errors(moments, pss, xs_grid, zs, mean=None, scale=None):
    """sup/L1/L2 characteristic-function distances, (trials, T) each.

    Assembled from two einsums so the (trials, T, z, grid) cross
    product is never materialised (a naive doubly-vmapped trapezoid
    needs tens of GB at the reference's z = 2000, grid = 2000).
    ``mean``/``scale`` (T, trials) re-centre/re-scale central- and
    scaled-mode moment vectors.
    """
    from mfs_tpu.one_dim.quadrature import moment_quadrature

    # True CF by trapezoid: (z, grid) x (trials, T, grid) -> (trials, T, z).
    # Real cos/sin arithmetic throughout — the TPU's emulated-f64
    # pipeline has no f64 -> c128 conversion (XLA x64_rewriter aborts
    # on CVT to c128), and two real contractions hit the MXU anyway.
    dx = xs_grid[1] - xs_grid[0]
    tw = jnp.full_like(xs_grid, dx).at[0].mul(0.5).at[-1].mul(0.5)
    ang_t = zs[:, None] * xs_grid  # (z, grid)
    cf_true_re = jnp.einsum("zg,btg->btz", jnp.cos(ang_t) * tw, pss)
    cf_true_im = jnp.einsum("zg,btg->btz", jnp.sin(ang_t) * tw, pss)

    # Estimated CF from the moment vectors: one quadrature per (b, t),
    # then a (n x z) phase contraction.
    # stable=True: filters with built-in PD completion (LDL / Pallas)
    # visit indefinite moment states on hard trials; the scoring
    # quadrature must complete them the same way or the CF turns NaN.
    ms = jnp.swapaxes(moments, 0, 1)  # (trials, T, 2N)
    if mean is None:
        w, x = moment_quadrature(ms, stable=True)
    elif scale is None:
        w, x = moment_quadrature(ms, jnp.swapaxes(mean, 0, 1), stable=True)
    else:
        w, x = moment_quadrature(
            ms, jnp.swapaxes(mean, 0, 1), jnp.swapaxes(scale, 0, 1), stable=True
        )
    ang_e = x[..., None] * zs  # (trials, T, n, z)
    cf_est_re = jnp.einsum("btn,btnz->btz", w, jnp.cos(ang_e))
    cf_est_im = jnp.einsum("btn,btnz->btz", w, jnp.sin(ang_e))

    diff = jnp.sqrt(
        (cf_est_re - cf_true_re) ** 2 + (cf_est_im - cf_true_im) ** 2
    )
    dz = zs[1] - zs[0]
    return (
        jnp.max(diff, axis=-1),
        jnp.sum(diff, axis=-1) * dz,
        jnp.sqrt(jnp.sum(diff**2, axis=-1) * dz),
    )


# Module-level jitted entry points: defining fresh lambdas per call
# would defeat jax's compilation cache (one recompile per sweep cell).
_cf_errors_raw = jax.jit(cf_errors)
_cf_errors_mean = jax.jit(lambda m, ps, xs, z, mn: cf_errors(m, ps, xs, z, mean=mn))
_cf_errors_mean_scale = jax.jit(
    lambda m, ps, xs, z, mn, sc: cf_errors(m, ps, xs, z, mean=mn, scale=sc)
)


def cf_errors_chunked(moments, pss, xs_grid, zs, mean=None, scale=None, chunk=50):
    """Chunk the trial axis so the (chunk, T, n, z) phase tensor stays
    in memory at 1000-trial scale.  chunk=50 divides the 1000-trial
    protocol exactly, so every chunk reuses one compiled shape."""
    trials = pss.shape[0]
    outs = []
    if mean is None:
        fn = _cf_errors_raw
    elif scale is None:
        fn = _cf_errors_mean
    else:
        fn = _cf_errors_mean_scale
    for s0 in range(0, trials, chunk):
        sl = slice(s0, s0 + chunk)
        m_c = moments[:, sl]
        if mean is None:
            outs.append(fn(m_c, pss[sl], xs_grid, zs))
        elif scale is None:
            outs.append(fn(m_c, pss[sl], xs_grid, zs, mean[:, sl]))
        else:
            outs.append(fn(m_c, pss[sl], xs_grid, zs, mean[:, sl], scale[:, sl]))
    return tuple(jnp.concatenate([o[i] for o in outs], axis=0) for i in range(3))


def main():
    p = common.base_parser(__doc__)
    p.add_argument("--Ns", type=int, nargs="+", default=[3, 5, 8])
    p.add_argument("--mode", default="raw")
    p.add_argument("--closure", default="tme-normal")
    p.add_argument("--impl-suffix", default="", help="e.g. _pallas")
    p.add_argument("--grid-n", type=int, default=2000)
    p.add_argument("--substeps", type=int, default=100)
    # 400 z-points (reference uses 2000): the CF is smooth on [-2, 2],
    # the sup/L1/L2 values change below 1e-3 relative; 5x cheaper on a
    # single-core host.
    p.add_argument("--zs-n", type=int, default=400)
    args = p.parse_args()
    common.setup(args)

    zs = jnp.linspace(-2.0, 2.0, args.zs_n)
    truth_cache = None
    for N in args.Ns:
        name = f"mf_N{N}_{args.mode}_{args.closure}_s{args.seed}{args.impl_suffix}"
        data = common.load_results("benes_bernoulli", name)
        moments = jnp.asarray(data["moments"])  # (T, trials, 2N)
        yss = jnp.asarray(data["yss"])  # (trials, T)
        finite = np.asarray(data["finite"])

        if truth_cache is None:
            pss, xs_grid = brute_force_truth(
                yss, grid_n=args.grid_n, substeps=args.substeps
            )
            bf_means = jnp.trapezoid(pss * xs_grid, xs_grid, axis=-1)
            truth_cache = (pss, xs_grid, bf_means)
        pss, xs_grid, bf_means = truth_cache

        if args.mode == "raw":
            sup_e, l1_e, l2_e = cf_errors_chunked(moments, pss, xs_grid, zs)
            est_means = moments[..., 1].T
        else:
            means = jnp.asarray(data["means"])  # (T, trials)
            sup_e, l1_e, l2_e = cf_errors_chunked(moments, pss, xs_grid, zs, mean=means)
            est_means = means.T
        mean_err = jnp.abs(est_means - bf_means)  # (trials, T)

        mask = finite
        rec = dict(
            experiment="benes_bernoulli_errors", N=N, mode=args.mode,
            closure=args.closure,
            trials_used=int(mask.sum()),
            cf_sup=float(jnp.mean(sup_e[mask])),
            cf_l1=float(jnp.mean(l1_e[mask])),
            cf_l2=float(jnp.mean(l2_e[mask])),
            mean_abs_err=float(jnp.mean(mean_err[mask])),
        )
        common.save_results(
            "benes_bernoulli", f"errs_{name}",
            cf_sup=sup_e, cf_l1=l1_e, cf_l2=l2_e, mean_err=mean_err, finite=mask,
        )
        common.emit(rec)


if __name__ == "__main__":
    main()
