"""2D prey–predator moment filtering (counterpart of reference
``dardel/prey_predator/mf.py`` + ``run_prey_predator_mf_gpu.sh``).

The reference splits N > 5 onto single-GPU Slurm array tasks; here the
trial ensemble is one batched scan (shard with ``mfs_tpu.parallel`` on
a multi-chip mesh).  Reports the absolute error of the filtering mean
against the simulated trajectory.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments import common


def main():
    p = common.base_parser(__doc__)
    p.add_argument("--N", type=int, default=3)
    p.add_argument("--T", type=int, default=2000)
    p.add_argument("--mode", choices=["central", "scaled"], default="central")
    p.add_argument("--tme-order", type=int, default=2)
    p.add_argument("--eigh-impl", default="refined",
                   choices=["refined", "xla", "jacobi", "pallas"])
    p.add_argument("--transition", default="autodiff",
                   choices=["autodiff", "poly"],
                   help="poly = closed-form matmul TME with the fused "
                        "predict contraction (both modes)")
    args = p.parse_args()
    common.setup(args)

    from mfs_tpu.models import prey_predator
    from mfs_tpu.multi_dims import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_cms,
        moment_filter_nd_scms,
        sde_cond_moments_nd_tme,
    )

    N, B = args.N, args.trials
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    model = prey_predator(mis)
    x0s, xss, yss = model.simulate(jax.random.PRNGKey(args.seed), B)
    ys = yss[: args.T]

    trans = sde_cond_moments_nd_tme(
        model.drift, model.dispersion, model.dt, args.tme_order, mis
    )
    predict_fn = None
    if args.transition == "poly":
        from mfs_tpu.multi_dims import poly_tme_nd

        poly = poly_tme_nd(
            model.drift, model.dispersion, model.dt, args.tme_order, mis,
            drift_deg=2, dispersion_deg=1,
        )
        # Both modes get the fused weight-inside-the-tower predict.
        predict_fn = (
            poly.predict_cms if args.mode == "central" else poly.predict_scms
        )
        trans = poly
    ic = model.init_cond
    if args.mode == "central":
        cms0 = jnp.broadcast_to(ic.cms, (B,) + ic.cms.shape)
        mean0 = jnp.broadcast_to(ic.mean, (B, 2))
        fn = jax.jit(
            lambda c0, m0, y: moment_filter_nd_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf, y,
                (mis, inds), c0, m0, eigh_impl=args.eigh_impl,
                predict_fn=predict_fn,
            )
        )
        (cmss, means, nell), dt_run = common.timed_call(fn, cms0, mean0, ys)
    else:
        from mfs_tpu.multi_dims.moments import monomials_nd

        scale0_1 = jnp.sqrt(jnp.diagonal(ic.cov))
        scms0 = jnp.broadcast_to(
            ic.cms / monomials_nd(scale0_1, mis), (B,) + ic.cms.shape
        )
        mean0 = jnp.broadcast_to(ic.mean, (B, 2))
        scale0 = jnp.broadcast_to(scale0_1, (B, 2))
        fn = jax.jit(
            lambda s0, m0, sc0, y: moment_filter_nd_scms(
                trans.scms, trans.mean_var, model.measurement_cond_pdf, y,
                (mis, inds), s0, m0, sc0, eigh_impl=args.eigh_impl,
                predict_fn=predict_fn,
            )
        )
        (scmss, means, scales, nell), dt_run = common.timed_call(
            fn, scms0, mean0, scale0, ys
        )

    err = jnp.abs(means - xss[: args.T])  # (T, B, 2)
    finite = jnp.isfinite(means).all(axis=(0, 2))
    tag = "" if args.transition == "autodiff" else f"_{args.transition}"
    if args.eigh_impl != "refined":
        tag += f"_{args.eigh_impl}"
    common.save_results(
        "prey_predator", f"mf_N{N}_{args.mode}_s{args.seed}{tag}",
        means=means, nell=nell, xss=xss[: args.T], finite=finite,
    )
    common.emit(
        dict(
            experiment="prey_predator", N=N, mode=args.mode, trials=B,
            T=args.T, transition=args.transition, eigh_impl=args.eigh_impl,
            divergent=int(B - finite.sum()),
            mean_abs_err=float(jnp.mean(jnp.where(finite[None, :, None], err, 0.0))),
            wall_time_s=round(float(dt_run), 3),
        )
    )


if __name__ == "__main__":
    main()
