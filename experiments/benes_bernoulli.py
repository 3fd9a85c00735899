"""Beneš–Bernoulli Monte-Carlo filtering sweep (flagship experiment).

TPU-native counterpart of reference ``dardel/benes_bernoulli/mf.py`` +
``run_benes_bernoulli_mf.sh``: instead of one OS process per trial, the
whole ensemble runs as one batched scan; N / mode / closure sweeps are
plain loops over jitted programs.

Usage:
    python experiments/benes_bernoulli.py --trials 1000 --Ns 3 5 8 11 15 \
        --mode raw --closure tme-normal
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments import common


def run(N, mode, closure, trials, seed, stable=True, tme_order=2,
        eigh_impl="refined"):
    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import (
        moment_filter_cms,
        moment_filter_rms,
        moment_filter_scms,
    )
    from mfs_tpu.sde import sde_cond_moments_tme, sde_cond_moments_tme_normal

    model = benes_bernoulli(N=N)
    factory = (
        sde_cond_moments_tme_normal if closure == "tme-normal" else sde_cond_moments_tme
    )
    trans = factory(model.drift, model.dispersion, model.dt, tme_order, N)

    key_sim, key_meas = jax.random.split(jax.random.PRNGKey(seed))
    xss = model.simulate(key_sim, trials)  # (trials, T)
    yss = jax.random.bernoulli(key_meas, model.emission(xss)).astype(xss.dtype)
    ys = jnp.swapaxes(yss, 0, 1)  # (T, trials)

    ic = model.init_cond
    if mode == "raw":
        rms0 = jnp.broadcast_to(ic.rms, (trials, 2 * N))
        fn = jax.jit(
            lambda r0, y: moment_filter_rms(
                trans.rms, model.measurement_cond_pdf, r0, y, stable=stable,
                eigh_impl=eigh_impl
            )
        )
        (mss, nell), dt_run = common.timed_call(fn, rms0, ys)
        means = mss[..., 1]
        variances = mss[..., 2] - means**2
    elif mode == "central":
        cms0 = jnp.broadcast_to(ic.cms, (trials, 2 * N))
        fn = jax.jit(
            lambda c0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf, c0,
                ic.mean * jnp.ones(trials), y, stable=stable,
                eigh_impl=eigh_impl
            )
        )
        (mss, means, nell), dt_run = common.timed_call(fn, cms0, ys)
        variances = mss[..., 2]
    else:  # scaled
        scms0 = jnp.broadcast_to(ic.scms, (trials, 2 * N))
        fn = jax.jit(
            lambda s0, y: moment_filter_scms(
                trans.scms, trans.mean_var, model.measurement_cond_pdf, s0,
                ic.mean * jnp.ones(trials), jnp.sqrt(ic.variance) * jnp.ones(trials),
                y, stable=stable, eigh_impl=eigh_impl
            )
        )
        (mss, means, scales, nell), dt_run = common.timed_call(fn, scms0, ys)
        variances = scales**2

    finite = jnp.isfinite(mss.reshape(mss.shape[0], trials, -1)).all(axis=(0, 2))
    return dict(
        moments=mss, means=means, variances=variances, nell=nell,
        xss=xss, yss=yss, finite=finite, wall_time=dt_run,
    )


def main():
    p = common.base_parser(__doc__)
    p.add_argument("--Ns", type=int, nargs="+", default=[3, 5, 8, 11, 15])
    p.add_argument("--mode", choices=["raw", "central", "scaled"], default="raw")
    p.add_argument("--closure", choices=["tme", "tme-normal"], default="tme-normal")
    p.add_argument("--tme-order", type=int, default=2)
    p.add_argument("--no-stable", action="store_true")
    p.add_argument("--eigh-impl", default="refined",
                   choices=["refined", "xla", "jacobi", "pallas"])
    args = p.parse_args()
    common.setup(args)

    for N in args.Ns:
        out = run(
            N, args.mode, args.closure, args.trials, args.seed,
            stable=not args.no_stable, tme_order=args.tme_order,
            eigh_impl=args.eigh_impl,
        )
        name = f"mf_N{N}_{args.mode}_{args.closure}_s{args.seed}"
        if args.eigh_impl != "refined":
            name += f"_{args.eigh_impl}"
        path = common.save_results("benes_bernoulli", name, **out)
        common.emit(
            dict(
                experiment="benes_bernoulli", N=N, mode=args.mode,
                closure=args.closure, trials=args.trials,
                divergent=int(args.trials - out["finite"].sum()),
                wall_time_s=round(float(out["wall_time"]), 4),
                trials_per_sec=round(args.trials / float(out["wall_time"]), 2),
                saved=path,
            )
        )


if __name__ == "__main__":
    main()
