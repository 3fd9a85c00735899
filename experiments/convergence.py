"""Convergence study: moment filter vs the exact Kalman filter on the
OU / Matérn-1/2 model, sweeping the moment order N.

Counterpart of reference ``dardel/convergence/convergence_mf.py``:
reports absolute mean/variance errors and the Gaussian KL divergence
per N, averaged over Monte-Carlo trials — all trials batched.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import jax
import jax.numpy as jnp

from experiments import common

DT, T = 1e-1, 100
ELL, SIGMA, XI = 1.0, 0.5, 1.0
MEAN0, VAR0 = 0.0, SIGMA**2


def kalman_batch(ys):
    F = math.exp(-DT / ELL)
    Q = SIGMA**2 * (1 - math.exp(-2 * DT / ELL))

    def step(carry, y):
        mf, vf = carry
        mp, vp = F * mf, F * vf * F + Q
        s = vp + XI
        gain = vp / s
        mf = mp + gain * (y - mp)
        vf = vp - vp * gain
        return (mf, vf), (mf, vf)

    B = ys.shape[1]
    init = (MEAN0 * jnp.ones(B), VAR0 * jnp.ones(B))
    _, (mfs, vfs) = jax.lax.scan(step, init, ys)
    return mfs, vfs


def simulate(trials, seed):
    F = math.exp(-DT / ELL)
    Q = SIGMA**2 * (1 - math.exp(-2 * DT / ELL))
    key = jax.random.PRNGKey(seed)
    k0, ks, ko = jax.random.split(key, 3)
    x = MEAN0 + jnp.sqrt(VAR0) * jax.random.normal(k0, (trials,))
    steps = jax.random.normal(ks, (T, trials))
    noise = jax.random.normal(ko, (T, trials))

    def body(x, eps):
        x = F * x + math.sqrt(Q) * eps
        return x, x

    _, xs = jax.lax.scan(body, x, steps)
    return xs, xs + math.sqrt(XI) * noise


def main():
    p = common.base_parser(__doc__)
    p.add_argument("--Ns", type=int, nargs="+", default=[2, 3, 4, 6, 8, 10])
    p.add_argument("--eigh-impl", default="refined",
                   choices=["refined", "xla", "jacobi", "pallas"])
    args = p.parse_args()
    common.setup(args)

    from mfs_tpu.one_dim.filtering import moment_filter_rms
    from mfs_tpu.sde import sde_cond_moments_tme
    from mfs_tpu.utils.gaussian import normal_raw_moments_all

    xs, ys = simulate(args.trials, args.seed)
    kf_m, kf_v = kalman_batch(ys)
    rows = []

    drift = lambda x: -x / ELL
    disp = lambda x: math.sqrt(2.0) * SIGMA / math.sqrt(ELL)
    meas = lambda y, x: jnp.exp(-0.5 * (y - x) ** 2 / XI) / jnp.sqrt(2 * jnp.pi * XI)

    for N in args.Ns:
        trans = sde_cond_moments_tme(drift, disp, DT, 3, N)
        rms0 = jnp.broadcast_to(
            normal_raw_moments_all(MEAN0, VAR0, 2 * N), (args.trials, 2 * N)
        )
        fn = jax.jit(
            lambda r0, y: moment_filter_rms(
                trans.rms, meas, r0, y, eigh_impl=args.eigh_impl
            )
        )
        (rmss, nell), dt_run = common.timed_call(fn, rms0, ys)
        means = rmss[..., 1]
        variances = rmss[..., 2] - means**2
        abs_m = jnp.abs(means - kf_m)
        abs_v = jnp.abs(variances - kf_v)
        kl = 0.5 * (
            jnp.log(kf_v / variances) + (variances + (means - kf_m) ** 2) / kf_v - 1.0
        )
        common.save_results(
            "convergence", f"mf_N{N}_s{args.seed}",
            means=means, variances=variances, kf_m=kf_m, kf_v=kf_v, nell=nell,
        )
        row = dict(
            experiment="convergence", N=N, trials=args.trials,
            abs_mean_err=float(jnp.mean(abs_m)),
            abs_var_err=float(jnp.mean(abs_v)),
            gauss_kl=float(jnp.mean(kl)),
            wall_time_s=round(float(dt_run), 4),
        )
        rows.append(row)
        common.emit(row)

    import json

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SUMMARY_convergence.json")
    with open(out, "w") as f:
        json.dump(
            dict(
                protocol="OU/Matern-1/2 vs exact KF, raw mode, TME-3, "
                         f"T={T}, dt={DT}, batched trials "
                         "(reference dardel/convergence/convergence_mf.py)",
                eigh_impl=args.eigh_impl,
                seed=args.seed, rows=rows,
            ),
            f, indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
