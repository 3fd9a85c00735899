"""Measure the pallas-vs-refined crossover for eigh_impl="auto".

Times the full batched filter (the user-visible unit) per
(problem size, batch) cell for both kernel dispatches on the current
device, and prints a JSON table.  The winning-impl thresholds baked
into ``mfs_tpu/ops/dispatch.py`` are derived from this output on the
real TPU (VERDICT r03 item 4: at ND N=3/B=64 the refined path beats
the ND pallas kernel 2.7x, while at B=256 pallas wins 2.3x — defaults
must be measured, not guessed).

Run: ``python tools/measure_dispatch.py [--quick]``
"""
import sys, os, time, json, argparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sweep_1d(Ns, Bs, T=50):
    from mfs_tpu.models import benes_bernoulli
    from mfs_tpu.one_dim.filtering import moment_filter_cms
    from mfs_tpu.sde import sde_cond_moments_tme_normal

    rows = []
    for N in Ns:
        model = benes_bernoulli(N=N)
        trans = sde_cond_moments_tme_normal(
            model.drift, model.dispersion, model.dt, 2, N
        )
        ic = model.init_cond
        key = jax.random.PRNGKey(0)
        xss = model.simulate(key, 8)
        for B in Bs:
            probs = model.emission(jnp.tile(xss, (B // 8 + 1, 1))[:B])
            ys = jax.random.bernoulli(jax.random.PRNGKey(1), probs).astype(
                jnp.float64
            ).T[:T]
            cms0 = jnp.broadcast_to(ic.cms, (B, 2 * N))
            mean0 = ic.mean * jnp.ones(B)
            row = dict(kind="1d", N=N, B=B, T=T)
            for impl in ("pallas", "refined"):
                try:
                    filt = jax.jit(
                        lambda c0, m0, y, impl=impl: moment_filter_cms(
                            trans.cms, trans.mean, model.measurement_cond_pdf,
                            c0, m0, y, stable=(impl != "pallas"),
                            eigh_impl=impl,
                        )
                    )
                    t = timeit(filt, cms0, mean0, ys)
                    row[impl] = t
                except Exception as e:
                    row[impl] = f"error: {str(e)[:120]}"
            if isinstance(row.get("pallas"), float) and isinstance(
                row.get("refined"), float
            ):
                row["winner"] = (
                    "pallas" if row["pallas"] < row["refined"] else "refined"
                )
                row["ratio_refined_over_pallas"] = round(
                    row["refined"] / row["pallas"], 3
                )
            print(json.dumps(row), flush=True)
            rows.append(row)
    return rows


def sweep_nd(Ns, Bs, T=20):
    from mfs_tpu.models import prey_predator
    from mfs_tpu.multi_dims import (
        generate_graded_lexico_multi_indices,
        gram_and_hankel_indices_graded_lexico,
        moment_filter_nd_cms,
        poly_tme_nd,
    )

    rows = []
    for N in Ns:
        mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
        inds = gram_and_hankel_indices_graded_lexico(N, 2)
        s = inds.shape[1]
        model = prey_predator(mis)
        poly = poly_tme_nd(
            model.drift, model.dispersion, model.dt, 2, mis,
            drift_deg=2, dispersion_deg=1,
        )
        ic = model.init_cond
        maxB = max(Bs)
        _, _, yss_all = model.simulate(jax.random.PRNGKey(2), maxB)
        for B in Bs:
            ys = yss_all[:T, :B]
            cms0 = jnp.broadcast_to(ic.cms, (B,) + ic.cms.shape)
            mean0 = jnp.broadcast_to(ic.mean, (B, 2))
            row = dict(kind="nd", N=N, s=int(s), B=B, T=T)
            for impl in ("pallas", "refined"):
                try:
                    filt = jax.jit(
                        lambda c0, m0, y, impl=impl: moment_filter_nd_cms(
                            poly.cms, poly.mean, model.measurement_cond_pdf,
                            y, (mis, inds), c0, m0, eigh_impl=impl,
                            predict_fn=poly.predict_cms,
                        )
                    )
                    t = timeit(filt, cms0, mean0, ys)
                    row[impl] = t
                except Exception as e:
                    row[impl] = f"error: {str(e)[:120]}"
            if isinstance(row.get("pallas"), float) and isinstance(
                row.get("refined"), float
            ):
                row["winner"] = (
                    "pallas" if row["pallas"] < row["refined"] else "refined"
                )
                row["ratio_refined_over_pallas"] = round(
                    row["refined"] / row["pallas"], 3
                )
            print(json.dumps(row), flush=True)
            rows.append(row)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip-1d", action="store_true")
    p.add_argument("--skip-nd", action="store_true")
    p.add_argument("--nd-ns", type=int, nargs="+", default=None)
    p.add_argument("--nd-bs", type=int, nargs="+", default=None)
    p.add_argument("--one-d-ns", type=int, nargs="+", default=None)
    p.add_argument("--one-d-bs", type=int, nargs="+", default=None)
    p.add_argument("--merge", action="store_true",
                   help="merge rows into an existing DISPATCH_MEASURE.json")
    args = p.parse_args()

    out = {"device": str(jax.devices()[0])}
    if not args.skip_1d:
        Ns = args.one_d_ns or ([8, 15] if args.quick else [4, 8, 15])
        Bs = args.one_d_bs or ([8, 32, 128, 512] if args.quick else [4, 16, 64, 512])
        out["one_d"] = sweep_1d(Ns, Bs)
    if not args.skip_nd:
        Ns = args.nd_ns or ([3, 5] if args.quick else [3, 5, 7, 9])
        Bs = args.nd_bs or ([32, 128, 512] if args.quick else [32, 64, 128, 256, 512])
        out["nd"] = sweep_nd(Ns, Bs)
    path = os.path.join(os.path.dirname(__file__), "DISPATCH_MEASURE.json")
    if args.merge and os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        for key in ("one_d", "nd"):
            if key in out and key in old:
                mine = {
                    (r.get("kind"), r.get("N"), r.get("B")) for r in out[key]
                }
                out[key] = [
                    r for r in old[key]
                    if (r.get("kind"), r.get("N"), r.get("B")) not in mine
                ] + out[key]
            elif key in old and key not in out:
                out[key] = old[key]
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", path)
