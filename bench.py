"""Headline benchmark: Beneš–Bernoulli N=15 moment-filter throughput.

Workload (BASELINE.md / reference ``dardel/time_profile/mf.py:83-108``):
the 1D Beneš SDE with Bernoulli measurements, T=100 steps, moment order
2N-1 = 29 (N=15), TME-2 Normal-closure transitions, double precision
I/O, central-moment representation.  The metric is Monte-Carlo *trials
per second* for the full filtering pass (compile excluded,
``block_until_ready`` timed).

The HEADLINE is the *rescued* production pipeline (VERDICT r03 item 1,
redesigned in round 5 — VERDICT r04 item 1):

    tier 0  fused double-f32 Pallas kernel, whole batch      (~1.0 s)
    tier 1  the same kernel with Gram jitter 1e-8 (relative
            Tikhonov regularisation of the equilibrated
            Hankel factorisation), re-running only the
            diverged trials                                  (~0.16 s)
    tier 2  native-f64 LAPACK + LDL completion on the host
            CPU for any residue (measured EMPTY: the
            jittered kernel rescued 265/265 of the tier-0
            losses where the host f64 pass manages 249/265,
            tools/PROBE_RESCUE3.json)

timed end-to-end including the splice, so ``vs_baseline`` reflects a
pipeline that keeps 100% of trials — strictly more than the
reference's own f64 filters keep on identical data (PARITY.md).  The
raw kernel-only number is reported alongside.  Accuracy of the
jitter-rescued trials vs the host-f64 rescue (the trials both keep):
filter-mean deviation <= 3.5e-3, nell deviation <= 1.5e-2 absolute
(~2e-4 relative) — on exactly the trials whose unregularised moment
problem is numerically singular in f64 too.

Roofline (VERDICT r03 item 3): FLOPs are counted by jaxpr traversal
(``mfs_tpu.ops.flops``) including the Pallas kernel body; two VPU
rooflines are *measured in situ* — a large fused multiply-add chain
(peak) and the same chain at the kernel's (n, block) op shape
(dependency-limited) — and the headline leg is placed against them.

``vs_baseline`` compares against the BEST CPU configuration (the
reference's hardware class): the strongest of the reference's own
filter, this repo's sequential / batched CPU runs, and the pinned
best-ever CPU number (142 trials/s, BASELINE.md) so the ratio is never
flattered by background load on the 1-core host.  Full table to
stderr + BENCH_ABLATION.json; stdout carries exactly one JSON line.
"""
import json
import os
import sys
import time

# The bench must run on the real accelerator: let JAX pick it.
os.environ.setdefault("JAX_PLATFORMS", "")
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mfs_tpu.models import benes_bernoulli  # noqa: E402
from mfs_tpu.one_dim.filtering import moment_filter_cms  # noqa: E402
from mfs_tpu.sde import sde_cond_moments_tme_normal  # noqa: E402

N = 15
BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", "64"))
SEQ_TRIALS = int(os.environ.get("BENCH_SEQ_TRIALS", "8"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
TIER1_BUCKET = 512
TIER2_CHUNK = 64
SKIP_ROOFLINE = os.environ.get("BENCH_SKIP_ROOFLINE") == "1"


def _timeit(fn, *args, reps=REPS):
    # First call compiles through the accelerator tunnel, which can
    # fail transiently (remote-compile hiccups); retry a few times.
    for attempt in range(3):
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20.0)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def _finite_mask(cms_last, nell):
    return np.asarray(
        jnp.isfinite(cms_last).all(axis=-1) & jnp.isfinite(nell)
    )


def main():
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )

    # Measurements from simulated trajectories (8 distinct paths tiled;
    # filter cost does not depend on the y values).
    key = jax.random.PRNGKey(0)
    xss = model.simulate(key, 8)  # (8, T)
    probs = model.emission(jnp.tile(xss, (BATCH // 8 + 1, 1))[:BATCH])
    ys = (
        jax.random.bernoulli(jax.random.PRNGKey(1), probs)
        .astype(jnp.float64)
        .T
    )  # (T, BATCH)
    ic = model.init_cond
    cms0 = jnp.broadcast_to(ic.cms, (BATCH, 2 * N))
    mean0 = ic.mean * jnp.ones(BATCH)
    # Host snapshots taken while the device is fresh: the CPU baselines
    # below must not depend on a device->host transfer after the heavy
    # TPU runs (transient tunnel failures have been observed there).
    ys_host = np.asarray(ys)
    cms0_host = np.asarray(cms0[:CPU_BATCH])
    mean0_host = np.asarray(mean0[:CPU_BATCH])

    results = {}

    # ---- jitted programs shared by the legs -------------------------
    filt_pallas = jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, eigh_impl="pallas",
        )
    )
    filt_jitter = jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, eigh_impl="pallas", quad_jitter=1e-8,
        )
    )
    cpu = jax.devices("cpu")[0]
    filt_cpu = jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, stable=True, eigh_impl="xla",
        )
    )

    # --- raw fused-kernel leg ----------------------------------------
    for attempt in range(3):
        try:
            t, out = _timeit(filt_pallas, cms0, mean0, ys)
            finite0 = _finite_mask(out[0][-1], out[2])
            results["tpu_batched_pallas"] = {
                "trials_per_s": BATCH / t,
                "finite_frac": float(finite0.mean()),
                "batch": BATCH,
            }
            break
        except Exception as e:
            results["tpu_batched_pallas"] = {
                "error": str(e)[:200], "attempts": attempt + 1,
            }
            time.sleep(30.0)

    # --- rescued pipeline (the headline) ------------------------------
    # Warm every tier's compile at its dispatch shape first, then time
    # the whole pipeline end-to-end (the reference protocol excludes
    # compile; everything else — masks, host round-trips, conversions,
    # splices — is inside the timer).
    cms0_b = jnp.broadcast_to(ic.cms, (TIER1_BUCKET, 2 * N))
    mean0_b = ic.mean * jnp.ones(TIER1_BUCKET)
    cms0_cpu = jax.device_put(cms0_host[:TIER2_CHUNK], cpu)
    mean0_cpu = jax.device_put(mean0_host[:TIER2_CHUNK], cpu)

    def rescued_pipeline():
        # tier 0: fused kernel, whole batch, central mode
        cmss, means, nell = filt_pallas(cms0, mean0, ys)
        cms_last = cmss[-1]
        finite = _finite_mask(cms_last, nell)
        total_rescued_t1 = total_rescued_t2 = 0
        merged_nell = np.asarray(nell).copy()
        merged_last = np.asarray(cms_last).copy()

        idx = np.where(~finite)[0]
        if idx.size:
            # tier 1: Gram-jittered fused kernel on the diverged set
            nb = -(-idx.size // TIER1_BUCKET)
            pad = np.concatenate(
                [idx, np.zeros(nb * TIER1_BUCKET - idx.size, dtype=idx.dtype)]
            )
            outs = []
            for c in range(nb):
                sl = pad[c * TIER1_BUCKET:(c + 1) * TIER1_BUCKET]
                ys_sub = jnp.take(ys, jnp.asarray(sl), axis=1)
                outs.append(filt_jitter(cms0_b, mean0_b, ys_sub))
            last_1 = np.concatenate(
                [np.asarray(o[0][-1]) for o in outs]
            )[: idx.size]
            nell_1 = np.concatenate(
                [np.asarray(o[2]) for o in outs]
            )[: idx.size]
            fin1 = np.isfinite(last_1).all(axis=-1) & np.isfinite(nell_1)
            good = idx[fin1]
            merged_last[good] = last_1[fin1]
            merged_nell[good] = nell_1[fin1]
            total_rescued_t1 = int(fin1.sum())

            # tier 2: host LAPACK f64 + LDL completion for any residue
            idx2 = idx[~fin1]
            if idx2.size:
                nb2 = -(-idx2.size // TIER2_CHUNK)
                pad2 = np.concatenate(
                    [idx2,
                     np.zeros(nb2 * TIER2_CHUNK - idx2.size, dtype=idx2.dtype)]
                )
                last2, nell_2 = [], []
                for c in range(nb2):
                    sl = pad2[c * TIER2_CHUNK:(c + 1) * TIER2_CHUNK]
                    ys_c = jax.device_put(ys_host[:, sl], cpu)
                    o = filt_cpu(cms0_cpu, mean0_cpu, ys_c)
                    last2.append(np.asarray(o[0][-1]))
                    nell_2.append(np.asarray(o[2]))
                last2 = np.concatenate(last2)[: idx2.size]
                nell_2 = np.concatenate(nell_2)[: idx2.size]
                fin2 = np.isfinite(last2).all(axis=-1) & np.isfinite(nell_2)
                merged_last[idx2[fin2]] = last2[fin2]
                merged_nell[idx2[fin2]] = nell_2[fin2]
                total_rescued_t2 = int(fin2.sum())

        final_finite = np.isfinite(merged_last).all(axis=-1) & np.isfinite(
            merged_nell
        )
        return final_finite, total_rescued_t1, total_rescued_t2

    for attempt in range(3):
        try:
            fin, r1, r2 = rescued_pipeline()  # warm-up (compiles)
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                fin, r1, r2 = rescued_pipeline()
                times.append(time.perf_counter() - t0)
            t_resc = min(times)
            results["tpu_rescued"] = {
                "trials_per_s": BATCH / t_resc,
                "finite_frac": float(fin.mean()),
                "rescued_tier1_jitter": r1,
                "rescued_tier2_cpu_f64": r2,
                "batch": BATCH,
                "wall_s": t_resc,
            }
            break
        except Exception as e:
            results["tpu_rescued"] = {
                "error": str(e)[:200], "attempts": attempt + 1,
            }
            time.sleep(30.0)

    # --- honest XLA-f64 on-TPU leg ------------------------------------
    # ~45x slower than the kernel: split the batch into bounded
    # dispatches so no single dispatch trips the remote deadline.
    ck = min(512, BATCH)
    for attempt in range(3):
        try:
            filt_ref = jax.jit(
                lambda c0, m0, y: moment_filter_cms(
                    trans.cms, trans.mean, model.measurement_cond_pdf,
                    c0, m0, y, stable=True, eigh_impl="refined",
                )
            )
            run = lambda c0, m0, y: [
                filt_ref(c0[s:s + ck], m0[s:s + ck], y[:, s:s + ck])
                for s in range(0, BATCH, ck)
            ]
            t, out = _timeit(run, cms0, mean0, ys)
            last = jnp.concatenate([o[0][-1] for o in out], axis=0)
            nell = jnp.concatenate([o[2] for o in out], axis=0)
            results["tpu_batched_refined"] = {
                "trials_per_s": BATCH / t,
                "finite_frac": float(_finite_mask(last, nell).mean()),
                "batch": BATCH,
                "dispatch_chunk": ck,
            }
            break
        except Exception as e:
            results["tpu_batched_refined"] = {
                "error": str(e)[:200], "attempts": attempt + 1,
            }
            time.sleep(30.0)

    # --- CPU baselines (the reference's hardware class) ---
    with jax.default_device(cpu):
        ys_c = jax.device_put(ys_host, cpu)
        args1 = (
            jax.device_put(cms0_host[0], cpu),
            jax.device_put(mean0_host[0], cpu),
        )

        # (b) this repo's filter, sequential single-trial (the
        # reference execution model: one process per trial).
        filt1 = jax.jit(
            lambda c0, m0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf,
                c0, m0, y, stable=True,
            )
        )
        try:
            out1 = filt1(*args1, ys_c[:, 0])
            jax.block_until_ready(out1)
            t0 = time.perf_counter()
            for i in range(SEQ_TRIALS):
                out1 = filt1(*args1, ys_c[:, i])
                jax.block_until_ready(out1)
            results["cpu_seq_ours"] = {
                "trials_per_s": SEQ_TRIALS / (time.perf_counter() - t0)
            }
        except Exception as e:
            results["cpu_seq_ours"] = {"error": str(e)[:200]}

        # (c) this repo's batched filter on CPU.
        try:
            cms0_c = jax.device_put(cms0_host, cpu)
            mean0_c = jax.device_put(mean0_host, cpu)
            t, _ = _timeit(filt1, cms0_c, mean0_c, ys_c[:, :CPU_BATCH], reps=2)
            results["cpu_batched_ours"] = {
                "trials_per_s": CPU_BATCH / t, "batch": CPU_BATCH,
            }
        except Exception as e:
            results["cpu_batched_ours"] = {"error": str(e)[:200]}

        # (a) the reference repo's own filter code (no tme dependency on
        # this import path), single-trial sequential.
        try:
            sys.path.insert(0, "/root/reference")
            from mfs.one_dim.filtering import moment_filter_cms as ref_cms

            ref_filt = jax.jit(
                lambda c0, m0, y: ref_cms(
                    lambda x, orders, mean: trans.cms(x, mean),
                    trans.mean,
                    model.measurement_cond_pdf,
                    c0, m0, y, stable=True,
                )
            )
            outr = ref_filt(*args1, ys_c[:, 0])
            jax.block_until_ready(outr)
            t0 = time.perf_counter()
            for i in range(SEQ_TRIALS):
                outr = ref_filt(*args1, ys_c[:, i])
                jax.block_until_ready(outr)
            results["cpu_seq_reference_code"] = {
                "trials_per_s": SEQ_TRIALS / (time.perf_counter() - t0)
            }
        except Exception as e:  # reference tree unavailable: skip
            results["cpu_seq_reference_code"] = {"error": str(e)[:200]}
        finally:
            if sys.path and sys.path[0] == "/root/reference":
                sys.path.pop(0)

    # --- roofline / MFU accounting (VERDICT r03 item 3) ----------------
    if not SKIP_ROOFLINE:
        try:
            from mfs_tpu.ops.flops import count_flops

            fl = count_flops(filt_pallas, cms0, mean0, ys)
            t_pal = (
                BATCH / results["tpu_batched_pallas"]["trials_per_s"]
                if "trials_per_s" in results.get("tpu_batched_pallas", {})
                else None
            )

            # Measured VPU rooflines: a fused multiply-add dependency
            # chain (XLA fuses each scan body into one loop; a/b are
            # runtime scalars so nothing folds).  Work is scaled to
            # ~1e12 flops so the ~40 ms remote-dispatch latency of the
            # tunnel is negligible (an unscaled microbenchmark here
            # measured pure dispatch time and reported MFU > 1).
            # "peak": a large parallel array (every lane busy, ILP
            # across vregs).  "serial": the kernel's real (n, block)
            # op shape, where each vector op covers ~7 vregs and the
            # double-f32 recurrences form dependency chains — the
            # achievable roof for this algorithm class.
            def chain_fn(unroll, length):
                def body(c, _):
                    x, a, b = c
                    for _ in range(unroll):
                        x = x * a + b
                    return (x, a, b), None

                def run(x, a, b):
                    (x, _, _), _ = jax.lax.scan(
                        body, (x, a, b), None, length=length
                    )
                    # scalar output: the tunnel's block_until_ready is
                    # only reliable on scalars (measured; array handles
                    # can return before the computation finishes)
                    return jnp.sum(x)

                return jax.jit(run)

            a = jnp.float32(1.0000001)
            b = jnp.float32(1e-9)
            big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
            f_big = chain_fn(512, 16)
            t_big, _ = _timeit(f_big, big, a, b, reps=2)
            roof_peak = 2.0 * 512 * 16 * big.size / t_big

            small = jnp.ones((N, TIER1_BUCKET), jnp.float32)
            f_small = chain_fn(1024, 16384)
            t_small, _ = _timeit(f_small, small, a, b, reps=2)
            roof_serial = 2.0 * 1024 * 16384 * small.size / t_small

            # HBM bytes (lower bound): Pallas kernel I/O per quadrature
            # per trial + the f64 scan-carry traffic between XLA ops.
            T = ys.shape[0]
            kernel_io = (2 * (2 * N) + 4 + 4 * N) * 4 * 2 * T  # bytes/trial
            xla_io = (2 * N) * 8 * 8 * T  # ~8 f64 moment-vector round trips
            bytes_per_trial = kernel_io + xla_io
            hbm_bw = 819e9  # published v5e HBM bandwidth

            roofline = {
                "flops_per_trial": fl["total"] / BATCH,
                "f32_flops_per_trial": fl["f32"] / BATCH,
                "f64_flops_per_trial": fl["f64"] / BATCH,
                "roof_peak_gflops": roof_peak / 1e9,
                "roof_serial_gflops": roof_serial / 1e9,
                "bytes_per_trial_lower_bound": bytes_per_trial,
            }
            if t_pal:
                ach = fl["total"] / t_pal
                ach32 = fl["f32"] / t_pal
                t_mem = bytes_per_trial * BATCH / hbm_bw
                roofline.update(
                    achieved_gflops=ach / 1e9,
                    achieved_f32_gflops=ach32 / 1e9,
                    mfu_vs_peak=ach32 / roof_peak,
                    mfu_vs_serial=ach32 / roof_serial,
                    hbm_time_frac=t_mem / t_pal,
                )
                # Which roof binds: memory if the HBM lower bound is a
                # large share; else VPU compute, with the serial roof
                # explaining the gap to peak.
                if t_mem / t_pal > 0.5:
                    roofline["bound"] = "hbm-bandwidth"
                elif ach32 / roof_serial > 0.3:
                    roofline["bound"] = (
                        "vpu-compute (dependency-limited: double-f32 "
                        "recurrences serialise at (n, block) op shapes)"
                    )
                else:
                    roofline["bound"] = "dispatch/other"
            results["roofline"] = roofline
        except Exception as e:
            results["roofline"] = {"error": str(e)[:300]}

    # --- headline: the rescued pipeline -------------------------------
    rescued = results.get("tpu_rescued", {})
    pallas = results.get("tpu_batched_pallas", {})
    if "trials_per_s" in rescued:
        head, head_name = rescued, "rescued"
    elif "trials_per_s" in pallas:
        head, head_name = pallas, "pallas-only (rescue failed)"
    else:
        refined = results.get("tpu_batched_refined", {})
        assert "trials_per_s" in refined, f"no TPU path completed: {results}"
        head, head_name = refined, "refined"
    # The reference's own worst-case divergence on this workload is
    # 176/1000 (raw mode, plot_benes_bernoulli_errs_and_times.py:11-35);
    # the rescued pipeline must beat that and its own kernel-only rate.
    assert head["finite_frac"] > 0.93, (
        f"too many divergent trials: {1 - head['finite_frac']:.1%}"
    )
    if head_name == "rescued" and "finite_frac" in pallas:
        assert head["finite_frac"] >= pallas["finite_frac"], (
            "rescue lost trials vs the raw kernel"
        )

    cpu_vals = [
        v["trials_per_s"]
        for k, v in results.items()
        if k.startswith("cpu_") and "trials_per_s" in v
    ]
    # The 1-core host's CPU throughput wobbles 2-4x with load; pin the
    # denominator to the BEST CPU measurement ever recorded (142
    # trials/s at N=15, BASELINE.md round 2) unless today's machine
    # measures even faster — conservative and stable across rounds.
    BEST_CPU_EVER = 142.0
    best_cpu = max(cpu_vals + [BEST_CPU_EVER])
    results["headline"] = head_name
    results["best_cpu_trials_per_s"] = best_cpu
    print(json.dumps(results, indent=2, default=float), file=sys.stderr)
    with open(os.path.join(os.path.dirname(__file__), "BENCH_ABLATION.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)

    print(
        json.dumps(
            {
                "metric": f"benes_bernoulli_N{N}_T100_f64_trials_per_sec",
                "value": round(head["trials_per_s"], 3),
                "unit": "trials/s",
                "vs_baseline": round(head["trials_per_s"] / best_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
