"""Probe: jitter-tier generality across moment orders (round 5).

The 1e-8 Gram-jitter rescue was selected on the N=15 bench cell
(``probe_rescue3.py``).  This probe checks the tier is not tuned to
one cell: for N in {12, 13, 14, 15} at B=4096, count the clean
kernel's diverged trials, the jittered kernel's rescue fraction on
exactly those trials, and the jitter-vs-clean nell deviation on the
trials BOTH keep (the regularisation must not disturb healthy
trials).

Run on the real TPU: ``python tools/probe_rescue4.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mfs_tpu.models import benes_bernoulli
from mfs_tpu.one_dim.filtering import moment_filter_cms
from mfs_tpu.sde import sde_cond_moments_tme_normal

BATCH = 4096
BUCKET = 512
res = {}

for N in (12, 13, 14, 15):
    model = benes_bernoulli(N=N)
    trans = sde_cond_moments_tme_normal(
        model.drift, model.dispersion, model.dt, 2, N
    )
    xss = model.simulate(jax.random.PRNGKey(0), 8)
    probs = model.emission(jnp.tile(xss, (BATCH // 8 + 1, 1))[:BATCH])
    ys = jax.random.bernoulli(jax.random.PRNGKey(1), probs).astype(
        jnp.float64
    ).T
    ic = model.init_cond
    cms0 = jnp.broadcast_to(ic.cms, (BATCH, 2 * N))
    mean0 = ic.mean * jnp.ones(BATCH)

    def make(jit_level):
        return jax.jit(
            lambda c0, m0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf,
                c0, m0, y, eigh_impl="pallas", quad_jitter=jit_level,
            )
        )

    f0, f1 = make(0.0), make(1e-8)
    out0 = f0(cms0, mean0, ys)
    jax.block_until_ready(out0)
    last0, nell0 = np.asarray(out0[0][-1]), np.asarray(out0[2])
    fin0 = np.isfinite(last0).all(-1) & np.isfinite(nell0)
    idx = np.where(~fin0)[0]

    row = {"N": N, "batch": BATCH, "tier0_diverged": int(idx.size)}
    if idx.size:
        nb = -(-idx.size // BUCKET)
        pad = np.concatenate(
            [idx, np.zeros(nb * BUCKET - idx.size, dtype=idx.dtype)]
        )
        cms0_d = jnp.broadcast_to(ic.cms, (pad.size, 2 * N))
        mean0_d = ic.mean * jnp.ones(pad.size)
        t0 = time.perf_counter()
        out1 = f1(cms0_d, mean0_d, jnp.take(ys, jnp.asarray(pad), axis=1))
        jax.block_until_ready(out1)
        row["tier1_t"] = time.perf_counter() - t0
        last1 = np.asarray(out1[0][-1])[: idx.size]
        nell1 = np.asarray(out1[2])[: idx.size]
        fin1 = np.isfinite(last1).all(-1) & np.isfinite(nell1)
        row["tier1_rescued"] = int(fin1.sum())
    # jitter effect on healthy trials: full-batch jittered vs clean
    outj = f1(cms0, mean0, ys)
    jax.block_until_ready(outj)
    nellj = np.asarray(outj[2])
    lastj = np.asarray(outj[0][-1])
    finj = np.isfinite(lastj).all(-1) & np.isfinite(nellj)
    both = fin0 & finj
    row["full_jitter_finite"] = int(finj.sum())
    row["nell_maxdev_on_good"] = float(np.max(np.abs(nellj[both] - nell0[both])))
    res[f"N{N}"] = row
    print(json.dumps(row), flush=True)

with open(os.path.join(os.path.dirname(__file__), "PROBE_RESCUE4.json"), "w") as f:
    json.dump(res, f, indent=2, default=float)
