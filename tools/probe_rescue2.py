"""Probe: round-5 rescue-tier + polished-path measurements (VERDICT r4 #1/#8).

Questions:
1. Of the trials the fused cms-mode kernel loses at N=15/B=4096, how
   many does each candidate tier rescue, and at what per-block cost?
     - scms fused kernel (the round-4 tier 1)
     - polished (kernel + f64 Newton correction), jitter 0 / 1e-6 / 1e-5
     - scms polished + jitter
     - plain kernel + jitter (no polish)
2. What does the *full-batch* polished path cost (trials/s, finite
   frac)?  This is the candidate replacement for the 67 trials/s
   XLA-f64 "refined" leg.
3. Do polished-rescued trials agree with the host LAPACK-f64 rescue
   (nell) on the trials both rescue?

Run on the real TPU: ``python tools/probe_rescue2.py``.
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
from mfs_tpu.one_dim.filtering import moment_filter_cms, moment_filter_scms
from mfs_tpu.sde import sde_cond_moments_tme_normal

N = 15
BATCH = 4096
BUCKET = 512

model = benes_bernoulli(N=N)
trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 2, N)
key = jax.random.PRNGKey(0)
xss = model.simulate(key, 8)
probs = model.emission(jnp.tile(xss, (BATCH // 8 + 1, 1))[:BATCH])
ys = jax.random.bernoulli(jax.random.PRNGKey(1), probs).astype(jnp.float64).T
ic = model.init_cond
cms0 = jnp.broadcast_to(ic.cms, (BATCH, 2 * N))
mean0 = ic.mean * jnp.ones(BATCH)
ys_host = np.asarray(ys)

res = {}


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def finite_mask(cms_last, nell):
    return np.asarray(jnp.isfinite(cms_last).all(axis=-1) & jnp.isfinite(nell))


# ---- tier 0: cms fused kernel, full batch ---------------------------
filt_pal = jax.jit(
    lambda c0, m0, y: moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        c0, m0, y, eigh_impl="pallas",
    )
)
t0s, out0 = timeit(filt_pal, cms0, mean0, ys)
fin0 = finite_mask(out0[0][-1], out0[2])
idx = np.where(~fin0)[0]
res["tier0"] = {"t": t0s, "diverged": int(idx.size), "trials_per_s": BATCH / t0s}
print("tier0:", res["tier0"], flush=True)

# diverged subset, padded to one bucket
nb = -(-idx.size // BUCKET)
pad = np.concatenate([idx, np.zeros(nb * BUCKET - idx.size, dtype=idx.dtype)])
ys_div = jnp.take(ys, jnp.asarray(pad), axis=1)
cms0_d = jnp.broadcast_to(ic.cms, (pad.size, 2 * N))
mean0_d = ic.mean * jnp.ones(pad.size)
scms0_d = jnp.broadcast_to(ic.scms, (pad.size, 2 * N))
scale0_d = jnp.sqrt(ic.variance) * jnp.ones(pad.size)

# host-f64 truth on the diverged set (reference for accuracy + rescue)
cpu = jax.devices("cpu")[0]
filt_cpu = jax.jit(
    lambda c0, m0, y: moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        c0, m0, y, stable=True, eigh_impl="xla",
    )
)
t_host0 = time.perf_counter()
with jax.default_device(cpu):
    outs_h = []
    CH = 64
    for s in range(0, pad.size, CH):
        o = filt_cpu(
            jax.device_put(np.asarray(cms0_d[s:s+CH]), cpu),
            jax.device_put(np.asarray(mean0_d[s:s+CH]), cpu),
            jax.device_put(ys_host[:, pad[s:s+CH]], cpu),
        )
        outs_h.append((np.asarray(o[0][-1]), np.asarray(o[2])))
host_last = np.concatenate([o[0] for o in outs_h])[: idx.size]
host_nell = np.concatenate([o[1] for o in outs_h])[: idx.size]
host_fin = np.isfinite(host_last).all(-1) & np.isfinite(host_nell)
res["host_f64"] = {
    "t_total": time.perf_counter() - t_host0,
    "rescued": int(host_fin.sum()),
    "of": int(idx.size),
}
print("host:", res["host_f64"], flush=True)


def probe_cms(name, **kw):
    f = jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, **kw,
        )
    )
    try:
        t, out = timeit(f, cms0_d, mean0_d, ys_div)
        last = np.asarray(out[0][-1])[: idx.size]
        nell = np.asarray(out[2])[: idx.size]
        fin = np.isfinite(last).all(-1) & np.isfinite(nell)
        both = fin & host_fin
        nell_dev = (
            float(np.max(np.abs(nell[both] - host_nell[both])))
            if both.any() else None
        )
        res[name] = {
            "t": t, "rescued": int(fin.sum()), "of": int(idx.size),
            "nell_maxdev_vs_host": nell_dev,
            "rescued_not_by_host": int((fin & ~host_fin).sum()),
        }
    except Exception as e:
        res[name] = {"error": str(e)[:200]}
    print(name, res[name], flush=True)
    return res[name]


def probe_scms(name, **kw):
    f = jax.jit(
        lambda s0, m0, sc0, y: moment_filter_scms(
            trans.scms, trans.mean_var, model.measurement_cond_pdf,
            s0, m0, sc0, y, **kw,
        )
    )
    try:
        t, out = timeit(f, scms0_d, mean0_d, scale0_d, ys_div)
        last = np.asarray(out[0][-1])[: idx.size]
        scl = np.asarray(out[2][-1])[: idx.size]
        nell = np.asarray(out[3])[: idx.size]
        fin = np.isfinite(last).all(-1) & np.isfinite(nell) & np.isfinite(scl)
        both = fin & host_fin
        nell_dev = (
            float(np.max(np.abs(nell[both] - host_nell[both])))
            if both.any() else None
        )
        res[name] = {
            "t": t, "rescued": int(fin.sum()), "of": int(idx.size),
            "nell_maxdev_vs_host": nell_dev,
            "rescued_not_by_host": int((fin & ~host_fin).sum()),
        }
    except Exception as e:
        res[name] = {"error": str(e)[:200]}
    print(name, res[name], flush=True)
    return res[name]


probe_scms("tier_scms_pallas", eigh_impl="pallas")
probe_cms("tier_cms_pallas_j1e-6", eigh_impl="pallas", quad_jitter=1e-6)

# NOTE: the original round-5 run of this probe also measured a
# "polished" impl (kernel + f64 Newton correction on the moment
# system).  It rescued 0/265 and corrupted good trials (full-batch
# finite_frac 0.06) because the confluent Vandermonde of the moment
# identity has condition ~1e28 at n = 15; the implementation was
# removed.  The recorded numbers live in PROBE_RESCUE2.json.

with open(os.path.join(os.path.dirname(__file__), "PROBE_RESCUE2.json"), "w") as f:
    json.dump(res, f, indent=2, default=float)
print(json.dumps(res, indent=2, default=float))
