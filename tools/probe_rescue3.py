"""Probe: jitter-level selection for the kernel rescue tier (round 5).

``probe_rescue2.py`` measured that the cms fused kernel with Gram
jitter 1e-6 rescues 265/265 of the trials the clean kernel loses at
N=15/B=4096 (the host LAPACK-f64 tier manages 249/265), in 0.15 s per
512-block.  This probe picks the *smallest* jitter with full rescue
and quantifies the accuracy cost:

- rescue count + nell / final-moment deviation vs the host-f64 truth
  for jitter in {1e-8, 1e-7, 3e-7, 1e-6},
- jittered-vs-clean deviation on the GOOD trials (full batch), to
  bound what the regularisation does where it isn't needed.

Run on the real TPU: ``python tools/probe_rescue3.py``.
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


def make_filt(**kw):
    return jax.jit(
        lambda c0, m0, y: moment_filter_cms(
            trans.cms, trans.mean, model.measurement_cond_pdf,
            c0, m0, y, **kw,
        )
    )


filt_pal = make_filt(eigh_impl="pallas")
t0s, out0 = timeit(filt_pal, cms0, mean0, ys)
clean_last = np.asarray(out0[0][-1])
clean_nell = np.asarray(out0[2])
fin0 = np.isfinite(clean_last).all(-1) & np.isfinite(clean_nell)
idx = np.where(~fin0)[0]
res["tier0"] = {"t": t0s, "diverged": int(idx.size)}
print("tier0:", res["tier0"], flush=True)

nb = -(-idx.size // BUCKET)
pad = np.concatenate([idx, np.zeros(nb * BUCKET - idx.size, dtype=idx.dtype)])
ys_div = jnp.take(ys, jnp.asarray(pad), axis=1)
cms0_d = jnp.broadcast_to(ic.cms, (pad.size, 2 * N))
mean0_d = ic.mean * jnp.ones(pad.size)

# host-f64 truth on the diverged set
cpu = jax.devices("cpu")[0]
filt_cpu = jax.jit(
    lambda c0, m0, y: moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf,
        c0, m0, y, stable=True, eigh_impl="xla",
    )
)
with jax.default_device(cpu):
    outs_h = []
    CH = 64
    for s in range(0, pad.size, CH):
        o = filt_cpu(
            jax.device_put(np.asarray(cms0_d[s:s+CH]), cpu),
            jax.device_put(np.asarray(mean0_d[s:s+CH]), cpu),
            jax.device_put(ys_host[:, pad[s:s+CH]], cpu),
        )
        outs_h.append((np.asarray(o[0][-1]), np.asarray(o[1][-1]), np.asarray(o[2])))
host_last = np.concatenate([o[0] for o in outs_h])[: idx.size]
host_mean = np.concatenate([o[1] for o in outs_h])[: idx.size]
host_nell = np.concatenate([o[2] for o in outs_h])[: idx.size]
host_fin = np.isfinite(host_last).all(-1) & np.isfinite(host_nell)
res["host_f64"] = {"rescued": int(host_fin.sum()), "of": int(idx.size)}
print("host:", res["host_f64"], flush=True)


def mom_rel_dev(a, b):
    # relative per-order deviation of central-moment vectors, scaled by
    # the moment magnitude (order-2 moment ^ (j/2) is the natural unit)
    unit = np.maximum(np.abs(b), np.abs(b[..., 2:3]) ** (np.arange(2 * N) / 2))
    return np.max(np.abs(a - b) / np.maximum(unit, 1e-30), axis=-1)


for jit_level in [1e-8, 1e-7, 3e-7, 1e-6]:
    name = f"jit{jit_level:.0e}"
    f = make_filt(eigh_impl="pallas", quad_jitter=jit_level)
    t, out = timeit(f, cms0_d, mean0_d, ys_div)
    last = np.asarray(out[0][-1])[: idx.size]
    mean_l = np.asarray(out[1][-1])[: idx.size]
    nell = np.asarray(out[2])[: idx.size]
    fin = np.isfinite(last).all(-1) & np.isfinite(nell)
    both = fin & host_fin
    res[name] = {
        "t": t,
        "rescued": int(fin.sum()), "of": int(idx.size),
        "nell_maxdev_vs_host": float(np.max(np.abs(nell[both] - host_nell[both]))) if both.any() else None,
        "mean_maxdev_vs_host": float(np.max(np.abs(mean_l[both] - host_mean[both]))) if both.any() else None,
        "mom_reldev_vs_host_max": float(np.max(mom_rel_dev(last[both], host_last[both]))) if both.any() else None,
    }
    print(name, res[name], flush=True)

# jitter effect on the GOOD trials: full-batch jittered run vs clean
best = 1e-7
f = make_filt(eigh_impl="pallas", quad_jitter=best)
t, out = timeit(f, cms0, mean0, ys, reps=2)
last = np.asarray(out[0][-1])
nell = np.asarray(out[2])
good = fin0
res["full_jitter_vs_clean"] = {
    "jitter": best,
    "t_full": t,
    "finite_frac": float((np.isfinite(last).all(-1) & np.isfinite(nell)).mean()),
    "nell_maxdev_on_good": float(np.max(np.abs(nell[good] - clean_nell[good]))),
    "mom_reldev_on_good_max": float(np.max(mom_rel_dev(last[good], clean_last[good]))),
}
print("full_jitter_vs_clean:", res["full_jitter_vs_clean"], flush=True)

with open(os.path.join(os.path.dirname(__file__), "PROBE_RESCUE3.json"), "w") as f:
    json.dump(res, f, indent=2, default=float)
print(json.dumps(res, indent=2, default=float))
