"""Probe: rescue-tier design measurements for the bench headline.

Questions (VERDICT r03 item 1):
1. Of the trials the fused cms-mode kernel loses at N=15/B=4096, how
   many does a *scms-mode* fused pass rescue (tier-1, on-TPU, cheap)?
2. What does the CPU LAPACK-f64 tier cost for the remainder (tier-2)?
3. Does a larger Pallas lane block (block_b) change kernel throughput?

Run on the real TPU: ``python tools/probe_rescue.py``.
"""
import sys, os, time, json

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

model = benes_bernoulli(N=N)
trans = sde_cond_moments_tme_normal(model.drift, model.dispersion, model.dt, 2, N)
key = jax.random.PRNGKey(0)
xss = model.simulate(key, 8)
probs = model.emission(jnp.tile(xss, (BATCH // 8 + 1, 1))[:BATCH])
ys = jax.random.bernoulli(jax.random.PRNGKey(1), probs).astype(jnp.float64).T
ic = model.init_cond
cms0 = jnp.broadcast_to(ic.cms, (BATCH, 2 * N))
mean0 = ic.mean * jnp.ones(BATCH)

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

# --- 1. cms pallas pass ---
filt_cms = jax.jit(
    lambda c0, m0, y: moment_filter_cms(
        trans.cms, trans.mean, model.measurement_cond_pdf, c0, m0, y,
        eigh_impl="pallas",
    )
)
t_cms, out = timeit(filt_cms, cms0, mean0, ys)
finite = np.asarray(jnp.isfinite(out[0][-1]).all(axis=-1))
res["cms_pallas"] = dict(t=t_cms, trials_per_s=BATCH / t_cms,
                         diverged=int((~finite).sum()))
print(json.dumps(res["cms_pallas"]))

# --- 2. scms pallas on the diverged subset (padded to 512) ---
idx = np.where(~finite)[0]
k = len(idx)
BUCKET = 512
nbuck = max(1, -(-k // BUCKET))
pad = np.concatenate([idx, np.zeros(nbuck * BUCKET - k, dtype=idx.dtype)])
ys_sub = jnp.take(ys, jnp.asarray(pad), axis=1)
scms0 = jnp.broadcast_to(ic.scms, (nbuck * BUCKET, 2 * N))
mean0s = ic.mean * jnp.ones(nbuck * BUCKET)
scale0s = jnp.sqrt(ic.variance) * jnp.ones(nbuck * BUCKET)
filt_scms = jax.jit(
    lambda s0, m0, sc0, y: moment_filter_scms(
        trans.scms, trans.mean_var, model.measurement_cond_pdf,
        s0, m0, sc0, y, eigh_impl="pallas",
    )
)
t_scms, outs = timeit(filt_scms, scms0, mean0s, scale0s, ys_sub)
fin_s = np.asarray(
    jnp.isfinite(outs[0][-1]).all(axis=-1)
    & jnp.isfinite(outs[1][-1]) & jnp.isfinite(outs[2][-1])
)[:k]
res["scms_tier1"] = dict(t=t_scms, k=k, rescued=int(fin_s.sum()),
                         still_bad=int((~fin_s).sum()))
print(json.dumps(res["scms_tier1"]))

# --- 3. CPU LAPACK f64 on the remainder ---
idx2 = idx[~fin_s]
k2 = len(idx2)
if k2:
    cpu = jax.devices("cpu")[0]
    CB = 256
    nb2 = max(1, -(-k2 // CB))
    pad2 = np.concatenate([idx2, np.zeros(nb2 * CB - k2, dtype=idx2.dtype)])
    with jax.default_device(cpu):
        ys_c = jax.device_put(np.asarray(jnp.take(ys, jnp.asarray(pad2), axis=1)), cpu)
        c0 = jax.device_put(np.asarray(cms0[: nb2 * CB]), cpu)
        m0 = jax.device_put(np.asarray(mean0[: nb2 * CB]), cpu)
        filt_cpu = jax.jit(
            lambda c0, m0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf, c0, m0, y,
                stable=True, eigh_impl="xla",
            )
        )
        t_cpu, outc = timeit(filt_cpu, c0, m0, ys_c, reps=1)
        fin_c = np.asarray(jnp.isfinite(outc[0][-1]).all(axis=-1))[:k2]
    res["cpu_tier2"] = dict(t=t_cpu, k=k2, rescued=int(fin_c.sum()),
                            still_bad=int((~fin_c).sum()))
    print(json.dumps(res["cpu_tier2"]))

# --- 4. block_b sweep on the cms pallas leg ---
import mfs_tpu.one_dim.quadrature as q
from mfs_tpu.ops.pallas_quadrature import moment_quadrature_fused
for bb in (1024, 2048):
    try:
        import mfs_tpu.ops.pallas_quadrature as pq
        import functools
        orig = pq.moment_quadrature_pallas
        pq_wrapped = functools.partial(orig, block_b=bb)
        pq.moment_quadrature_pallas = pq_wrapped
        moment_quadrature_fused._clear_cache() if hasattr(moment_quadrature_fused, "_clear_cache") else None
        filt2 = jax.jit(
            lambda c0, m0, y: moment_filter_cms(
                trans.cms, trans.mean, model.measurement_cond_pdf, c0, m0, y,
                eigh_impl="pallas",
            )
        )
        t_bb, _ = timeit(filt2, cms0, mean0, ys)
        res[f"block_{bb}"] = dict(t=t_bb, trials_per_s=BATCH / t_bb)
        print(json.dumps({f"block_{bb}": res[f"block_{bb}"]}))
    except Exception as e:
        print(f"block_{bb} failed: {str(e)[:200]}")
    finally:
        pq.moment_quadrature_pallas = orig

print(json.dumps(res, indent=2))
