"""Probe: staged multi-pallas_call K-builder vs monolithic / XLA-f64.

Validates ``nd_k_pallas_staged`` on the real TPU (VERDICT r04 item 2's
"push the Mosaic s=36 boundary"):

- s in {15, 28}: staged vs the monolithic ``nd_k_pallas`` (must agree
  to double-f32 roundoff) + timings,
- s = 36, 45 (the monolithic kernel's crash sizes, N = 8, 9): staged
  vs the host XLA-f64 K computation + timings.

Run: ``python tools/probe_staged_k.py``.
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

from mfs_tpu.models import prey_predator
from mfs_tpu.multi_dims import (
    generate_graded_lexico_multi_indices,
    gram_and_hankel_indices_graded_lexico,
)
from mfs_tpu.ops.pallas_quadrature_nd import nd_k_pallas, nd_k_pallas_staged
from mfs_tpu.utils.linalg import ldl_chol

B = 128
res = {}


def k_xla_f64(ms, inds):
    """Reference K on the host CPU in native f64 (stable LDL path)."""
    inds = np.asarray(inds)
    G = ms[..., inds[0]]
    Hs = ms[..., inds[1:]]
    R = ldl_chol(G)
    Rb = jnp.broadcast_to(R[..., None, :, :], Hs.shape)
    Ks = jax.lax.linalg.triangular_solve(
        Rb,
        jax.lax.linalg.triangular_solve(Rb, Hs, left_side=True, lower=True),
        left_side=False, lower=True, transpose_a=True,
    )
    return 0.5 * (Ks + jnp.swapaxes(Ks, -1, -2))


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


cpu = jax.devices("cpu")[0]
for N in (5, 7, 8, 9):
    mis = generate_graded_lexico_multi_indices(2, 2 * N - 1)
    inds = gram_and_hankel_indices_graded_lexico(N, 2)
    s = int(inds.shape[1])
    model = prey_predator(mis)
    # realistic filtering-state moments: propagate the init a few steps
    # is overkill here; use the init-condition mixture moments directly
    ms1 = model.init_cond.cms
    ms = jnp.broadcast_to(ms1, (B,) + ms1.shape)
    row = {"N": N, "s": s, "B": B}

    try:
        t_staged, K_staged = timeit(
            jax.jit(lambda m: nd_k_pallas_staged(m, inds)), ms
        )
        row["staged_t"] = t_staged
    except Exception as e:
        row["staged_t"] = f"error: {str(e)[:160]}"
        K_staged = None

    if s <= 28:
        try:
            t_mono, K_mono = timeit(
                jax.jit(lambda m: nd_k_pallas(m, inds)), ms
            )
            row["mono_t"] = t_mono
            if K_staged is not None:
                row["staged_vs_mono_maxdiff"] = float(
                    jnp.max(jnp.abs(K_staged - K_mono))
                )
        except Exception as e:
            row["mono_t"] = f"error: {str(e)[:160]}"

    with jax.default_device(cpu):
        K_ref = k_xla_f64(jax.device_put(np.asarray(ms[:4]), cpu), inds)
    if K_staged is not None:
        scale = float(jnp.max(jnp.abs(K_ref)))
        row["staged_vs_f64_maxreldiff"] = float(
            jnp.max(jnp.abs(np.asarray(K_staged[:4]) - K_ref)) / scale
        )
    res[f"N{N}"] = row
    print(json.dumps(row), flush=True)

with open(os.path.join(os.path.dirname(__file__), "PROBE_STAGED_K.json"), "w") as f:
    json.dump(res, f, indent=2, default=float)
