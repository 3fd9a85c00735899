"""Shared experiment utilities.

The reference farms Monte-Carlo trials to Slurm array tasks keyed by a
pre-generated ``rng_keys.npy`` file (reference:
``dardel/generate_rng_key.py:1-12``, ``dardel/benes_bernoulli/mf.py:74``).
Here the reproducibility protocol is ``jax.random.fold_in`` on a single
experiment seed — the whole trial ensemble lives in one process and one
device mesh, so per-trial key files are unnecessary; ``trial_keys``
reproduces any trial subset deterministically.
"""
import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def trial_keys(seed: int, num_trials: int) -> jax.Array:
    """Deterministic per-trial PRNG keys: fold_in(seed_key, trial_id)."""
    base = jax.random.PRNGKey(seed)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(num_trials))


def save_results(experiment: str, name: str, **arrays) -> str:
    out_dir = os.path.join(RESULTS_DIR, experiment)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
    return path


def load_results(experiment: str, name: str):
    return np.load(os.path.join(RESULTS_DIR, experiment, f"{name}.npz"))


def timed_call(fn, *args, warmup: bool = True):
    """The reference's timing protocol: one warm-up call (compile), then
    wall clock around a blocked call (``dardel/time_profile/mf.py:83-106``)."""
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trials", type=int, default=100)
    p.add_argument("--x64", action="store_true", default=True)
    p.add_argument("--platform", type=str, default=None, help="cpu/tpu override")
    return p


def setup(args) -> None:
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)


def emit(record: dict) -> None:
    print(json.dumps(record))
