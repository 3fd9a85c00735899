"""Sharded Monte-Carlo ensemble execution.

``run_ensemble_filter`` runs a batch-first filter with the trial axis
sharded over a mesh; ``sharded_nell_grad`` is the distributed
parameter-estimation step (mean per-trial nell + gradient, with the
cross-device reduction inserted by XLA from the sharding annotations).
"""
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfs_tpu.parallel.mesh import TRIAL_AXIS, shard_trials, replicate


def run_ensemble_filter(
    filter_fn: Callable,
    init_moments: Any,
    ys: Any,
    mesh: Mesh,
    donate: bool = False,
) -> Any:
    """Run ``filter_fn(init_moments, ys)`` with trials sharded on ``mesh``.

    Parameters
    ----------
    filter_fn : (init (B, ...), ys (T, B, ...)) -> outputs
        A batch-first filter closure (e.g. wrapping
        ``moment_filter_rms`` with the model callables bound).
    init_moments : pytree with leading trial axis B.
    ys : pytree with trial axis at position 1 (time leads).
    mesh : Mesh from ``trial_mesh()``.

    Returns
    -------
    The filter outputs, trial axis sharded.
    """
    init_moments = shard_trials(init_moments, mesh, axis=0)
    ys = shard_trials(ys, mesh, axis=1)
    fn = jax.jit(filter_fn, donate_argnums=(0,) if donate else ())
    return fn(init_moments, ys)


def sharded_nell_grad(
    nell_fn: Callable,
    params: Any,
    ys: Any,
    mesh: Mesh,
) -> Tuple[jax.Array, Any]:
    """Mean nell over sharded trials and its gradient w.r.t. params.

    ``nell_fn(params, ys) -> (B,)`` per-trial negative log likelihoods.
    Params are replicated; trials sharded; the mean over the trial axis
    becomes one all-reduce over ICI.
    """
    params = replicate(params, mesh)
    ys = shard_trials(ys, mesh, axis=1)

    @jax.jit
    def value_and_grad(p, y):
        return jax.value_and_grad(lambda q: jnp.mean(nell_fn(q, y)))(p)

    return value_and_grad(params, ys)
