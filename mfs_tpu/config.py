"""Global numerical configuration for mfs-tpu.

The moment-filtering pipeline factorises Hankel/Gram matrices whose
condition number grows roughly exponentially with the moment order
``2N - 1``.  The reference library (reference: ``dardel/*/mf.py:16``)
simply flips ``jax_enable_x64`` on and runs on CPU.  On TPU, f64 is
software-emulated: elementwise ops, reductions, and matmuls are true
double precision (verified: errors ~1e-15), while some XLA linalg
decompositions fall back to lower internal precision.  mfs-tpu therefore

1. runs the moment core in f64 by default (``enable_x64()``), and
2. routes the per-step eigendecomposition through in-repo batched
   solvers (``mfs_tpu.ops.eigh.eigh_batched`` / ``eigh_refined``) that
   only use elementwise ops and matmuls, retaining true f64 on TPU.

For speed experiments the whole pipeline also runs in f32 together with
the scaled-central moment mode; see ``mfs_tpu.one_dim.filtering``.
"""
import jax


def enable_x64(enable: bool = True) -> None:
    """Enable (or disable) double precision globally.

    Call this before creating any arrays.  The moment core is validated
    against the reference tolerances in f64.
    """
    jax.config.update("jax_enable_x64", enable)


def default_float():
    """The current default floating dtype (honours jax_enable_x64)."""
    import jax.numpy as jnp

    return jnp.zeros(0).dtype
