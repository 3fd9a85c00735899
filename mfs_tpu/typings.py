"""Semantic type aliases used across mfs-tpu.

Mirrors the naming conventions of the reference library (reference:
``mfs/typings.py:9-19`` and ``mfs/definitions.py:5-25``):

- ``rms``  — raw moments ``E[X^n]``.
- ``cms``  — central moments ``E[(X - mean)^n]``.
- ``scms`` — scaled central moments ``E[((X - mean)/scale)^n]``.
- A trailing double-s (e.g. ``rmss``) denotes a time-stacked array of
  moment vectors, shape ``(T, ...)``.

Everything here is a plain alias: shapes are documented at the function
level, and a leading batch axis is always allowed (batch-first design).
"""
from typing import Union

import jax

Array = jax.Array
ArrayLike = Union[jax.Array, float, int]
FloatScalar = Union[float, jax.Array]
IntScalar = Union[int, jax.Array]
