"""Test configuration: CPU backend with 8 virtual devices, f64.

The numerical tests validate the moment core against closed-form
oracles in double precision (the reference's test discipline:
``tests/*.py`` all set jax_enable_x64).  Sharding tests use the 8
virtual CPU devices as a stand-in for an ICI mesh.

Set ``MFS_TPU_TESTS_TPU=1`` to keep the real accelerator visible —
used to run ``tests/test_tpu_hardware.py`` (marker ``tpu``) on a TPU
host; everything else in the suite still passes there.
"""
import os

_ON_TPU = os.environ.get("MFS_TPU_TESTS_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
