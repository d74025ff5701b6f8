"""Test configuration: run on CPU with 8 virtual devices.

The numerical tier runs on the CPU backend (the analogue of the reference's
scalar path; TPU runs are the hardware tier, exercised by bench.py and the
driver's dryrun).  Eight virtual host devices let the sharding tests build a
real multi-device mesh without TPU hardware.
"""
import os

# Must be set before the JAX backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64/c128 capability parity with the reference (src/common.rs:5-7).
jax.config.update("jax_enable_x64", True)
