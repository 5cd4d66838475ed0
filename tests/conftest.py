"""Test configuration: force a virtual 8-device CPU platform.

The test suite must run on CPU with 8 virtual devices (SURVEY §4:
multi-device tests via `xla_force_host_platform_device_count`) regardless
of what accelerator the ambient environment pins via `JAX_PLATFORMS` —
a site hook may import jax before this file runs, so overriding the env
var is not enough: use `jax.config.update`, which works any time before
backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
