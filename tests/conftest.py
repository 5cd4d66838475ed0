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

import pytest  # noqa: E402

_TESTS_RUN = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    """Clear jax's compiled-executable caches every 50 tests.

    The full suite performs ~400 XLA:CPU compilations in one process;
    past ~360 the compiler segfaults inside `backend_compile_and_load`
    (reproduced twice at tests #362/#365, 2026-08-20 — the same tail
    files pass in a fresh process, so the crash is cumulative process
    state, not any single test). Periodic cache clearing keeps the
    live-executable population bounded; the cost is re-jitting shared
    helpers a handful of times per run.
    """
    yield
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 50 == 0:
        jax.clear_caches()
