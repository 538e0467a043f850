"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (multi-chip is validated via dryrun, see
__graft_entry__.py).

Note: the environment's sitecustomize registers a TPU ("axon") backend in
every interpreter and sets jax_platforms itself, so plain env vars are
not enough — we must override the config after importing jax and before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles hundreds of XLA programs in one process;
    near the end of the run the CPU backend segfaulted inside
    backend_compile_and_load on a trivial program (seen round 4 at
    ~138 tests, reproducibly) — consistent with executable-mapping
    exhaustion, not any individual test.  Dropping dead caches between
    modules keeps the live-executable count bounded; modules rarely
    share jitted shapes, so re-compilation cost is negligible."""
    yield
    jax.clear_caches()
