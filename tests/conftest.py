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
