"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on XLA's host-platform virtual devices instead (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS pointing at the TPU tunnel, so plain env-var overrides are too
late — use jax.config.update before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
