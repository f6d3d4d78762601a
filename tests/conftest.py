"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware (the driver
separately dry-runs the multichip path via __graft_entry__.dryrun_multichip).

Note: this image's sitecustomize registers the remote `axon` TPU backend and
force-sets ``jax_platforms='axon,cpu'`` *inside* register(), overriding the
JAX_PLATFORMS env var — so we must override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
import pytest

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-executable caches after each test module.

    A full-suite run accumulates ~200 XLA CPU compilations (many of them
    large Pallas interpret programs); past ~190 the in-process compiler
    segfaults (observed 3x at the same point, passes in isolation, not
    OOM — 125 GB free). Dropping the caches between modules keeps the
    compiler's working set bounded."""
    yield
    jax.clear_caches()
