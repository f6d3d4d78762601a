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

jax.config.update("jax_platforms", "cpu")
