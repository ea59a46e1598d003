"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).  x64 is enabled so
f64 reference oracles (audioloudnorm is F64 in the reference) validate
sample-exact on CPU.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize may have imported jax (axon TPU plugin) before this conftest;
# env vars alone are then too late — force the platform via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
