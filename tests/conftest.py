"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the driver validates the real
multi-chip path separately via ``__graft_entry__.dryrun_multichip``) with
float64 enabled so golden-parity tests can match the reference's
numpy/scipy float64 semantics.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-prepends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var; pin the test backend to CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
