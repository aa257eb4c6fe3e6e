"""Test configuration.

Tests run on CPU with 8 virtual devices so mesh/sharding behavior is
exercised without TPU hardware (the driver's ``dryrun_multichip`` does the
same). x64 is enabled so reference-accuracy checks (integrator order, KKT
residuals) are not limited by f32; production-path f32 behavior is covered by
dedicated tolerance tests that pass explicit float32 inputs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env selects the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The interpreter's sitecustomize registers the TPU plugin before conftest
# runs, so the env var alone is not enough — force the platform via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
