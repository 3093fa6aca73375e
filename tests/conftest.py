"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no fake-backend distributed testing (SURVEY.md §4); here
every test runs against 8 virtual CPU devices so data-parallel sharding is
exercised without TPU hardware.
"""

import os
import sys

# Must be set before jax initializes a backend. FORCE cpu — this
# environment pins JAX_PLATFORMS to the TPU plugin globally (and ignores
# the env var), and running the test suite through the single-chip tunnel
# is both slow and contended.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
