import os
import sys

# Tests run on the CPU backend with a virtual 8-device mesh so sharding
# paths are exercised without TPU hardware (SURVEY.md §4: multi-host
# analog is a simulated mesh).  Must be set before jax import.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container pins JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize,
# which imports jax before any test code runs — so the env var is
# already baked into jax.config and a plain os.environ set is ignored.
# Force the CPU backend through the config API instead (must happen
# before the first jax operation initializes a backend).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/data"
REFERENCE_EXAMPLES = "/root/reference/examples"


def reference_fixture(name: str) -> str:
    path = os.path.join(REFERENCE_DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    return path


@pytest.fixture
def ref_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
