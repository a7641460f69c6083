import os
import sys

# Tests run on a virtual multi-device CPU mesh: sharding/collective paths are
# validated without TPU hardware; the driver separately dry-runs multichip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize registers a TPU PJRT plugin that overrides the
# JAX_PLATFORMS env var via jax.config — force CPU explicitly for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip XLA compilation
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

REF_RESOURCES = os.environ.get(
    "RUSTPOTTER_REF_RESOURCES", "/root/reference/tests/resources"
)


@pytest.fixture(scope="session")
def resources():
    if not os.path.isdir(REF_RESOURCES):
        pytest.skip("reference wav/rpw resources not available")
    return REF_RESOURCES
