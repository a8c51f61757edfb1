"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-equivalent of a multi-node
test rig without real chips): flags must be set before JAX initializes.
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel plugin) and the
# plugin wins over a later env-var override, so force CPU through the config
# API. XLA_FLAGS must still be set before the CPU client is created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices


REFERENCE_ROOT = "/root/reference"
GOLDEN_COMBINED = os.path.join(REFERENCE_ROOT, "3_combined_bboxes", "json")
DETECTION_CACHE = os.path.join(
    REFERENCE_ROOT, "deprecated_package", "output", "region_cache"
)


@pytest.fixture(scope="session")
def golden_combined_dir():
    if not os.path.isdir(GOLDEN_COMBINED):
        pytest.skip("reference goldens not available")
    return GOLDEN_COMBINED


@pytest.fixture(scope="session")
def detection_cache_dir():
    if not os.path.isdir(DETECTION_CACHE):
        pytest.skip("reference detection cache not available")
    return DETECTION_CACHE
