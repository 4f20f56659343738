"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/multi-chip paths are
exercised without TPU hardware; Pallas kernels run in interpreter mode on
CPU (the TPU compiled path is exercised by bench.py / on-TPU runs).
Set VARTRIX_TEST_TPU=1 to run the suite against the real TPU instead.
"""

import os

if not os.environ.get("VARTRIX_TEST_TPU"):
    # The env var JAX_PLATFORMS is force-set by some TPU environments
    # (e.g. the axon relay), so use the config API as well.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_TEST_DIR = "/root/reference/test"


@pytest.fixture(scope="session")
def ref_test_dir():
    return REF_TEST_DIR
