"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation.
"""
import os

# Must be set before jax is initialized. Note: this machine's environment
# pre-sets JAX_PLATFORMS=axon (the remote-TPU plugin) via sitecustomize, so
# overriding the env var is not enough — force it through jax.config.
if os.environ.get("GA_REAL_TPU"):
    # escape hatch: run the suite on the real TPU backend (sitecustomize's
    # axon platform) so the TPU-only tests (test_giant_reads,
    # test_long_reads 100kb) stop being skip-only. Single device, no
    # virtual mesh — the mesh tests will skip/shrink accordingly.
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute scale tests (deselect with -m 'not slow')",
    )

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
SMALLEXAMPLE = FIXTURES / "smallexample"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture(scope="session")
def smallexample_dir():
    return SMALLEXAMPLE
