"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The real TPU (axon tunnel) is reserved for bench.py; tests force the CPU
backend and create 8 virtual devices so multi-chip sharding paths
(parallel/, dbfv/dckks protocol meshes) are exercised without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tests (reference-default parameter sets, large-N "
        "interpret-mode Pallas); run with RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if os.environ.get("RUN_SLOW"):
        return
    skip = _pytest.mark.skip(reason="slow test: set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
