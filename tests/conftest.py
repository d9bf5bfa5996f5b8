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
