"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

Real-TPU benchmarking happens via bench.py; unit tests always run on a
virtual 8-device CPU mesh so sharding code paths are exercised everywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests")


def reference_data_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
