"""Test configuration: force a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; unit tests always run on CPU so
sharding code paths are exercised everywhere. NOTE: this environment
pre-imports jax from sitecustomize with JAX_PLATFORMS=axon, so we must use
jax.config.update (env vars are read before conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests")


def reference_data_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
