"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are
exercised without TPU hardware. Must be set before jax is imported
anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon default; tests use the virtual mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize may have imported jax already (env vars above would then be
# ineffective); the config API works as long as no backend is live yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

REFERENCE_BIN = pathlib.Path("/root/reference/bin")


@pytest.fixture(scope="session")
def golden_stream() -> bytes:
    return (REFERENCE_BIN / "test.264").read_bytes()


@pytest.fixture(scope="session")
def golden_recon() -> bytes:
    return (REFERENCE_BIN / "test_rec.yuv").read_bytes()


@pytest.fixture(scope="session")
def foreman_qcif() -> bytes:
    return (REFERENCE_BIN / "foreman_part_qcif.yuv").read_bytes()
