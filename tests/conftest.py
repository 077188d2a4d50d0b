"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md section 4: emulated-mesh testing).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent XLA compile cache: the unrolled V-cycle programs are expensive
# to compile; cache them across test runs
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def bus1138():
    import amg_tpu as amg

    return amg.read_mtx(os.path.join(DATA_DIR, "1138_bus.mtx"))


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
