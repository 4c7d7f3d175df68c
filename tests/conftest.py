"""Test env: 8 virtual CPU devices so sharding tests run without TPU hardware."""

import os

# Force the CPU backend: unit tests must not depend on (or pay the compile
# latency of) the tunneled TPU chip.  Kernel tests run Pallas in interpreter
# mode on CPU; real-TPU execution is exercised by bench.py / benchmarks/.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import pytest  # noqa: E402
import jax  # noqa: E402

# The preinstalled 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the platform through the config API as well (must run before any
# backend is initialized).
jax.config.update("jax_platforms", "cpu")

# fp32 matmuls in parity tests must not be silently truncated to bf16.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def pytest_collection_modifyitems(items):
    """Schedule the compile-heaviest files first: under 4-worker xdist the
    wall time is set by whichever worker drags the tail, and alphabetical
    order puts the 20-30 s sharding/Opa tests last (measured: ~40 s of tail
    saved at the ~5 min suite budget)."""
    heavy = ("test_sharding", "test_compressed_opa", "test_dense_decode",
             "test_scheduler", "test_distributed")
    items.sort(key=lambda it: next(
        (i for i, s in enumerate(heavy) if s in it.nodeid), len(heavy)))
