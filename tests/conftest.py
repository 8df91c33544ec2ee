"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on host CPU devices (the real TPU slice has
a single chip in CI); numerics tests use x64 so closed-form oracles are
tight. The TPU bench path runs float32 — precision-sensitive tests therefore
also include f32-tolerance variants where it matters.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# Full-suite stability: one pytest process accumulates every compiled XLA
# executable (the suite jit-compiles hundreds of distinct solver
# configurations, several of them interpret-mode Pallas kernels with very
# large HLO graphs). By test ~113/135 the process RSS passes ~5 GB and the
# NEXT big CPU compile segfaults inside XLA's compiler
# (jax/_src/compiler.py backend_compile_and_load) — reproducible on this
# image, and every chunk passes in isolation. Dropping the caches at module
# boundaries releases the executables of finished modules (no test reuses
# jitted functions across modules), which keeps peak RSS bounded and the
# one-invocation run green. Cost: a handful of recompiles for
# session-scoped helpers, ~1 min on the full suite.
@pytest.fixture(scope="module", autouse=True)
def _bound_xla_cache_growth():
    yield
    jax.clear_caches()
