"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; real multi-chip hardware is
not available in CI, so we force the host platform with 8 virtual devices
(SURVEY.md section 4).  Must run before jax initializes.
"""
import os

# NOTE: this image's sitecustomize force-registers the remote `axon` TPU
# backend, so the JAX_PLATFORMS env var alone cannot switch to CPU -- use
# the config API, which wins over the plugin registration.
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache by default: the suite compiles hundreds of
# distinct programs per process, and this jaxlib's LLVM codegen can
# (rarely, flakily) SEGFAULT on a late-process compile -- warm cache hits
# skip codegen entirely, which both speeds re-runs up ~2x and shrinks the
# crash surface to the first cold run.  Opt out with ABIP_TEST_NO_CACHE=1.
if not os.environ.get("ABIP_TEST_NO_CACHE"):
    os.environ.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_test_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_accumulation():
    """Drop in-memory compiled executables between test modules.

    This image's jaxlib flakily SEGFAULTS in executable handling
    (backend_compile / cache serialize / cache deserialize) once a long
    process has accumulated several hundred live compiled programs; the
    same programs compile, serialize, and load fine in a short process.
    Clearing per module keeps the accumulation bounded, and the
    persistent disk cache (above) makes the re-loads cheap.
    """
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_lp(rng, m=20, n=60, density=1.0):
    """A feasible, bounded standard-form LP with known interior point.

    Construction: pick x0 > 0, set b = A x0 (primal feasible); pick y0 and
    s0 > 0, set c = A' y0 + s0 (dual feasible).  Strong duality holds and
    both problems are solvable.
    """
    A = rng.standard_normal((m, n))
    if density < 1.0:
        mask = rng.random((m, n)) < density
        A = A * mask
        # ensure no zero rows/cols
        A[np.arange(m), rng.integers(0, n, m)] += rng.standard_normal(m)
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ y0 + s0
    return A, b, c
