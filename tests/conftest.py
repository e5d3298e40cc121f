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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


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
