"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: ADMM iterations/second on the reference smoke-test LP shape
(`/root/reference/test/test_abip_install.m:7-21`: m=50, n=2000,
A=[sprand(0.3), I]) solved to eps=1e-6 on one chip.  The BASELINE.md target
is >=5x ADMM iterations/s per chip vs the single-socket MKL reference.

`vs_baseline` is measured against the reference C solver when a recorded
baseline exists in BASELINE_MEASURED.json (see tools/measure_baseline.py),
else reported as a ratio vs the provisional constant below.
"""
import json
import os
import sys
import time

import numpy as np


def reference_smoke_lp(m=50, n_rand=1950, density=0.3, seed=0):
    """Random degenerate-free LP, the shape of `test_abip_install.m:7-21`:
    A = [sprand(m, n_rand, density), I_m], b = A x0, c = A' y0 + s0."""
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((m, n_rand)) * (rng.random((m, n_rand)) < density)
    A = np.concatenate([Ar, np.eye(m)], axis=1)
    n = n_rand + m
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ y0 + s0
    return A, b, c


def main():
    t_setup = time.time()
    import jax

    if os.environ.get("ABIP_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import abip_tpu
    from abip_tpu.parallel.batched import device_solve_lp

    A, b, c = reference_smoke_lp()
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    c = jnp.asarray(c)

    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000)

    # warm-up / compile
    res = device_solve_lp(A, b, c, **kw)
    jax.block_until_ready(res)
    status = int(res.status)
    iters = int(res.admm_iters)

    # timed runs
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = device_solve_lp(A, b, c, **kw)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_rep

    iters_per_sec = iters / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("admm_iters_per_sec_reference")
    else:
        base = None

    out = {
        "metric": "admm_iters_per_sec",
        "value": round(iters_per_sec, 1),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / base, 3) if base else None,
        "detail": {
            "problem": "smoke_lp m=50 n=2000 density=0.3",
            "eps": 1e-6,
            "status": status,
            "admm_iters": iters,
            "solve_sec": round(dt, 4),
            "rel_gap": float(res.rel_gap),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
