"""Single-instance LP rate on the live TPU: cadence + sprint engine probe.

The round-2 battery's single-instance row (anchored mixed, default
cadence) measured 4,082 it/s = 0.90x the reference C solver -- the one
TPU row below baseline.  Two levers untested there:

- qres_period: the batched sweep showed the f64-emulated residual check
  dominates; single solves should benefit the same way.
- engine="sprint": T fused f32 iterations per Pallas launch
  (`ops/admm_pallas.fused_admm_sprint`), cutting the ~50-op XLA dispatch
  chain per iteration to one kernel.

Usage::

    timeout 1500 python tools/tpu_single.py     # never kill mid-compile

Writes benchmarks/results/r02_tpu_single.json incrementally.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _bsync(tree):
    """Value-read sync: jax.block_until_ready is a NO-OP on the
    axon remote backend (abip_tpu.utils.timing.sync)."""
    from abip_tpu.utils.timing import sync as _s

    return _s(tree)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("ABIP_SINGLE_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results", "r02_tpu_single.json")


def main():
    os.environ.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
    import jax

    if "--allow-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ABIP_COMPILE_CACHE"])
    import jax.numpy as jnp

    import abip_tpu  # noqa: F401
    from abip_tpu.parallel.batched import device_solve_lp
    from bench import _drop_replay_outliers, _load_baseline, \
        reference_smoke_lp

    base = _load_baseline() or 4514.1
    results = {"purpose": "round-2 TPU single-instance cadence/engine probe",
               "backend": jax.default_backend(),
               "baseline_iters_per_sec": base}

    def save():
        results["updated"] = time.strftime("%Y-%m-%d %H:%M:%S UTC",
                                           time.gmtime())
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    seed = 500_000 + (int(time.time()) % 1_000_000) * 1_000
    configs = [
        ("steps_q64", dict(qres_period=64)),
        ("steps_q256", dict(qres_period=256)),
        ("steps_q768", dict(qres_period=768)),
        ("sprint_T32_q256", dict(qres_period=256, engine="sprint",
                                 sprint_T=32)),
        ("sprint_T64_q256", dict(qres_period=256, engine="sprint",
                                 sprint_T=64)),
        ("sprint_T128_q256", dict(qres_period=256, engine="sprint",
                                  sprint_T=128)),
        ("sprint_T256_q256", dict(qres_period=256, engine="sprint",
                                  sprint_T=256)),
    ]
    if os.environ.get("ABIP_SINGLE_GRID"):
        names = os.environ["ABIP_SINGLE_GRID"].split(",")
        configs = [c for c in configs if c[0] in names]

    for name, extra in configs:
        kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000,
                  precision="mixed", solver="inverse", avg_period=20,
                  **extra)
        try:
            A, b, c = reference_smoke_lp(seed=seed)
            r = device_solve_lp(jnp.asarray(A), jnp.asarray(b),
                                jnp.asarray(c), **kw)
            _bsync(r)
            seed += 1
            rounds = []
            for _ in range(3):
                A, b, c = reference_smoke_lp(seed=seed)
                seed += 1
                t0 = time.perf_counter()
                r = device_solve_lp(jnp.asarray(A), jnp.asarray(b),
                                    jnp.asarray(c), **kw)
                _bsync(r)
                dt = time.perf_counter() - t0
                its = int(r.admm_iters)
                rounds.append({
                    "iters_per_sec": round(its / dt, 1),
                    "wall_sec": round(dt, 3),
                    "admm_iters": its,
                    "status": int(r.status),
                    "rel_gap": float(np.asarray(r.rel_gap)),
                })
            kept = _drop_replay_outliers(rounds,
                                         lambda x: x["iters_per_sec"])
            valid = [x for x in kept if x["status"] == 1]
            if not valid:
                # no kept round solved: a diverged run must never be
                # published as a speedup number -- record it under an
                # explicit error marker with vs_baseline null
                results[name] = {"error": "no solved round survived the "
                                          "replay cut",
                                 "vs_baseline": None, "rounds": rounds}
                print(f"[{name}] NO SOLVED ROUND", flush=True)
                save()
                continue
            best = max(valid, key=lambda x: x["iters_per_sec"])
            results[name] = {**best,
                             "vs_baseline": round(
                                 best["iters_per_sec"] / base, 3),
                             "rounds": rounds}
            print(f"[{name}] {best['iters_per_sec']} it/s "
                  f"({results[name]['vs_baseline']}x)", flush=True)
        except Exception as e:  # noqa: BLE001 -- keep probing
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{name}] FAILED: {e}", flush=True)
        save()

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
