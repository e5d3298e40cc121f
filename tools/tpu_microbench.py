"""Decompose the batched-LP per-iteration cost on the live TPU.

Runs the segmented driver's `lp_segment` program with convergence
disabled (eps=0-like) so every lane executes EXACTLY seg_chunks *
qres_period iterations -- no straggler/convergence noise.  Varying
(seg_chunks, qres_period, B) separates:

  * lean-iteration cost        (slope in total iterations)
  * chunk-boundary cost        (anchor refresh + f64 residual check)
  * per-dispatch overhead      (intercept in segment count)

Writes benchmarks/results/r02_tpu_microbench.json incrementally.

Usage::

    timeout 2400 python tools/tpu_microbench.py [--allow-cpu]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "results", "r02_tpu_microbench.json")


def main():
    os.environ.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
    import jax

    if "--allow-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ABIP_COMPILE_CACHE"])
    import jax.numpy as jnp

    import abip_tpu  # noqa: F401
    from abip_tpu.parallel.segmented import (lp_init_state, lp_setup,
                                             make_segment_fn)
    from bench import reference_smoke_lp

    results = {"purpose": "fixed-iteration cost decomposition "
                          "(tools/tpu_microbench.py)",
               "backend": jax.default_backend()}

    def save():
        results["updated"] = time.strftime("%Y-%m-%d %H:%M:%S UTC",
                                           time.gmtime())
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    setup = jax.jit(lp_setup)

    def make_batch(B, seed0):
        ds = [setup(*map(jnp.asarray, reference_smoke_lp(seed=seed0 + i)))
              for i in range(B)]
        data = jax.tree.map(lambda *xs: jnp.stack(xs), *ds)
        st = lp_init_state(50, 2000)
        state = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                             st)
        return data, state

    # eps tiny + huge budgets: no lane converges, every chunk executes
    configs = [
        # (B, seg_chunks, qres_period)
        (8, 4, 64), (8, 16, 64), (8, 64, 64),      # slope in chunks
        (8, 64, 16), (8, 16, 256),                 # boundary vs lean split
        (16, 16, 64), (4, 16, 64), (1, 16, 64),    # B scaling
    ]
    seed = 500_000
    for B, S, q in configs:
        key = f"B{B}_S{S}_q{q}"
        try:
            seg = make_segment_fn(seg_chunks=S, qres_period=q, eps=1e-300,
                                  max_ipm=10**6, max_admm=10**9)
            data, state = make_batch(B, seed)
            seed += B
            out = seg(data, state)
            jax.block_until_ready(out)
            # fresh state, same data: timed run executes S*q iters/lane
            _, state2 = make_batch(B, seed)
            seed += B
            t0 = time.perf_counter()
            out = seg(data, state2)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            iters = int(np.asarray(out.k).sum())
            assert iters == B * S * q, (iters, B * S * q)
            results[key] = {
                "B": B, "seg_chunks": S, "qres_period": q,
                "wall_sec": round(dt, 4),
                "lane_iters": S * q,
                "total_iters": iters,
                "us_per_batch_iter": round(dt / (S * q) * 1e6, 2),
                "agg_iters_per_sec": round(iters / dt, 1),
            }
            print(f"[{key}] {dt:.3f}s  "
                  f"{results[key]['us_per_batch_iter']}us/iter  "
                  f"{results[key]['agg_iters_per_sec']} it/s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{key}] FAILED: {e}", flush=True)
        save()

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
