"""Batched-LP throughput sweep on the live TPU: find the headline config.

The round-2 battery showed throughput is NOT monotonic in B (B=16 ~2.5-3x
baseline, B=32 1.6x, B=64 faults the device), so the bench ladder needs a
measured optimum, not a guess.  Sweeps (B, qres_period) over the chunked
cadence, fresh instances per timed call, incremental saves to
``benchmarks/results/r02_tpu_sweep.json``.

Usage::

    timeout 3000 python tools/tpu_sweep.py        # never kill mid-compile
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

OUT = os.environ.get("ABIP_SWEEP_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results", "r03_tpu_sweep.json")


def main():
    os.environ.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
    import jax

    if "--allow-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ABIP_COMPILE_CACHE"])
    import jax.numpy as jnp

    import abip_tpu  # noqa: F401
    from abip_tpu.parallel.batched import solve_lp_batch
    from abip_tpu.utils.roofline import lp_iteration_cost
    from bench import _load_baseline, reference_smoke_lp

    base = _load_baseline() or 4514.1
    results = {"purpose": "round-2 TPU (B, qres_period) sweep",
               "backend": jax.default_backend(),
               "baseline_iters_per_sec": base}

    def save():
        results["updated"] = time.strftime("%Y-%m-%d %H:%M:%S UTC",
                                           time.gmtime())
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def batch(s0, B):
        d = [reference_smoke_lp(seed=s0 + i) for i in range(B)]
        return (jnp.asarray(np.stack([x[0] for x in d])),
                jnp.asarray(np.stack([x[1] for x in d])),
                jnp.asarray(np.stack([x[2] for x in d])))

    # grid entries: (B, qres_period) or (B, qres_period, probe_period) --
    # probe_period is the round-3 in-chunk stop granularity (default 8)
    grid = [(16, 16), (16, 32), (16, 64),
            (8, 16), (8, 32),
            (24, 16), (24, 32),
            (4, 32), (12, 32)]
    if os.environ.get("ABIP_SWEEP_GRID"):
        grid = [tuple(map(int, p.split("x")))
                for p in os.environ["ABIP_SWEEP_GRID"].split(",")]

    # wall-clock-salted seed base: the remote tunnel caches
    # (program, inputs) ACROSS processes, so re-running the sweep with
    # the fixed 100_000 base replayed earlier runs' results instantly
    # (the recorded 1.26M it/s B16_q64 round).  Fresh seeds per process
    # make every timed call a real execution.
    seed = 100_000 + (int(time.time()) % 1_000_000) * 1_000
    for entry in grid:
        B, qp = entry[0], entry[1]
        probe = entry[2] if len(entry) > 2 else 8
        key = f"B{B}_q{qp}_p{probe}"
        kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000,
                  precision="mixed", solver="inverse",
                  qres_period=qp, avg_period=20, probe_period=probe)
        if os.environ.get("ABIP_SWEEP_ENGINE") == "sprint":
            key += f"_sprint{os.environ.get('ABIP_SWEEP_SPRINT_T', '64')}"
            kw.update(engine="sprint",
                      sprint_T=int(os.environ.get("ABIP_SWEEP_SPRINT_T",
                                                  "64")))
        elif os.environ.get("ABIP_SWEEP_ENGINE") == "sprint2":
            sw = float(os.environ.get("ABIP_SWEEP_SWITCH", "1e-4"))
            key += f"_sprint2_sw{sw:g}"
            kw.update(engine="sprint2", sprint_mu_switch=sw)
        try:
            t0 = time.perf_counter()
            r = solve_lp_batch(*batch(seed, B), **kw)
            _bsync(r)
            first = time.perf_counter() - t0
            seed += B
            rounds, seen_iters = [], []
            for _ in range(3):  # fresh-data rounds (host noise)
                t0 = time.perf_counter()
                r = solve_lp_batch(*batch(seed, B), **kw)
                _bsync(r)
                dt = time.perf_counter() - t0
                seed += B
                per_lane = np.asarray(r.admm_iters)
                # replay-cache guard: DIFFERENT instances cannot yield an
                # identical per-lane iteration vector; the round-2 sweep
                # recorded a physically impossible 59 ms "solve" this way
                # roofline ceiling: a rate above the generous bandwidth
                # model is a replay/timing artifact, not a measurement
                # (pass-4 recorded a 1.75M it/s 51 ms "solve" with fresh
                # salted seeds -- the tunnel can still replay/pipeline)
                ceil = B * lp_iteration_cost(
                    50, 2000, precision="mixed", qres_period=qp,
                    avg_period=20, chip="tpu_v5e").ceiling_iters_per_sec
                replay = (any(np.array_equal(per_lane, s)
                              for s in seen_iters)
                          or int(per_lane.sum()) / dt > ceil)
                # second cut after all rounds: > 2.5x the median rate
                # (see bench._drop_replay_outliers) -- applied below
                seen_iters.append(per_lane.copy())
                its = int(per_lane.sum())
                st = np.asarray(r.status)
                rounds.append({
                    "iters_per_sec": round(its / dt, 1),
                    "wall_sec": round(dt, 3),
                    "solved": int((st == 1).sum()),
                    "mean_iters": round(its / B, 1),
                    "rel_gap_max": float(np.asarray(r.rel_gap).max()),
                    "replay_suspect": bool(replay),
                })
            from bench import _drop_replay_outliers

            rounds_kept = _drop_replay_outliers(
                rounds, lambda r: r["iters_per_sec"])
            for r in rounds:
                if r not in rounds_kept:
                    r["replay_suspect"] = True
            valid = [x for x in rounds_kept if not x["replay_suspect"]
                     and x["solved"] == B]
            if not valid:
                # no honest fully-solved round: NEVER fall back to a
                # suspect/unsolved round as the key's headline -- three
                # near-identical replay rounds pass the median cut
                # trivially (the committed r02 pass-4/5 failure mode)
                results[key] = {"B": B, "qres_period": qp,
                            "probe_period": probe,
                                "error": "no honest round (all rounds "
                                         "replay-suspect or unsolved)",
                                "first_call_sec": round(first, 1),
                                "rounds": rounds}
                print(f"[{key}] NO HONEST ROUND", flush=True)
                save()
                continue
            best = max(valid, key=lambda x: x["iters_per_sec"])
            results[key] = {"B": B, "qres_period": qp,
                            "probe_period": probe, **best,
                            "vs_baseline": round(
                                best["iters_per_sec"] / base, 3),
                            "instances_per_sec": round(
                                B / best["wall_sec"], 2),
                            "first_call_sec": round(first, 1),
                            "rounds": rounds}
            print(f"[{key}] {best['iters_per_sec']} it/s "
                  f"({results[key]['vs_baseline']}x)", flush=True)
        except Exception as e:  # noqa: BLE001 -- keep sweeping
            results[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{key}] FAILED: {e}", flush=True)
        save()

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
